"""multiPopMcmc-equivalent tests: two-population helium-spread model
(SURVEY.md E2/§3.5; BASELINE config 4, NGC 2808-style)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from base_tpu import constants as C
from base_tpu.inference import mh
from base_tpu.model import multipop as mp
from base_tpu.model.stardata import make_ms_stars
from base_tpu.sim.scatter import scatter_cluster
from base_tpu.sim.simulate import simulate_cluster

# age, Y(unused), FeH, mod, Av, carb, ifmr..., Y_A, Y_B, lambda
TRUTH = np.array(
    [9.2, 0.27, -0.7, 11.0, 0.2, 0.5, 0, 0, 0, 0.25, 0.31, 0.6],
    np.float32,
)


@pytest.fixture(scope="module")
def two_pop_data(small_grid):
    """Simulate lambda*N stars at Y_A and the rest at Y_B."""
    n = 80
    n_a = int(round(TRUTH[mp.MP_LAMBDA] * n))
    pa = TRUTH[:9].copy()
    pa[C.Param.YYY] = TRUTH[mp.MP_YYA]
    pb = TRUTH[:9].copy()
    pb[C.Param.YYY] = TRUTH[mp.MP_YYB]
    cat_a = simulate_cluster(
        small_grid, jnp.asarray(pa), n_a, jax.random.PRNGKey(51),
        percent_binary=0.0,
    )
    cat_b = simulate_cluster(
        small_grid, jnp.asarray(pb), n - n_a, jax.random.PRNGKey(52),
        percent_binary=0.0,
    )
    mags = np.concatenate([np.asarray(cat_a.mags), np.asarray(cat_b.mags)])
    sc = scatter_cluster(jnp.asarray(mags), jax.random.PRNGKey(53),
                         limit_mag=26.0)
    stars = make_ms_stars(np.asarray(sc.mags), np.asarray(sc.sigmas),
                          cm_prior=0.999)
    prior_mean = TRUTH.copy()
    prior_sigma = np.array(
        [-1, -1, 0.3, 0.2, 0.1, -1, -1, -1, -1, -1, -1, -1], np.float32
    )
    return mp.make_multipop_model(
        small_grid, stars, prior_mean, prior_sigma, n_q=6, binaries=False
    )


def test_multipop_logpost_prefers_truth(two_pop_data):
    model = two_pop_data
    f = jax.jit(mp.make_logpost_fn(model))
    at_truth = float(f(jnp.asarray(TRUTH)))
    assert np.isfinite(at_truth)

    # A single-population explanation (Y_A == Y_B) must be worse.
    single = TRUTH.copy()
    single[mp.MP_YYA] = single[mp.MP_YYB] = 0.28
    assert float(f(jnp.asarray(single))) < at_truth - 2.0

    # Wrong mixture weight is worse.
    bad_lam = TRUTH.copy()
    bad_lam[mp.MP_LAMBDA] = 0.95
    assert float(f(jnp.asarray(bad_lam))) < at_truth - 3.0

    # Label symmetry: swapping (Y_A, Y_B) and lambda -> 1-lambda is exact.
    swap = TRUTH.copy()
    swap[mp.MP_YYA], swap[mp.MP_YYB] = TRUTH[mp.MP_YYB], TRUTH[mp.MP_YYA]
    swap[mp.MP_LAMBDA] = 1.0 - TRUTH[mp.MP_LAMBDA]
    np.testing.assert_allclose(float(f(jnp.asarray(swap))), at_truth,
                               rtol=1e-6)


def test_multipop_gradient_finite(two_pop_data):
    model = two_pop_data
    tr = mp.default_transform(model)
    fz = jax.jit(mp.make_logpost_z_fn(model, tr))
    z0 = tr.inverse(jnp.asarray(TRUTH))
    g = np.asarray(jax.grad(fz)(z0))
    assert np.isfinite(g).all()
    assert abs(g[mp.MP_YYA]) > 0 and abs(g[mp.MP_LAMBDA]) > 0


def test_multipop_mh_recovery(two_pop_data):
    model = two_pop_data
    f = mp.make_logpost_fn(model)
    step0 = np.zeros(mp.NPARAMS_MP, np.float32)
    step0[[C.Param.AGE, C.Param.FEH, C.Param.MOD, C.Param.ABS]] = [
        0.03, 0.05, 0.05, 0.03,
    ]
    step0[[mp.MP_YYA, mp.MP_YYB, mp.MP_LAMBDA]] = [0.01, 0.01, 0.08]
    cfg = mh.MHConfig(n_stage1=300, n_stage2=300, n_main=800)
    samples, info = jax.jit(
        lambda k: mh.run_adaptive_mh(
            f, jnp.asarray(TRUTH), k, jnp.asarray(step0), cfg
        )
    )(jax.random.PRNGKey(54))
    s = np.asarray(samples)
    assert np.isfinite(np.asarray(info["logposts"])).all()
    lam = s[:, mp.MP_LAMBDA]
    assert abs(lam.mean() - TRUTH[mp.MP_LAMBDA]) < max(4 * lam.std(), 0.15)
    ya = s[:, mp.MP_YYA]
    yb = s[:, mp.MP_YYB]
    assert abs(ya.mean() - 0.25) < 0.03 and abs(yb.mean() - 0.31) < 0.03
