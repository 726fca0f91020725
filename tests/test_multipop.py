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


def test_ordered_transform_bijection(two_pop_data):
    """ordered_transform: round-trip exactness, Y_A < Y_B by
    construction, and log|J| matches autodiff (VERDICT r1 #6)."""
    model = two_pop_data
    tr = mp.ordered_transform(model)
    x = jnp.asarray(TRUTH)
    z = tr.inverse(x)
    x2 = tr.forward(z)
    # TRUTH's Y_B sits exactly on the grid hull; the transform's 1e-3
    # margin shrink pulls it in by span*margin = 7e-5.
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-4)

    # arbitrary unconstrained points always map to ordered, in-hull pairs
    zs = jax.random.normal(jax.random.PRNGKey(0), (64, mp.NPARAMS_MP)) * 3
    xs = jax.vmap(tr.forward)(zs)
    ya = np.asarray(xs[:, mp.MP_YYA])
    yb = np.asarray(xs[:, mp.MP_YYB])
    y_lo = float(model.grid.y[0])
    y_hi = float(model.grid.y[-1])
    assert (yb > ya).all()
    assert (ya >= y_lo).all() and (yb <= y_hi + 1e-5).all()

    # log-det vs autodiff jacobian at a few points
    for i in range(4):
        zi = zs[i]
        J = jax.jacfwd(tr.forward)(zi)
        want = float(jnp.linalg.slogdet(J)[1])
        got = float(tr.log_det_jacobian(zi))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_multipop_wd_branch(two_pop_data, small_grid):
    """WD stars evaluate against both populations and react to lambda."""
    from base_tpu.grids.wd_atmosphere import synthetic_bergeron
    from base_tpu.grids.wd_cooling import synthetic_wd_cooling
    from base_tpu.model import wd as wd_mod

    base = two_pop_data
    cooling = synthetic_wd_cooling()
    atm = synthetic_bergeron()
    # tunable-linear IFMR wants real coefficients (slots 6-7); the
    # all-zero TRUTH values give zero WD mass and no valid nodes
    truth_wd = TRUTH.copy()
    truth_wd[6], truth_wd[7] = 0.721, 0.109
    # forward-model a few WDs at the truth (population A's Y)
    pa = jnp.asarray(truth_wd).at[C.Param.YYY].set(TRUTH[mp.MP_YYA])
    mz = jnp.linspace(0.8, C.MAX_WD_PRECURSOR_MASS, 64)
    mags, _, valid = wd_mod.wd_model_mags(
        small_grid, cooling, atm, pa, mz, "linear"
    )
    assert bool(valid.any())
    pick = np.asarray(mags[0][np.asarray(valid)])[:4]  # 4 DA nodes
    dist = truth_wd[C.Param.MOD] + truth_wd[C.Param.ABS] * np.asarray(
        base.abs_coefs
    )
    wd_stars = make_ms_stars(
        pick + dist[None, :],
        np.full_like(pick, 0.03),
        cm_prior=0.999,
    )
    model = mp.make_multipop_model(
        small_grid, base.stars,
        np.asarray(base.priors.mean), np.asarray(base.priors.sigma),
        n_q=6, binaries=False,
        wd_cooling=cooling, wd_atm=atm, wd_stars=wd_stars,
    )
    f = jax.jit(mp.make_logpost_fn(model))
    at_truth = float(f(jnp.asarray(truth_wd)))
    assert np.isfinite(at_truth)
    # gradient flows through the WD branch
    tr = mp.ordered_transform(model)
    fz = mp.make_logpost_z_fn(model, tr)
    g = np.asarray(jax.grad(fz)(tr.inverse(jnp.asarray(truth_wd))))
    assert np.isfinite(g).all()
    # WD-bearing density differs from the MS-only one (branch is live)
    f0 = jax.jit(mp.make_logpost_fn(two_pop_data))
    assert abs(at_truth - float(f0(jnp.asarray(truth_wd)))) > 1.0


@pytest.mark.slow
def test_multipop_hmc_ordered_recovery(two_pop_data):
    """HMC through the ordered transform recovers (Y_A, Y_B, lambda) at
    NGC 2808-like lambda with converged chains (VERDICT r1 #6 done
    criterion: R-hat < 1.01 on mixture-identified quantities)."""
    from base_tpu.inference import diagnostics as diag
    from base_tpu.inference.hmc import HMCConfig, run_hmc

    model = two_pop_data
    tr = mp.ordered_transform(model)
    fz = mp.make_logpost_z_fn(model, tr)
    z0 = tr.inverse(jnp.asarray(TRUTH))
    init = jnp.tile(z0[None, :], (8, 1))
    init = init + 0.01 * jax.random.normal(jax.random.PRNGKey(60), init.shape)
    cfg = HMCConfig(n_warmup=500, n_samples=500, l_max=16, n_windows=4,
                    dense_mass=True, free_mask=mp.free_mask(model))
    zs, info = jax.jit(lambda z, k: run_hmc(fz, z, k, cfg))(
        init, jax.random.PRNGKey(61)
    )
    xs = np.asarray(jax.vmap(jax.vmap(tr.forward))(zs))  # [N, C, 12]
    assert float(info["accept_prob"]) > 0.5
    ya = xs[:, :, mp.MP_YYA]
    yb = xs[:, :, mp.MP_YYB]
    lam = xs[:, :, mp.MP_LAMBDA]
    assert (yb > ya).all()
    assert abs(ya.mean() - TRUTH[mp.MP_YYA]) < 0.02
    assert abs(yb.mean() - TRUTH[mp.MP_YYB]) < 0.02
    assert abs(lam.mean() - TRUTH[mp.MP_LAMBDA]) < max(4 * lam.std(), 0.15)
    # ordering makes the labels identified: R-hat directly on the params
    sub = jnp.asarray(
        xs[:, :, [0, 2, 3, mp.MP_YYA, mp.MP_YYB, mp.MP_LAMBDA]]
    )
    r = np.asarray(diag.split_rhat(sub))
    assert (r < 1.05).all(), r
