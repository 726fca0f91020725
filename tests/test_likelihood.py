"""Likelihood-layer tests: matmul decomposition vs naive loops, masking,
field mixture, and posterior shape/grad sanity (SURVEY.md §4.2.1-2)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from base_tpu import constants as C
from base_tpu.grids.isochrone import derive_isochrone
from base_tpu.model import likelihood as lk
from base_tpu.model import posterior as post
from base_tpu.model.stardata import make_ms_stars
from base_tpu.sim.simulate import simulate_cluster
from base_tpu.sim.scatter import scatter_cluster

TRUTH = np.array([9.3, 0.27, -0.5, 10.0, 0.3, 0.5, 0.0, 0.0, 0.0], np.float32)


@pytest.fixture(scope="module")
def dataset(small_grid):
    key = jax.random.PRNGKey(1)
    cat = simulate_cluster(small_grid, jnp.asarray(TRUTH), 64, key,
                           percent_binary=0.3)
    sc = scatter_cluster(cat.mags, jax.random.PRNGKey(2), limit_mag=24.0)
    stars = make_ms_stars(np.asarray(sc.mags), np.asarray(sc.sigmas),
                          cm_prior=0.99)
    model = post.make_single_pop_model(
        small_grid, stars,
        prior_mean=TRUTH,
        prior_sigma=np.array([-1, -1, 0.3, 0.2, 0.1, -1, -1, -1, -1],
                             np.float32),
        n_q=8,
    )
    return model


def _naive_loglik(stars, model_mags):
    """Direct O(S*T*B) loop version of gaussian_loglik_matrix."""
    mags = np.asarray(stars.obs_mags)
    sig = np.asarray(stars.obs_sigma)
    mm = np.asarray(model_mags)
    S, B = mags.shape
    T = mm.shape[0]
    out = np.zeros((S, T))
    for s in range(S):
        for t in range(T):
            tot = 0.0
            for b in range(B):
                if sig[s, b] > 0:
                    z = (mags[s, b] - mm[t, b]) / sig[s, b]
                    tot += -0.5 * z * z - np.log(sig[s, b]) - 0.5 * np.log(2 * np.pi)
            out[s, t] = tot
    return out


def test_matmul_matches_naive(dataset, rng):
    model = dataset
    # sigma_model=0 so the naive loop (which reads raw obs_sigma) agrees.
    stars = make_ms_stars(
        np.asarray(model.stars.obs_mags), np.asarray(model.stars.obs_sigma)
    )
    mm = rng.normal(10.0, 3.0, size=(12, stars.n_bands)).astype(np.float32)
    want = _naive_loglik(stars, mm)
    got = np.asarray(lk.gaussian_loglik_matrix(stars, jnp.asarray(mm)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)
    # MXU variant agrees up to float32 cancellation with centering.
    center = jnp.mean(stars.obs_mags, axis=0)
    got2 = np.asarray(lk.gaussian_loglik_matmul(stars, jnp.asarray(mm), center))
    np.testing.assert_allclose(got2, want, rtol=1e-3, atol=0.5)


def test_unobserved_bands_ignored(small_grid):
    mags = np.full((4, small_grid.n_bands), 12.0, np.float32)
    sig = np.full_like(mags, 0.05)
    sig[:, 0] = -9.0  # first band unobserved
    stars = make_ms_stars(mags, sig)
    mm = np.full((3, small_grid.n_bands), 12.0, np.float32)
    mm[:, 0] = 99.0  # model wildly off in the unobserved band only
    ll = np.asarray(lk.gaussian_loglik_matrix(stars, jnp.asarray(mm)))
    # loglik must equal the perfect-fit value over the 7 observed bands
    want = 7 * (-np.log(0.05) - 0.5 * np.log(2 * np.pi))
    np.testing.assert_allclose(ll, want, rtol=1e-4)


def test_padding_stars_do_not_contribute(dataset):
    model = dataset
    stars2 = make_ms_stars(
        np.asarray(model.stars.obs_mags), np.asarray(model.stars.obs_sigma),
        cm_prior=0.99, pad_to=model.stars.n_stars + 13,
    )
    iso = derive_isochrone(model.grid, TRUTH[2], TRUTH[1], TRUTH[0])
    table = lk.build_segment_table(
        iso, model.q_grid, TRUTH[3], TRUTH[4], model.abs_coefs
    )
    a = float(lk.ms_total_loglik(model.stars, table))
    b = float(lk.ms_total_loglik(stars2, table))
    np.testing.assert_allclose(a, b, rtol=1e-5)


def test_logpost_finite_and_peaked(dataset):
    model = dataset
    f = jax.jit(post.make_logpost_fn(model))
    at_truth = float(f(jnp.asarray(TRUTH)))
    assert np.isfinite(at_truth)
    # Wrong age should be much worse.
    off = TRUTH.copy()
    off[C.Param.AGE] = 10.05
    assert float(f(jnp.asarray(off))) < at_truth - 50.0
    # Out of hull -> NEG_INF sentinel
    oob = TRUTH.copy()
    oob[C.Param.FEH] = 5.0
    assert float(f(jnp.asarray(oob))) < -1e29


def test_logpost_gradient_finite(dataset):
    model = dataset
    tr = post.default_transform(model)
    fz = jax.jit(post.make_logpost_z_fn(model, tr))
    z0 = tr.inverse(jnp.asarray(TRUTH))
    g = jax.grad(fz)(z0)
    assert np.isfinite(np.asarray(g)).all()
    # grad wrt the active (non-IFMR) params should be nonzero
    assert np.abs(np.asarray(g)[:5]).min() > 0


def test_vmap_over_chains(dataset):
    model = dataset
    f = jax.jit(jax.vmap(post.make_logpost_fn(model)))
    batch = jnp.asarray(np.tile(TRUTH, (4, 1)))
    batch = batch.at[:, C.Param.AGE].add(jnp.asarray([0.0, 0.02, -0.02, 0.1]))
    vals = np.asarray(f(batch))
    assert vals.shape == (4,) and np.isfinite(vals).all()


def test_segment_integral_exact(small_grid):
    """The closed-form segment integral must match brute-force numerical
    integration of the piecewise-linear model to float32 accuracy."""
    iso = derive_isochrone(small_grid, -0.5, 0.27, 9.3)
    q = jnp.asarray([0.0], jnp.float32)
    table = lk.build_segment_table(iso, q, 10.0, 0.3,
                                   jnp.ones(small_grid.n_bands),
                                   binaries=False)
    mags = np.asarray(iso.mags_at_mass(jnp.asarray([0.8, 1.05]))) + 10.3
    sig = np.full_like(mags, 0.05)
    stars = make_ms_stars(mags.astype(np.float32), sig.astype(np.float32))
    got = np.asarray(lk.segment_logintegrals(stars, table))  # [2, T]

    # Brute force: 2000 nodes per segment, trapezoid.
    lo = np.asarray(table.lo, np.float64)
    hi = np.asarray(table.hi, np.float64)
    t = np.linspace(0.0, 1.0, 2000)
    iv = np.asarray(stars.inv_var, np.float64)
    ln = np.asarray(stars.log_norm, np.float64)
    for s in range(2):
        for seg in range(0, lo.shape[0], 7):
            m = lo[seg][None, :] * (1 - t)[:, None] + hi[seg][None, :] * t[:, None]
            chi2 = ((np.asarray(stars.obs_mags, np.float64)[s][None, :] - m) ** 2
                    * iv[s][None, :]).sum(-1)
            val = np.trapz(np.exp(-0.5 * (chi2 - chi2.min())), t)
            want = np.log(max(val, 1e-300)) - 0.5 * chi2.min() + ln[s]
            if want > -25:  # only check where float32 has precision
                np.testing.assert_allclose(got[s, seg], want, rtol=0, atol=2e-2)


def test_segment_marginal_no_aliasing(dataset):
    """The log-posterior profile along age must be smooth: adjacent
    fine-grained age evaluations should not jump by tens of nats (the
    failure mode of nodal quadrature)."""
    model = dataset
    f = jax.jit(jax.vmap(post.make_logpost_fn(model)))
    ages = np.linspace(9.25, 9.35, 21, dtype=np.float32)
    batch = np.tile(TRUTH, (21, 1))
    batch[:, 0] = ages
    vals = np.asarray(f(jnp.asarray(batch)))
    assert np.isfinite(vals).all()
    second_diff = np.abs(np.diff(vals, 2))
    assert second_diff.max() < 10.0, second_diff.max()


def test_field_mixture_floor(dataset):
    """A star nowhere near the isochrone is caught by the field component:
    its contribution is bounded below by log((1-cm)*field_dens)."""
    model = dataset
    mags = np.full((1, model.grid.n_bands), 5.0, np.float32)  # way off
    sig = np.full_like(mags, 0.02)
    stars = make_ms_stars(mags, sig, cm_prior=0.9)
    iso = derive_isochrone(model.grid, TRUTH[2], TRUTH[1], TRUTH[0])
    table = lk.build_segment_table(
        iso, model.q_grid, TRUTH[3], TRUTH[4], model.abs_coefs
    )
    tot = float(lk.ms_total_loglik(stars, table))
    floor = float(np.log(0.1) + np.asarray(stars.field_logdens)[0])
    assert tot >= floor - 1e-3
    assert tot <= floor + 1e-3  # cluster term negligible here
