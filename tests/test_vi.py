"""ADVI tests: exact recovery on Gaussian targets (mean-field and
full-rank) and a usable fit on the cluster posterior."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from base_tpu.inference import vi
from base_tpu.model import posterior as post
from base_tpu.model.stardata import make_ms_stars
from base_tpu.sim.scatter import scatter_cluster
from base_tpu.sim.simulate import simulate_cluster

MEAN = np.array([2.0, -1.0], np.float32)
SD = np.array([0.5, 1.5], np.float32)
COV = np.array([[1.0, 0.8], [0.8, 1.0]], np.float32)
PREC = np.linalg.inv(COV).astype(np.float32)

TRUTH = np.array([9.3, 0.27, -0.5, 10.0, 0.3, 0.5, 0, 0, 0], np.float32)


def test_meanfield_recovers_diagonal_gaussian():
    def lp(z):
        return jnp.sum(-0.5 * ((z - MEAN) / SD) ** 2)

    cfg = vi.VIConfig(n_steps=1200, n_mc=16)
    res = jax.jit(lambda k: vi.run_vi(lp, jnp.zeros(2), k, cfg))(
        jax.random.PRNGKey(0)
    )
    np.testing.assert_allclose(np.asarray(res.mu), MEAN, atol=0.1)
    np.testing.assert_allclose(np.asarray(res.scale), SD, rtol=0.2)
    # ELBO converged upward
    tr = np.asarray(res.elbo_trace)
    assert tr[-50:].mean() > tr[:50].mean()


def test_fullrank_recovers_correlation():
    def lp(z):
        d = z - MEAN
        return -0.5 * d @ jnp.asarray(PREC) @ d

    cfg = vi.VIConfig(n_steps=2000, n_mc=16, full_rank=True)
    res = jax.jit(lambda k: vi.run_vi(lp, jnp.zeros(2), k, cfg))(
        jax.random.PRNGKey(1)
    )
    L = np.asarray(res.scale)
    fitted_cov = L @ L.T
    np.testing.assert_allclose(fitted_cov, COV, atol=0.2)
    samples = np.asarray(vi.sample_posterior(res, jax.random.PRNGKey(2), 4000))
    corr = np.corrcoef(samples.T)[0, 1]
    assert corr > 0.6


@pytest.mark.slow
def test_vi_on_cluster_posterior(small_grid):
    cat = simulate_cluster(small_grid, jnp.asarray(TRUTH), 48,
                           jax.random.PRNGKey(61), percent_binary=0.0)
    sc = scatter_cluster(cat.mags, jax.random.PRNGKey(62), limit_mag=24.0)
    stars = make_ms_stars(np.asarray(sc.mags), np.asarray(sc.sigmas),
                          cm_prior=0.999)
    model = post.make_single_pop_model(
        small_grid, stars, prior_mean=TRUTH,
        prior_sigma=np.array([-1, -1, 0.3, 0.2, 0.1, -1, -1, -1, -1],
                             np.float32),
        n_q=6, binaries=False,
    )
    tr = post.default_transform(model)
    fz = post.make_logpost_z_fn(model, tr)
    z0 = tr.inverse(jnp.asarray(TRUTH))
    cfg = vi.VIConfig(n_steps=600, n_mc=8, learning_rate=1e-2)
    res = jax.jit(lambda k: vi.run_vi(fz, z0, k, cfg))(jax.random.PRNGKey(63))
    zs = vi.sample_posterior(res, jax.random.PRNGKey(64), 500)
    xs = np.asarray(jax.vmap(tr.forward)(zs))
    assert np.isfinite(xs).all()
    age = xs[:, 0]
    assert abs(age.mean() - TRUTH[0]) < 0.15
