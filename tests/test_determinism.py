"""Determinism guarantees (SURVEY.md §5 race-detection analog): the
pipeline is pure-functional, so same seed => bit-identical results."""
import jax
import jax.numpy as jnp
import numpy as np

from base_tpu.inference import hmc, mh, smc


def lp(z):
    return jnp.sum(-0.5 * z * z)


def test_mh_bit_identical():
    cfg = mh.MHConfig(n_stage1=100, n_stage2=100, n_main=200)
    f = jax.jit(lambda k: mh.run_adaptive_mh(
        lp, jnp.zeros(3), k, jnp.ones(3) * 0.3, cfg
    )[0])
    a = np.asarray(f(jax.random.PRNGKey(9)))
    b = np.asarray(f(jax.random.PRNGKey(9)))
    np.testing.assert_array_equal(a, b)
    c = np.asarray(f(jax.random.PRNGKey(10)))
    assert not np.array_equal(a, c)


def test_hmc_bit_identical():
    cfg = hmc.HMCConfig(n_warmup=50, n_samples=50, l_max=4, n_windows=1)
    init = jnp.zeros((2, 3)) + 0.1
    f = jax.jit(lambda k: hmc.run_hmc(lp, init, k, cfg)[0])
    a = np.asarray(f(jax.random.PRNGKey(3)))
    b = np.asarray(f(jax.random.PRNGKey(3)))
    np.testing.assert_array_equal(a, b)


def test_smc_bit_identical():
    cfg = smc.SMCConfig(n_particles=128, n_move=2, max_stages=10)

    def q0(k, n):
        return 3.0 * jax.random.normal(k, (n, 2))

    def lq(z):
        return jnp.sum(-0.5 * (z / 3.0) ** 2 - jnp.log(3.0) - 0.9189385)

    f = jax.jit(lambda k: smc.run_smc(lp, q0, lq, k, cfg)[0])
    a = np.asarray(f(jax.random.PRNGKey(4)))
    b = np.asarray(f(jax.random.PRNGKey(4)))
    np.testing.assert_array_equal(a, b)
