"""Tempered-SMC tests: moments + analytic log evidence on a Gaussian,
mode coverage on a bimodal target, sharded-particle run (BASELINE
config 5 machinery at CI scale)."""
import jax
import jax.numpy as jnp
import numpy as np

from base_tpu.inference import smc

P = 2
MEAN = np.array([1.5, -0.5], np.float32)
COV = np.array([[0.5, 0.2], [0.2, 0.8]], np.float32)
PREC = np.linalg.inv(COV).astype(np.float32)
# target = unnormalized Gaussian: log Z = log((2 pi)^{d/2} |COV|^{1/2})
LOG_Z = 0.5 * P * np.log(2 * np.pi) + 0.5 * np.log(np.linalg.det(COV))

Q0_SD = 4.0


def log_target(z):
    d = z - jnp.asarray(MEAN)
    return -0.5 * d @ jnp.asarray(PREC) @ d


def log_q0(z):
    return jnp.sum(
        -0.5 * (z / Q0_SD) ** 2 - jnp.log(Q0_SD) - 0.5 * jnp.log(2 * jnp.pi)
    )


def sample_q0(key, n):
    return Q0_SD * jax.random.normal(key, (n, P))


def test_smc_gaussian_moments_and_evidence():
    cfg = smc.SMCConfig(n_particles=2048, n_move=4)
    z, info = jax.jit(
        lambda k: smc.run_smc(log_target, sample_q0, log_q0, k, cfg)
    )(jax.random.PRNGKey(0))
    zs = np.asarray(z)
    assert float(info["beta"]) == 1.0
    assert int(info["n_stages"]) < cfg.max_stages
    np.testing.assert_allclose(zs.mean(0), MEAN, atol=0.1)
    np.testing.assert_allclose(np.cov(zs.T), COV, atol=0.25)
    np.testing.assert_allclose(float(info["log_evidence"]), LOG_Z, atol=0.15)


def test_smc_bimodal_mode_weights():
    """Two well-separated modes with 70/30 weights: tempering must keep
    both (single-chain HMC would lose one)."""
    mu = 4.0

    def lt(z):
        a = -0.5 * jnp.sum((z - mu) ** 2) + jnp.log(0.7)
        b = -0.5 * jnp.sum((z + mu) ** 2) + jnp.log(0.3)
        m = jnp.maximum(a, b)
        return m + jnp.log(jnp.exp(a - m) + jnp.exp(b - m))

    cfg = smc.SMCConfig(n_particles=2048, n_move=4)
    z, info = jax.jit(
        lambda k: smc.run_smc(lt, sample_q0, log_q0, k, cfg)
    )(jax.random.PRNGKey(1))
    zs = np.asarray(z)
    frac_pos = float((zs[:, 0] > 0).mean())
    assert 0.55 < frac_pos < 0.85, frac_pos


def test_smc_sharded_matches_single():
    """Particles sharded over the chain axis: pooled-weight resampling
    and psum statistics must give the same posterior (up to MC error)."""
    from jax.sharding import PartitionSpec as Pt

    from base_tpu.parallel.mesh import make_mesh, CHAIN_AXIS

    mesh = make_mesh(n_chain_shards=8, n_star_shards=1)
    cfg = smc.SMCConfig(n_particles=256, n_move=3)  # 256 per shard

    def device_fn(key):
        # Same key on every shard is WRONG for init (identical particles),
        # so fold in the shard index for q0 sampling but share the
        # resampling stream implicitly (keys passed identically and the
        # resampler all_gathers, so ancestry is consistent).
        idx = jax.lax.axis_index(CHAIN_AXIS)
        k = jax.random.fold_in(key, idx)

        def sample_q0_local(kk, n):
            return sample_q0(jax.random.fold_in(kk, idx), n)

        return smc.run_smc(
            log_target, sample_q0_local, log_q0, k, cfg,
            axis_name=CHAIN_AXIS,
        )

    fn = jax.jit(jax.shard_map(
        device_fn, mesh=mesh, in_specs=Pt(),
        out_specs=(Pt(CHAIN_AXIS, None),
                   dict(log_evidence=Pt(), beta=Pt(), n_stages=Pt(),
                        accept=Pt(), betas=Pt(), move_scale=Pt())),
        check_vma=False,
    ))
    z, info = fn(jax.random.PRNGKey(2))
    zs = np.asarray(z)  # [2048, 2]
    assert zs.shape == (2048, 2)
    np.testing.assert_allclose(zs.mean(0), MEAN, atol=0.15)
    np.testing.assert_allclose(float(info["log_evidence"]), LOG_Z, atol=0.2)


def test_smc_move_autotune_reaches_band():
    """A deliberately mis-scaled move kernel (move_scale 30x too big)
    must be pulled into a usable acceptance band by the per-stage
    autotuner (VERDICT r3 #6: the r3 artifact sat at 0.13)."""
    cfg = smc.SMCConfig(n_particles=1024, n_move=4, move_scale=30.0,
                        max_stages=32, ess_target=0.8)
    z, info = jax.jit(
        lambda k: smc.run_smc(log_target, sample_q0, log_q0, k, cfg)
    )(jax.random.PRNGKey(3))
    zs = np.asarray(z)
    # scale adapted down by orders of magnitude...
    assert float(info["move_scale"]) < 10.0
    # ...and the posterior is still right.
    np.testing.assert_allclose(zs.mean(0), MEAN, atol=0.15)
    np.testing.assert_allclose(
        float(info["log_evidence"]), LOG_Z, atol=0.2
    )


def test_smc_replicated_evidence_se():
    """run_smc_replicated: pooled particles + a repeat-run standard
    error that actually covers the analytic log evidence."""
    cfg = smc.SMCConfig(n_particles=512, n_move=3)
    z, info = jax.jit(
        lambda k: smc.run_smc_replicated(
            log_target, sample_q0, log_q0, k, cfg, n_rep=4
        )
    )(jax.random.PRNGKey(4))
    assert z.shape == (4 * 512, 2)
    le = float(info["log_evidence"])
    se = float(info["log_evidence_se"])
    assert se > 0.0
    assert info["log_evidences"].shape == (4,)
    # mean within ~4 combined-error of truth (se underestimates total
    # error slightly at n_rep=4; keep a wide band)
    assert abs(le - LOG_Z) < max(4 * se, 0.25)
    np.testing.assert_allclose(np.asarray(z).mean(0), MEAN, atol=0.15)


def test_chunked_runner_matches_replicated():
    """make_smc_chunked_runner must reproduce run_smc_replicated
    EXACTLY (same per-stage math, same key schedule; the host loop only
    truncates post-beta=1 no-op stages)."""
    from base_tpu.inference.smc import (
        SMCConfig, make_smc_chunked_runner, run_smc_replicated,
    )

    cfg = SMCConfig(n_particles=128, n_move=2, max_stages=16)
    key = jax.random.PRNGKey(11)
    z_a, info_a = jax.jit(
        lambda k: run_smc_replicated(log_target, sample_q0, log_q0, k,
                                     cfg, n_rep=3)
    )(key)
    runner = make_smc_chunked_runner(log_target, sample_q0, log_q0, cfg,
                                     n_rep=3)
    z_b, info_b = runner(key)
    np.testing.assert_allclose(np.asarray(z_a), np.asarray(z_b),
                               atol=1e-5)
    np.testing.assert_allclose(float(info_a["log_evidence"]),
                               float(info_b["log_evidence"]), atol=1e-4)
    assert int(info_a["n_stages"]) == int(info_b["n_stages"])
    assert abs(float(info_a["accept"]) - float(info_b["accept"])) < 0.05
