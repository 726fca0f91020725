"""Tempered SMC on the bench scenario, real TPU: posterior + evidence.

SMC is the many-chips sampler of the pod config (BASELINE.json:11);
this artifact pins its single-chip behavior: adaptive beta ladder
length, resampling acceptance, log-evidence estimate, and posterior
agreement with the HMC bench run (age mean/sd).

Run from /root/repo: python -u benchmarks/smc_tpu.py
Captured output: benchmarks/smc_tpu.out
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from base_tpu.inference.smc import SMCConfig, run_smc_replicated
    from base_tpu.grids import synthetic
    from base_tpu.model import posterior as post
    from base_tpu.model.stardata import make_ms_stars
    from base_tpu.sim.scatter import scatter_cluster
    from base_tpu.sim.simulate import simulate_cluster

    truth = np.array([9.3, 0.27, -0.5, 10.0, 0.3, 0.5, 0, 0, 0], np.float32)
    grid = synthetic.make_grid(n_eep=64)
    cat = simulate_cluster(grid, jnp.asarray(truth), 100,
                           jax.random.PRNGKey(0), percent_binary=0.3)
    sc = scatter_cluster(cat.mags, jax.random.PRNGKey(1), limit_mag=24.0)
    stars = make_ms_stars(np.asarray(sc.mags), np.asarray(sc.sigmas),
                          cm_prior=0.99)
    model = post.make_single_pop_model(
        grid, stars, prior_mean=truth,
        prior_sigma=np.array([-1, -1, 0.3, 0.2, 0.1, -1, -1, -1, -1],
                             np.float32), n_q=8)
    tr = post.default_transform(model)
    fz = post.make_logpost_z_fn(model, tr)
    z0 = tr.inverse(jnp.asarray(truth))
    sd0 = 0.5

    def log_q0(z):
        return jnp.sum(-0.5 * ((z - z0) / sd0) ** 2
                       - jnp.log(sd0) - 0.9189385)

    def sample_q0(k, n):
        return z0[None, :] + sd0 * jax.random.normal(k, (n, 9))

    # Move-kernel autotuning ON (defaults): the r3/r4 artifact pinned
    # move_scale at 0.4 and sat at accept 0.13; the adaptive scale
    # should land acceptance in the 0.2-0.5 mixing band on its own.
    # 4 replicates give the log-evidence a repeat-run SE.
    n_rep = 4
    cfg = SMCConfig(n_particles=2048, max_stages=24, n_move=6)
    runner = jax.jit(
        lambda k: run_smc_replicated(fz, sample_q0, log_q0, k, cfg,
                                     n_rep=n_rep))
    parts, info = runner(jax.random.PRNGKey(3))   # compile + run
    jax.block_until_ready(parts)
    t0 = time.perf_counter()
    parts, info = runner(jax.random.PRNGKey(4))
    jax.block_until_ready(parts)
    dt = time.perf_counter() - t0
    xs = np.asarray(jax.vmap(tr.forward)(parts))
    print(json.dumps({
        "backend": jax.default_backend(),
        "n_rep": n_rep,
        "particles_per_rep": cfg.n_particles,
        "wall_s": round(dt, 2),
        "n_stages": int(info["n_stages"]),
        "move_accept": round(float(info["accept"]), 3),
        "move_scale": round(float(info["move_scale"]), 4),
        "log_evidence": round(float(info["log_evidence"]), 2),
        "log_evidence_se": round(float(info["log_evidence_se"]), 3),
        "age_mean": round(float(xs[:, 0].mean()), 4),
        "age_sd": round(float(xs[:, 0].std()), 4),
        "feh_mean": round(float(xs[:, 2].mean()), 4),
        "note": "HMC on identical data: age 9.311+-0.026, FeH -0.680+-0.173",
    }), flush=True)


if __name__ == "__main__":
    main()
