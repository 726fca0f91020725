"""NUTS vs jittered-trajectory HMC on the bench scenario, real TPU.

VERDICT r1 weak #6 asked for a measured comparison: under vmap NUTS runs
every chain to the slowest tree, so its throughput cost vs fixed-length
HMC must be measured, not asserted.  Both samplers run host-chunked
(tunnel-safe), dense metric, pinned flat dims, same warmup budget.

Run from /root/repo: python -u benchmarks/nuts_vs_hmc_tpu.py
Captured output: benchmarks/nuts_vs_hmc_tpu.out
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

    from base_tpu.inference import diagnostics as diag
    from base_tpu.inference.driver import make_hmc_chunked_runner
    from base_tpu.inference.hmc import HMCConfig
    from base_tpu.inference.nuts import NUTSConfig, make_nuts_chunked_runner
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
    C = 64
    init = jnp.tile(z0[None, :], (C, 1)) + 0.02 * jax.random.normal(
        jax.random.PRNGKey(2), (C, 9))
    mask = (1, 1, 1, 1, 1, 0, 0, 0, 0)
    print(json.dumps({"backend": jax.default_backend(), "chains": C}),
          flush=True)

    def measure(name, runner, n_samples, lf_per_draw):
        zs, info = runner(init, jax.random.PRNGKey(3), 64)  # warm compile
        jax.block_until_ready(zs)
        t0 = time.perf_counter()
        zs, info = runner(init, jax.random.PRNGKey(4))
        jax.block_until_ready(zs)
        dt = time.perf_counter() - t0
        xs = jax.vmap(jax.vmap(tr.forward))(zs)
        ess = float(diag.ess(xs[:, :, :1])[0])
        lf = (float(info["mean_leapfrogs"])
              if "mean_leapfrogs" in info else lf_per_draw)
        print(json.dumps({
            "sampler": name, "wall_s": round(dt, 2),
            "ess_age": round(ess, 1),
            "ess_age_per_sec": round(ess / dt, 1),
            "accept": round(float(info["accept_prob"]), 3),
            "step_size": round(float(info["step_size"]), 4),
            "leapfrogs_per_draw": round(lf, 1),
            "rhat_age": round(float(diag.split_rhat(xs[:, :, :1])[0]), 4),
        }), flush=True)

    hcfg = HMCConfig(n_warmup=256, n_samples=1024, l_max=48, n_windows=4,
                     dense_mass=True, free_mask=mask)
    measure("hmc", make_hmc_chunked_runner(fz, hcfg, chunk_draws=256),
            hcfg.n_samples, hcfg.l_max)

    ncfg = NUTSConfig(n_warmup=256, n_samples=1024, max_depth=7,
                      n_windows=4, dense_mass=True, free_mask=mask)
    measure("nuts", make_nuts_chunked_runner(fz, ncfg, chunk_draws=64),
            ncfg.n_samples, 0.0)


if __name__ == "__main__":
    main()
