"""Isolate the >=128-chain TPU device fault (seen in r2 and r3 sweeps).

Steps up through: single batched grad eval at growing C, then short HMC
runs.  Run: python -u scripts/probe_bigbatch.py
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

    from base_tpu.inference.hmc import HMCConfig, run_hmc
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
    print(json.dumps({"backend": jax.default_backend()}), flush=True)

    vg = jax.jit(jax.vmap(jax.value_and_grad(fz)))
    for C in (64, 128, 256, 512, 1024):
        try:
            z = jnp.tile(z0[None, :], (C, 1)) + 0.01 * jax.random.normal(
                jax.random.PRNGKey(5), (C, 9))
            t0 = time.perf_counter()
            lp, g = vg(z)
            jax.block_until_ready(g)
            c_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            for _ in range(10):
                lp, g = vg(z)
            jax.block_until_ready(g)
            dt = (time.perf_counter() - t0) / 10
            print(json.dumps({
                "step": "vgrad", "C": C, "ms": round(dt * 1e3, 2),
                "compile_s": round(c_s, 1),
                "evals_per_sec": round(C / dt, 0),
                "finite": bool(jnp.isfinite(g).all()),
            }), flush=True)
        except Exception as e:
            print(json.dumps({"step": "vgrad", "C": C,
                              "error": repr(e)[:200]}), flush=True)
            return

    for C, chunk in ((256, None), (256, 64)):
        try:
            cfg = HMCConfig(n_warmup=16, n_samples=16, l_max=8, n_windows=2,
                            dense_mass=True,
                            free_mask=(1, 1, 1, 1, 1, 0, 0, 0, 0),
                            chain_chunk=chunk)
            init = jnp.tile(z0[None, :], (C, 1)) + 0.02 * jax.random.normal(
                jax.random.PRNGKey(2), (C, 9))
            runner = jax.jit(lambda z, k: run_hmc(fz, z, k, cfg))
            t0 = time.perf_counter()
            zs, info = runner(init, jax.random.PRNGKey(3))
            jax.block_until_ready(zs)
            print(json.dumps({
                "step": "short_hmc", "C": C, "chunk": chunk,
                "wall_s": round(time.perf_counter() - t0, 1),
                "finite": bool(jnp.isfinite(zs).all()),
            }), flush=True)
        except Exception as e:
            print(json.dumps({"step": "short_hmc", "C": C, "chunk": chunk,
                              "error": repr(e)[:200]}), flush=True)
            return


if __name__ == "__main__":
    main()
