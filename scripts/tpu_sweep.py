"""TPU sweep: HMC config search for the bench hot path (real chip).

Each config prints one JSON line: ESS/s for age plus diagnostics.
Run from /root/repo (no PYTHONPATH):  python -u scripts/tpu_sweep.py A B C
A device fault in one config is reported and the sweep continues (the
device usually needs a fresh process after a fault — prefer one config
per invocation for the big ones).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import time

import numpy as np

CONFIGS = {
    # name: (chains, l_max, dense, mask, warmup, samples, windows, pallas)
    "A": (64, 16, False, False, 256, 256, 4, False),    # ~old bench
    "B": (64, 16, False, True, 256, 256, 4, False),     # + pin flat dims
    "C": (64, 48, False, True, 256, 256, 4, False),     # + long traj
    "D": (64, 48, True, True, 256, 256, 4, False),      # + dense metric
    "E": (64, 96, True, True, 256, 256, 4, False),      # longer still
    "F": (256, 48, True, True, 256, 256, 4, False),     # chain scaling
    "G": (512, 48, True, True, 256, 256, 4, False),
    "H": (1024, 48, True, True, 256, 256, 4, False),
    "DP": (64, 48, True, True, 256, 256, 4, True),      # pallas kernel
    "P": (256, 48, True, True, 256, 256, 4, True),
    "GP": (512, 48, True, True, 256, 256, 4, True),
    "HP": (1024, 48, True, True, 256, 256, 4, True),
    # chunked-execution configs (tunnel-safe; suffix K): more samples
    "DK": (64, 48, True, True, 256, 1024, 4, False),
    "FK": (128, 48, True, True, 256, 1024, 4, False),
    "GK": (256, 48, True, True, 256, 1024, 8, False),
    "HK": (512, 48, True, True, 256, 1024, 8, False),
    "IK": (1024, 48, True, True, 256, 1024, 16, False),
    "GKP": (256, 48, True, True, 256, 1024, 8, True),
}


def main(names):
    import jax
    import jax.numpy as jnp

    from base_tpu.inference import diagnostics as diag
    from base_tpu.inference.driver import run_hmc_chunked
    from base_tpu.inference.hmc import HMCConfig, run_hmc
    from base_tpu.grids import synthetic
    from base_tpu.model import posterior as post
    from base_tpu.model.stardata import make_ms_stars
    from base_tpu.sim.scatter import scatter_cluster
    from base_tpu.sim.simulate import simulate_cluster

    truth = np.array([9.3, 0.27, -0.5, 10.0, 0.3, 0.5, 0, 0, 0], np.float32)
    grid = synthetic.make_grid(n_eep=64)
    n_stars = 100
    cat = simulate_cluster(grid, jnp.asarray(truth), n_stars,
                           jax.random.PRNGKey(0), percent_binary=0.3)
    sc = scatter_cluster(cat.mags, jax.random.PRNGKey(1), limit_mag=24.0)
    stars = make_ms_stars(np.asarray(sc.mags), np.asarray(sc.sigmas),
                          cm_prior=0.99)

    print(json.dumps({"backend": jax.default_backend()}), flush=True)

    def run_one(name):
        chains, l_max, dense, mask, warm, samp, win, pallas = CONFIGS[name]
        model = post.make_single_pop_model(
            grid, stars, prior_mean=truth,
            prior_sigma=np.array([-1, -1, 0.3, 0.2, 0.1, -1, -1, -1, -1],
                                 np.float32),
            n_q=8, use_pallas=pallas,
        )
        tr = post.default_transform(model)
        fz = post.make_logpost_z_fn(model, tr)
        z0 = tr.inverse(jnp.asarray(truth))
        cfg = HMCConfig(
            n_warmup=warm, n_samples=samp, l_max=l_max, n_windows=win,
            dense_mass=dense,
            free_mask=(1, 1, 1, 1, 1, 0, 0, 0, 0) if mask else None,
        )
        init = jnp.tile(z0[None, :], (chains, 1))
        init = init + 0.02 * jax.random.normal(jax.random.PRNGKey(2),
                                               init.shape)
        if name.endswith("K") or name.endswith("KP"):
            # host-chunked executions (tunnel-safe at any scale)
            chunk = max(16, min(256, int(1.5e6 / (l_max * chains))))

            def runner(k):
                return run_hmc_chunked(fz, init, k, cfg,
                                       chunk_draws=chunk)
        else:
            jrun = jax.jit(lambda z, k: run_hmc(fz, z, k, cfg))

            def runner(k):
                return jrun(init, k)
        t_c0 = time.perf_counter()
        zs, info = runner(jax.random.PRNGKey(3))
        jax.block_until_ready(zs)
        compile_s = time.perf_counter() - t_c0
        t0 = time.perf_counter()
        zs, info = runner(jax.random.PRNGKey(4))
        jax.block_until_ready(zs)
        dt = time.perf_counter() - t0
        xs = jax.vmap(jax.vmap(tr.forward))(zs)
        ess = np.asarray(diag.ess(xs[:, :, :5]))
        rhat = np.asarray(diag.split_rhat(xs[:, :, :5]))
        evals = (warm + samp) * l_max * chains
        print(json.dumps({
            "cfg": name, "chains": chains, "l_max": l_max,
            "dense": dense, "mask": mask, "pallas": pallas,
            "wall_s": round(dt, 2), "compile_s": round(compile_s, 1),
            "ess_age_per_sec": round(float(ess[0]) / dt, 1),
            "ess5": np.round(ess, 1).tolist(),
            "rhat5": np.round(rhat, 3).tolist(),
            "accept": round(float(info["accept_prob"]), 3),
            "eps": round(float(info["step_size"]), 5),
            "grad_evals_per_sec": round(evals / dt, 0),
        }), flush=True)

    for name in names:
        try:
            run_one(name)
        except Exception as e:  # device faults: report, keep going
            print(json.dumps({"cfg": name, "error": repr(e)[:300]}),
                  flush=True)


if __name__ == "__main__":
    main(sys.argv[1:] or ["A"])
