"""NUTS saturation sweep on the chip (VERDICT r4 #6): ESS/s vs chain
count at >= 128 chains, now reachable via NUTSConfig.chain_chunk (chain
blocks of 64 run sequentially inside one execution, so the tunneled
chip never sees the >= 128-concurrent-chain fault of
scripts/probe_bigbatch.py) plus the host-chunked runner (one execution
per warmup window / sampling chunk, under the ~60 s kill).

Workload = the bench config-1 scenario (100 stars, dense metric, fused
Pallas kernel), so the resulting row sits directly next to BASELINE.md's
HMC saturation table: "HMC for throughput, NUTS for robustness"
(inference/nuts.py:16-19) backed by a current measurement.

Each point runs in its own subprocess (a wedged TPU client poisons all
later in-process points).

Run on the real chip:  python -u benchmarks/nuts_sweep_tpu.py
Captured output: benchmarks/nuts_sweep_tpu.out
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_point(n_chains: int, max_depth: int = 6):
    import jax
    import jax.numpy as jnp

    from base_tpu.inference import diagnostics as diag
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
                             np.float32),
        n_q=8, use_pallas=jax.default_backend() == "tpu",
    )
    tr = post.default_transform(model)
    fz = post.make_logpost_z_fn(model, tr)
    z0 = tr.inverse(jnp.asarray(truth))
    init = jnp.tile(z0[None, :], (n_chains, 1))
    init = init + 0.02 * jax.random.normal(jax.random.PRNGKey(2), init.shape)

    cfg = NUTSConfig(
        n_warmup=256, n_samples=512, max_depth=max_depth,
        target_accept=0.8, n_windows=4, dense_mass=True,
        free_mask=(1, 1, 1, 1, 1, 0, 0, 0, 0),
        chain_chunk=64 if n_chains > 64 else None,
    )
    runner = make_nuts_chunked_runner(fz, cfg, chunk_draws=64)
    zs, info = runner(init, jax.random.PRNGKey(3), 64)   # warm compile
    jax.block_until_ready(zs)
    t0 = time.perf_counter()
    zs, info = runner(init, jax.random.PRNGKey(4))
    jax.block_until_ready(zs)
    dt = time.perf_counter() - t0
    xs = jax.vmap(jax.vmap(tr.forward))(zs)
    ess_age = float(diag.ess(xs[:, :, :1])[0])
    rhat_age = float(diag.split_rhat(xs[:, :, :1])[0])
    mlf = float(info.get("mean_leapfrogs", 2.0 ** max_depth))
    n_grad = int((cfg.n_warmup + cfg.n_samples) * mlf * n_chains)
    return dict(
        chains=n_chains, max_depth=max_depth,
        ess_age=round(ess_age, 1), ess_per_sec=round(ess_age / dt, 2),
        wall_s=round(dt, 3), mean_leapfrogs=round(mlf, 1),
        grad_evals_per_sec=round(n_grad / dt, 0),
        rhat_age=round(rhat_age, 4),
        accept=round(float(info["accept_prob"]), 3),
    )


def main():
    points = []
    here = os.path.abspath(__file__)
    for c in [64, 128, 256, 512]:
        argv = [sys.executable, "-u", here, "--point", str(c)]
        try:
            p = subprocess.run(
                argv, capture_output=True, text=True, timeout=2400,
                cwd=os.path.dirname(os.path.dirname(here)),
            )
            line = [l for l in p.stdout.splitlines() if l.startswith("{")]
            if p.returncode == 0 and line:
                r = json.loads(line[-1])
            else:
                r = dict(chains=c, error=(p.stderr.strip().splitlines() or
                                          ["no output"])[-1][:300])
        except subprocess.TimeoutExpired:
            r = dict(chains=c, error="timeout 2400s")
        points.append(r)
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    if "--point" in sys.argv:
        i = sys.argv.index("--point")
        print(json.dumps(run_point(int(sys.argv[i + 1]))), flush=True)
    else:
        main()
