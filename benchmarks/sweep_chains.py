"""Single-chip saturation sweep: ESS/s and grad-evals/s vs chain count.

VERDICT r1 #1: the r1 bench ran 64 chains and left the chip ~99% idle.
This sweep measures the BASELINE.json config-1 workload (100 stars,
Girardi-shaped synthetic grid, binaries) over chain counts, with the jnp
and the fused-Pallas likelihood, and reports the knee.  bench.py pins
its chain count from this sweep's result (documented in BASELINE.md).

Each point runs in its OWN subprocess: a TPU client that hits a device
error (or a tunnel timeout during a long compile) is wedged for the rest
of the process, so in-process sweeps report phantom failures for every
subsequent point.

Run on the real chip:  python -u benchmarks/sweep_chains.py > sweep.log
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_point(n_chains: int, use_pallas: bool, n_stars: int = 100,
              n_warmup: int = 256, n_samples: int = 512, l_max: int = 16):
    import jax
    import jax.numpy as jnp

    from base_tpu.inference import diagnostics as diag
    from base_tpu.inference.hmc import HMCConfig, run_hmc
    from base_tpu.grids import synthetic
    from base_tpu.model import posterior as post
    from base_tpu.model.stardata import make_ms_stars
    from base_tpu.sim.scatter import scatter_cluster
    from base_tpu.sim.simulate import simulate_cluster

    truth = np.array([9.3, 0.27, -0.5, 10.0, 0.3, 0.5, 0, 0, 0], np.float32)
    grid = synthetic.make_grid(n_eep=64)
    cfg = HMCConfig(n_warmup=n_warmup, n_samples=n_samples, l_max=l_max,
                    n_windows=4)

    cat = simulate_cluster(grid, jnp.asarray(truth), n_stars,
                           jax.random.PRNGKey(0), percent_binary=0.3)
    sc = scatter_cluster(cat.mags, jax.random.PRNGKey(1), limit_mag=24.0)
    stars = make_ms_stars(np.asarray(sc.mags), np.asarray(sc.sigmas),
                          cm_prior=0.99)
    model = post.make_single_pop_model(
        grid, stars, prior_mean=truth,
        prior_sigma=np.array([-1, -1, 0.3, 0.2, 0.1, -1, -1, -1, -1],
                             np.float32),
        n_q=8, use_pallas=use_pallas,
    )
    tr = post.default_transform(model)
    fz = post.make_logpost_z_fn(model, tr)
    z0 = tr.inverse(jnp.asarray(truth))
    init = jnp.tile(z0[None, :], (n_chains, 1))
    init = init + 0.02 * jax.random.normal(jax.random.PRNGKey(2), init.shape)

    runner = jax.jit(lambda z, k: run_hmc(fz, z, k, cfg))
    t_c0 = time.perf_counter()
    zs, info = runner(init, jax.random.PRNGKey(3))
    jax.block_until_ready(zs)
    compile_s = time.perf_counter() - t_c0
    t0 = time.perf_counter()
    zs, info = runner(init, jax.random.PRNGKey(4))
    jax.block_until_ready(zs)
    dt = time.perf_counter() - t0

    xs = jax.vmap(jax.vmap(tr.forward))(zs)
    ess_age = float(diag.ess(xs[:, :, :1])[0])
    n_grad = (n_warmup + n_samples) * l_max * n_chains
    # FLOP estimate for the dominant alpha/beta/gamma contraction +
    # exp/erf tail: ~8 flops per (star, segment, band) + ~50 per
    # (star, segment) transcendental-equivalent, fwd + ~2x for VJP.
    T = (64 - 1) * 8
    flops_per_eval = n_stars * T * (8 * 8 + 50) * 3.0
    return dict(
        chains=n_chains, pallas=use_pallas, ess_age=round(ess_age, 1),
        ess_per_sec=round(ess_age / dt, 2), wall_s=round(dt, 3),
        compile_s=round(compile_s, 1),
        grad_evals_per_sec=round(n_grad / dt, 0),
        est_tflops=round(n_grad * flops_per_eval / dt / 1e12, 3),
        accept=round(float(info["accept_prob"]), 3),
    )


def main():
    points = []
    chain_counts = [64, 128, 256, 512, 1024, 2048]
    if "--quick" in sys.argv:
        chain_counts = [64, 256]
    here = os.path.abspath(__file__)
    for use_pallas in (False, True):
        for c in chain_counts:
            argv = [sys.executable, "-u", here, "--point", str(c)]
            if use_pallas:
                argv.append("--pallas")
            try:
                p = subprocess.run(
                    argv, capture_output=True, text=True, timeout=2400,
                    cwd=os.path.dirname(os.path.dirname(here)),
                )
                line = [l for l in p.stdout.splitlines()
                        if l.startswith("{")]
                if p.returncode == 0 and line:
                    r = json.loads(line[-1])
                else:
                    r = dict(chains=c, pallas=use_pallas,
                             error=(p.stderr.strip().splitlines() or
                                    ["no output"])[-1][:300])
            except subprocess.TimeoutExpired:
                r = dict(chains=c, pallas=use_pallas, error="timeout 2400s")
            points.append(r)
            print(json.dumps(r), flush=True)
    out = os.path.join(os.path.dirname(here), "sweep_chains_result.json")
    with open(out, "w") as f:
        json.dump(points, f, indent=1)


if __name__ == "__main__":
    if "--point" in sys.argv:
        i = sys.argv.index("--point")
        c = int(sys.argv[i + 1])
        print(json.dumps(run_point(c, "--pallas" in sys.argv)), flush=True)
    else:
        main()
