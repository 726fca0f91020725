"""Measured baseline proxy: reference-parity adaptive MH, 1 chain, CPU.

VERDICT r1 #8 / SURVEY.md §7 step 0: base-cpp itself cannot be built
offline (the reference mount is a redirect README), so `vs_baseline`
must not stay a hard-coded constant.  This harness runs THIS repo's
reference-parity 3-stage adaptive MH [upstream: singlePopMcmc/MpiMcmcApplication.cpp
run() loop] single-chain on the CPU backend at the BASELINE.json
config-1 scenario (~100 stars, binaries, fixed membership) and records
effective-samples/sec for cluster age — a *proxy floor* for the C++
implementation (same algorithm, same arithmetic work per proposal; the
C++ would differ only by constant factors in its interpolation loop).

Writes BASELINE_MEASURED.json; bench.py divides by this when present,
falling back to the documented 5 ESS/s assumption otherwise.  Label is
carried through so BENCH JSON always says which floor was used.

Run:  python -u bench_baseline.py            (full, ~minutes on CPU)
      python -u bench_baseline.py --smoke    (tiny shapes, CI)
"""
from __future__ import annotations

import json
import sys
import time


def main(smoke: bool = False):
    import jax

    # CLAUDE.md: the axon sitecustomize pins the TPU backend; env alone
    # is not honored — force CPU before any other jax use.
    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from base_tpu.inference import diagnostics as diag
    from base_tpu.inference import mh
    from base_tpu.grids import synthetic
    from base_tpu.model import posterior as post
    from base_tpu.model.stardata import make_ms_stars
    from base_tpu.sim.scatter import scatter_cluster
    from base_tpu.sim.simulate import simulate_cluster

    truth = np.array([9.3, 0.27, -0.5, 10.0, 0.3, 0.5, 0, 0, 0], np.float32)
    grid = synthetic.make_grid(n_eep=64)
    n_stars = 16 if smoke else 100
    cfg = mh.MHConfig(
        n_stage1=50 if smoke else 1000,
        n_stage2=50 if smoke else 1000,
        n_main=100 if smoke else 5000,
    )

    cat = simulate_cluster(grid, jnp.asarray(truth), n_stars,
                           jax.random.PRNGKey(0), percent_binary=0.3)
    sc = scatter_cluster(cat.mags, jax.random.PRNGKey(1), limit_mag=24.0)
    stars = make_ms_stars(np.asarray(sc.mags), np.asarray(sc.sigmas),
                          cm_prior=0.99)
    model = post.make_single_pop_model(
        grid, stars, prior_mean=truth,
        prior_sigma=np.array([-1, -1, 0.3, 0.2, 0.1, -1, -1, -1, -1],
                             np.float32),
        n_q=8,
    )
    logpost = post.make_logpost_fn(model)
    step_init = np.array(
        [0.02, 0.002, 0.005, 0.005, 0.002, 0, 0, 0, 0], np.float32)

    runner = jax.jit(
        lambda p0, k: mh.run_adaptive_mh(
            logpost, p0, k, jnp.asarray(step_init), cfg))
    p0 = jnp.asarray(truth)
    samples, info = runner(p0, jax.random.PRNGKey(5))   # compile
    jax.block_until_ready(samples)
    t0 = time.perf_counter()
    samples, info = runner(p0, jax.random.PRNGKey(6))
    jax.block_until_ready(samples)
    dt = time.perf_counter() - t0

    ess_age = float(diag.ess(samples[:, None, :1])[0])
    result = {
        "label": "measured proxy: 1-chain adaptive MH on CPU "
                 "(reference-parity algorithm; base-cpp unbuildable offline)",
        "ess_per_sec": round(ess_age / dt, 3),
        "ess_age": round(ess_age, 1),
        "wall_s": round(dt, 3),
        "n_main": cfg.n_main,
        "stars": n_stars,
        "accept": round(float(info["accept_rate"]), 3),
        "smoke": smoke,
    }
    print(json.dumps(result))
    if not smoke:
        with open("BASELINE_MEASURED.json", "w") as f:
            json.dump(result, f, indent=1)


if __name__ == "__main__":
    main(smoke="--smoke" in sys.argv)
