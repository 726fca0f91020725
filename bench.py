"""Headline benchmark: effective samples/sec (cluster age), NGC 188-scale.

Runs the BASELINE.json config-1 scenario (simCluster-style simulated
cluster, ~100 stars, fixed membership) end to end on whatever backend is
present (the driver runs it on one real TPU chip): many HMC chains vmapped
on-chip, ESS computed from the recorded age samples, divided by the
sampling-phase wall time.

No published reference numbers exist (BASELINE.md): `vs_baseline` is the
ratio against the documented working assumption of 5 effective samples/sec
for BASE-9 C++ adaptive MH on a desktop CPU (hours-scale runs for
few-hundred-star clusters per the BASE-9 manual; to be replaced by a
measured number when base-cpp can be built — SURVEY.md §7 step 0).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

ASSUMED_REFERENCE_ESS_PER_SEC = 5.0


def main(smoke: bool = False):
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
    n_stars = 16 if smoke else 100
    n_chains = 4 if smoke else 64
    cfg = HMCConfig(
        n_warmup=8 if smoke else 256,
        n_samples=8 if smoke else 512,
        l_max=4 if smoke else 16,
        n_windows=2 if smoke else 4,
    )

    cat = simulate_cluster(grid, jnp.asarray(truth), n_stars,
                           jax.random.PRNGKey(0), percent_binary=0.3)
    sc = scatter_cluster(cat.mags, jax.random.PRNGKey(1), limit_mag=24.0)
    stars = make_ms_stars(np.asarray(sc.mags), np.asarray(sc.sigmas),
                          cm_prior=0.99)
    model = post.make_single_pop_model(
        grid, stars,
        prior_mean=truth,
        prior_sigma=np.array([-1, -1, 0.3, 0.2, 0.1, -1, -1, -1, -1],
                             np.float32),
        n_q=8,
    )
    tr = post.default_transform(model)
    fz = post.make_logpost_z_fn(model, tr)
    z0 = tr.inverse(jnp.asarray(truth))
    init = jnp.tile(z0[None, :], (n_chains, 1))
    init = init + 0.02 * jax.random.normal(jax.random.PRNGKey(2), init.shape)

    runner = jax.jit(lambda z, k: run_hmc(fz, z, k, cfg))
    # Warm the compile cache, then time a fresh run end to end.
    zs, info = runner(init, jax.random.PRNGKey(3))
    jax.block_until_ready(zs)
    t0 = time.perf_counter()
    zs, info = runner(init, jax.random.PRNGKey(4))
    jax.block_until_ready(zs)
    dt = time.perf_counter() - t0

    xs = jax.vmap(jax.vmap(tr.forward))(zs)
    ess_age = float(diag.ess(xs[:, :, :1])[0])
    value = ess_age / dt
    n_leapfrog_evals = (cfg.n_warmup + cfg.n_samples) * cfg.l_max * n_chains
    result = {
        "metric": "effective samples/sec (cluster age), NGC188-scale, 1 chip",
        "value": round(value, 2),
        "unit": "ESS/s",
        "vs_baseline": round(value / ASSUMED_REFERENCE_ESS_PER_SEC, 2),
        "detail": {
            "ess_age": round(ess_age, 1),
            "wall_s": round(dt, 3),
            "accept": round(float(info["accept_prob"]), 3),
            "logpost_grad_evals_per_sec": round(n_leapfrog_evals / dt, 1),
            "chains": n_chains,
            "stars": n_stars,
            "backend": jax.default_backend(),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main(smoke="--smoke" in sys.argv)
