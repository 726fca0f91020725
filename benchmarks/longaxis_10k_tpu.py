"""Pod-scale star axis on ONE chip: 10k-star cluster HMC (BASELINE
config-5's star count; the chain/star mesh spreads this across devices,
but the single-chip path must already handle the long axis).

chain_chunk bounds the [C, S, T] density intermediates: at 10k stars a
64-chain batched eval materializes ~10 GB of alpha/beta/gamma + VJP
residuals, so chains run in blocks of 8 under lax.map (hmc.HMCConfig.
chain_chunk) — peak memory is one block's, pooling unchanged.

Run from /root/repo: python -u benchmarks/longaxis_10k_tpu.py
Captured output: benchmarks/longaxis_10k_tpu.out
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
    from base_tpu.grids import synthetic
    from base_tpu.model import posterior as post
    from base_tpu.model.stardata import make_ms_stars
    from base_tpu.sim.scatter import scatter_cluster
    from base_tpu.sim.simulate import simulate_cluster

    truth = np.array([9.3, 0.27, -0.5, 10.0, 0.3, 0.5, 0, 0, 0], np.float32)
    grid = synthetic.make_grid(n_eep=64)
    S = 10_000
    cat = simulate_cluster(grid, jnp.asarray(truth), S,
                           jax.random.PRNGKey(0), percent_binary=0.3)
    sc = scatter_cluster(cat.mags, jax.random.PRNGKey(1), limit_mag=24.0)
    stars = make_ms_stars(np.asarray(sc.mags), np.asarray(sc.sigmas),
                          cm_prior=0.99)
    # upsample=2: at 10k stars the posterior is ~10x tighter than the
    # 100-star bench and the isochrone's piecewise-linear node spacing
    # (~1e-3 in parameter scale) becomes comparable to the posterior
    # width; doubling the quadrature nodes halves the kink amplitude.
    upsample = int(os.environ.get("LONGAXIS_UPSAMPLE", "1"))
    model = post.make_single_pop_model(
        grid, stars, prior_mean=truth,
        prior_sigma=np.array([-1, -1, 0.3, 0.2, 0.1, -1, -1, -1, -1],
                             np.float32), n_q=8, upsample=upsample)
    tr = post.default_transform(model)
    fz = post.make_logpost_z_fn(model, tr)
    z0 = tr.inverse(jnp.asarray(truth))
    C = 16
    init = jnp.tile(z0[None, :], (C, 1)) + 0.01 * jax.random.normal(
        jax.random.PRNGKey(2), (C, 9))
    # 10k stars: the posterior is ~10x tighter than the 100-star bench,
    # same geometry; 24 leapfrogs suffice at the dense metric.
    cfg = HMCConfig(n_warmup=128, n_samples=256, l_max=24, n_windows=4,
                    dense_mass=True, free_mask=(1, 1, 1, 1, 1, 0, 0, 0, 0),
                    jitter_mode="step", chain_chunk=8)
    print(json.dumps({"backend": jax.default_backend(), "stars": S,
                      "chains": C, "chain_chunk": cfg.chain_chunk,
                      "upsample": upsample}),
          flush=True)
    runner = make_hmc_chunked_runner(fz, cfg, chunk_draws=32)
    zs, info = runner(init, jax.random.PRNGKey(3), 32)   # warm compile
    jax.block_until_ready(zs)
    t0 = time.perf_counter()
    zs, info = runner(init, jax.random.PRNGKey(4))
    jax.block_until_ready(zs)
    dt = time.perf_counter() - t0
    xs = jax.vmap(jax.vmap(tr.forward))(zs)
    ess = float(diag.ess(xs[:, :, :1])[0])
    evals = (cfg.n_warmup + cfg.n_samples) * cfg.l_max * C
    print(json.dumps({
        "wall_s": round(dt, 2),
        "ess_age": round(ess, 1),
        "ess_age_per_sec": round(ess / dt, 1),
        "age_sd": round(float(np.asarray(xs[..., 0]).std()), 5),
        "accept": round(float(info["accept_prob"]), 3),
        "rhat_age": round(float(diag.split_rhat(xs[:, :, :1])[0]), 4),
        "grad_evals_per_sec": round(evals / dt, 0),
        "star_evals_per_sec": round(evals * S / dt / 1e6, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
