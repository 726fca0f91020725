"""BASELINE acceptance config 4 on the chip: two-population
helium-spread cluster (NGC 2808-style, multiPopMcmc) — recover Y_A,
Y_B and the mixing fraction lambda with the ordered-transform HMC
sampler at production scale (VERDICT r3 #4).

Data: two sub-populations simulated at the same (age, FeH, mod, Av)
but different helium abundances, mixed lambda : (1 - lambda); the
12-param posterior marginalizes the per-star population indicator
(model/multipop.py).  The sampler runs through the fused Pallas
marginal kernel on TPU (use_pallas, both populations' tables).

Run from /root/repo: python -u benchmarks/multipop_tpu.py
Captured output: benchmarks/multipop_tpu.out
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import time

import numpy as np

BASE = np.array([9.3, 0.27, -0.5, 10.0, 0.3, 0.5, 0, 0, 0], np.float32)
Y_A, Y_B, LAM = 0.25, 0.30, 0.6


def main():
    import jax
    import jax.numpy as jnp

    from base_tpu.inference import diagnostics as diag
    from base_tpu.inference.driver import make_hmc_chunked_runner
    from base_tpu.inference.hmc import HMCConfig
    from base_tpu.grids import synthetic
    from base_tpu.model import multipop as mp
    from base_tpu.model.stardata import make_ms_stars
    from base_tpu.sim.scatter import scatter_cluster
    from base_tpu.sim.simulate import simulate_cluster

    grid = synthetic.make_grid(n_eep=64)
    S = 400
    n_a = int(round(S * LAM))
    truth_a = BASE.copy(); truth_a[1] = Y_A
    truth_b = BASE.copy(); truth_b[1] = Y_B
    cat_a = simulate_cluster(grid, jnp.asarray(truth_a), n_a,
                             jax.random.PRNGKey(0), percent_binary=1.0,
                             min_mass=0.15)
    cat_b = simulate_cluster(grid, jnp.asarray(truth_b), S - n_a,
                             jax.random.PRNGKey(1), percent_binary=1.0,
                             min_mass=0.15)
    mags = jnp.concatenate([cat_a.mags, cat_b.mags])
    sc = scatter_cluster(mags, jax.random.PRNGKey(2), limit_mag=24.0,
                         censor=False)
    stars = make_ms_stars(np.asarray(sc.mags), np.asarray(sc.sigmas),
                          cm_prior=0.99)
    use_pallas = jax.default_backend() == "tpu"
    prior_mean = np.concatenate(
        [BASE, np.asarray([Y_A, Y_B, 0.5], np.float32)])
    prior_sigma = np.concatenate(
        [np.array([-1, -1, 0.3, 0.2, 0.1, -1, -1, -1, -1], np.float32),
         np.asarray([-1, -1, -1], np.float32)])
    model = mp.make_multipop_model(
        grid, stars, prior_mean, prior_sigma, n_q=8,
        use_pallas=use_pallas, upsample=4,
    )
    tr = mp.ordered_transform(model)
    fz = mp.make_logpost_z_fn(model, tr)
    start = np.concatenate(
        [BASE, np.asarray([0.26, 0.29, 0.5], np.float32)])
    z0 = tr.inverse(jnp.asarray(start))
    free = mp.free_mask(model)
    print(json.dumps({
        "backend": jax.default_backend(), "stars": S,
        "truth": {"Y_A": Y_A, "Y_B": Y_B, "lambda": LAM},
        "use_pallas": use_pallas,
    }), flush=True)

    # Full-rank-VI warm start (same recipe as the WD/IFMR and 10k
    # artifacts: VI draws -> chain inits, VI covariance -> metric).
    from base_tpu.inference.vi import vi_warm_start

    C = 32
    t_vi0 = time.perf_counter()
    init, inv_mass0, vres = vi_warm_start(
        fz, z0, jax.random.PRNGKey(3), C, free_mask=free)
    jax.block_until_ready(init)
    t_vi = time.perf_counter() - t_vi0
    print(json.dumps({"vi_wall_s": round(t_vi, 1),
                      "vi_elbo": round(float(vres.final_elbo), 2)}),
          flush=True)
    cfg = HMCConfig(n_warmup=256, n_samples=1024, l_max=48, n_windows=4,
                    dense_mass=True, free_mask=free, jitter_mode="step",
                    init_step=0.1)
    runner = make_hmc_chunked_runner(fz, cfg, chunk_draws=64)
    zs, info = runner(init, jax.random.PRNGKey(4), 64,
                      inv_mass0=inv_mass0)               # warm compile
    jax.block_until_ready(zs)
    t0 = time.perf_counter()
    zs, info = runner(init, jax.random.PRNGKey(5), inv_mass0=inv_mass0)
    jax.block_until_ready(zs)
    dt = time.perf_counter() - t0
    xs = jax.vmap(jax.vmap(tr.forward))(zs)
    rhat = np.asarray(diag.split_rhat(xs))
    essv = np.asarray(diag.ess(xs))
    xnp = np.asarray(xs)
    names = {0: "logAge", 2: "FeH", 3: "mod", 4: "Av",
             mp.MP_YYA: "Y_A", mp.MP_YYB: "Y_B", mp.MP_LAMBDA: "lambda"}
    truth12 = np.concatenate(
        [BASE, np.asarray([Y_A, Y_B, LAM], np.float32)])
    post_stats = {}
    for i, n in names.items():
        post_stats[n] = dict(
            mean=round(float(xnp[..., i].mean()), 4),
            sd=round(float(xnp[..., i].std()), 4),
            truth=round(float(truth12[i]), 4),
            z=round(float((xnp[..., i].mean() - truth12[i])
                          / max(xnp[..., i].std(), 1e-9)), 2),
            truth_quantile=round(
                float((xnp[..., i] < truth12[i]).mean()), 3),
            rhat=round(float(rhat[i]), 4),
        )
    evals = (cfg.n_warmup + cfg.n_samples) * cfg.l_max * C * 2  # 2 isochrones
    freem = np.asarray(free) > 0
    print(json.dumps({
        "wall_s": round(dt, 2),
        "accept": round(float(info["accept_prob"]), 3),
        "ess_age_per_sec": round(float(essv[0]) / dt, 1),
        "ess_lambda_per_sec": round(float(essv[mp.MP_LAMBDA]) / dt, 1),
        "rhat_max_free": round(float(rhat[freem].max()), 4),
        "marginal_evals_per_sec": round(evals / dt, 0),
    }), flush=True)
    print(json.dumps({"posterior": post_stats}), flush=True)


if __name__ == "__main__":
    main()
