"""BASELINE acceptance config 2 on the chip: binary mass ratios +
field-star contamination with per-star membership posteriors.

Simulates a cluster (every star drawn from the density's own q
continuum) plus uniform-CMD field interlopers at low membership prior,
fits the single-population posterior with host-chunked HMC through the
fused Pallas kernel, then computes per-star membership posteriors (the
sampleMass path) and checks they separate cluster members from field
stars.

Run from /root/repo: python -u benchmarks/field_membership_tpu.py
Captured output: benchmarks/field_membership_tpu.out
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import time

import numpy as np

TRUTH = np.array([9.3, 0.27, -0.5, 10.0, 0.3, 0.5, 0, 0, 0], np.float32)


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
    from base_tpu.sim.simulate import (field_cmd_box, simulate_cluster,
                                       simulate_field_stars)

    grid = synthetic.make_grid(n_eep=64)
    S, n_field = 200, 40
    cat = simulate_cluster(grid, jnp.asarray(TRUTH), S,
                           jax.random.PRNGKey(0), percent_binary=1.0,
                           min_mass=0.15)
    fmags = simulate_field_stars(jax.random.PRNGKey(1), n_field, cat.mags)
    mags = jnp.concatenate([cat.mags, fmags])
    sc = scatter_cluster(mags, jax.random.PRNGKey(2), limit_mag=26.0,
                          censor=False)
    # Membership priors: members 0.9, interlopers 0.3 (the sampler only
    # sees the priors; truth labels are held out for scoring).
    cm = np.concatenate([np.full(S, 0.9, np.float32),
                         np.full(n_field, 0.3, np.float32)])
    is_field = np.concatenate([np.zeros(S, bool), np.ones(n_field, bool)])
    # Field density normalized over the SAME box the interlopers were
    # drawn from (self-consistent mixture — a 20-mag default box
    # underweights the field component and drags mod/FeH).
    lo, hi = field_cmd_box(cat.mags)
    stars = make_ms_stars(np.asarray(sc.mags), np.asarray(sc.sigmas),
                          cm_prior=cm,
                          field_mag_range=np.asarray(hi - lo))
    use_pallas = jax.default_backend() == "tpu"
    model = post.make_single_pop_model(
        grid, stars, prior_mean=TRUTH,
        prior_sigma=np.array([-1, -1, 0.3, 0.2, 0.1, -1, -1, -1, -1],
                             np.float32),
        n_q=8, use_pallas=use_pallas, upsample=4)
    tr = post.default_transform(model)
    fz = post.make_logpost_z_fn(model, tr)
    z0 = tr.inverse(jnp.asarray(TRUTH))
    free = post.free_mask(model)
    print(json.dumps({"backend": jax.default_backend(), "n_cluster": S,
                      "n_field": n_field, "use_pallas": use_pallas}),
          flush=True)

    C = 32
    init = jnp.tile(z0[None, :], (C, 1)) + 0.01 * jax.random.normal(
        jax.random.PRNGKey(3), (C, 9))
    cfg = HMCConfig(n_warmup=512, n_samples=2048, l_max=48, n_windows=5,
                    dense_mass=True, free_mask=free, jitter_mode="step",
                    chain_chunk=8)
    runner = make_hmc_chunked_runner(fz, cfg, chunk_draws=256)
    zs, info = runner(init, jax.random.PRNGKey(4), 256)  # warm compile
    jax.block_until_ready(zs)
    t0 = time.perf_counter()
    zs, info = runner(init, jax.random.PRNGKey(5))
    jax.block_until_ready(zs)
    dt = time.perf_counter() - t0
    xs = jax.vmap(jax.vmap(tr.forward))(zs)
    rhat = np.asarray(diag.split_rhat(xs))
    essv = np.asarray(diag.ess(xs))
    xnp = np.asarray(xs)
    freem = np.asarray(free) > 0
    post_stats = {}
    for i, n in [(0, "logAge"), (1, "Y"), (2, "FeH"), (3, "mod"),
                 (4, "Av")]:
        post_stats[n] = dict(
            mean=round(float(xnp[..., i].mean()), 4),
            sd=round(float(xnp[..., i].std()), 4),
            truth=round(float(TRUTH[i]), 4),
            z=round(float((xnp[..., i].mean() - TRUTH[i])
                          / max(xnp[..., i].std(), 1e-9)), 2),
            truth_quantile=round(
                float((xnp[..., i] < TRUTH[i]).mean()), 3),
            rhat=round(float(rhat[i]), 4),
        )
    evals = (cfg.n_warmup + cfg.n_samples) * cfg.l_max * C
    print(json.dumps({
        "wall_s": round(dt, 2),
        "accept": round(float(info["accept_prob"]), 3),
        "ess_age_per_sec": round(float(essv[0]) / dt, 1),
        "rhat_max_free": round(float(rhat[freem].max()), 4),
        "grad_evals_per_sec": round(evals / dt, 0),
    }), flush=True)
    print(json.dumps({"posterior": post_stats}), flush=True)

    # Per-star membership posteriors (sampleMass path): field stars
    # must score low, members high.
    from base_tpu.model import conditionals as cond

    draws = jnp.asarray(xnp.reshape(-1, 9)[::64])
    t1 = time.perf_counter()
    out = cond.sample_ms_masses(model, draws, jax.random.PRNGKey(9))
    jax.block_until_ready(out.p_member)
    dt2 = time.perf_counter() - t1
    pm = np.asarray(out.p_member).mean(0)
    # Mann-Whitney AUC: P(member p_member > field p_member)
    order = np.argsort(pm, kind="stable")
    rank = np.empty(len(pm), np.float64)
    rank[order] = np.arange(len(pm))
    n_mem = int((~is_field).sum())
    u = rank[~is_field].sum() - n_mem * (n_mem - 1) / 2.0
    auc = float(u / (n_mem * n_field)) if n_field else 1.0
    print(json.dumps({
        "membership": {
            "draws": int(draws.shape[0]), "wall_s": round(dt2, 2),
            "p_member_cluster_mean": round(float(pm[~is_field].mean()), 3),
            "p_member_field_mean": round(float(pm[is_field].mean()), 3),
            "separation_auc": round(auc, 3),
        }
    }), flush=True)


if __name__ == "__main__":
    main()
