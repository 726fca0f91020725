"""BASELINE acceptance config 3 on the chip: WD-bearing cluster with a
TUNABLE linear IFMR — the sampleWDMass science case (VERDICT r3 #4:
configs 2-4 had no on-chip perf/correctness artifacts).

Workflow: simulate a cluster whose high-mass stars evolved to WDs
(IFMR -> cooling -> atmosphere chain), fit the FULL 9-param posterior
(age, Y, FeH, mod, Av, carbonicity + IFMR intercept/slope all free) with
host-chunked HMC, then draw per-WD (ZAMS mass, WD mass, cooling age)
conditionals — the sampleWDMass equivalent — from the posterior.

Run from /root/repo: python -u benchmarks/wd_ifmr_tpu.py
Captured output: benchmarks/wd_ifmr_tpu.out
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import time

import numpy as np

TRUTH = np.array([9.3, 0.27, -0.5, 10.0, 0.3, 0.5, 0.7, 0.08, 0.0],
                 np.float32)


def main():
    import jax
    import jax.numpy as jnp

    from base_tpu.inference import diagnostics as diag
    from base_tpu.inference.driver import make_hmc_chunked_runner
    from base_tpu.inference.hmc import HMCConfig
    from base_tpu.grids import synthetic
    from base_tpu.grids.wd_atmosphere import synthetic_bergeron
    from base_tpu.grids.wd_cooling import synthetic_wd_cooling
    from base_tpu.model import posterior as post
    from base_tpu.model.stardata import make_ms_stars
    from base_tpu.sim.scatter import scatter_cluster
    from base_tpu.sim.simulate import simulate_cluster

    grid = synthetic.make_grid(n_eep=64)
    wd_cooling = synthetic_wd_cooling()
    wd_atm = synthetic_bergeron()
    S = 512
    # Survey-realistic draw: pb=1.0/min_mass=0.15 (the fully
    # self-consistent variant) deepens the faint-end landscape enough
    # to re-trap chains (R-hat 30 measured); at this config's posterior
    # width the pb=0.3 prior mismatch is sub-sigma, so the honest
    # operating point is the realistic sim.
    cat = simulate_cluster(
        grid, jnp.asarray(TRUTH), S, jax.random.PRNGKey(0),
        percent_binary=0.3, wd_cooling=wd_cooling, wd_atm=wd_atm,
        ifmr_kind="linear", percent_db=0.1,
    )
    sc = scatter_cluster(cat.mags, jax.random.PRNGKey(1), limit_mag=24.0)
    stage = np.asarray(cat.stage)
    is_wd = stage == 3
    mags = np.asarray(sc.mags)
    sigs = np.asarray(sc.sigmas)
    ms = make_ms_stars(mags[~is_wd], sigs[~is_wd], cm_prior=0.99)
    wds = make_ms_stars(mags[is_wd], sigs[is_wd], cm_prior=0.99)
    use_pallas = jax.default_backend() == "tpu"
    # Priors: loose Gaussians on the IFMR coefficients (the reference's
    # tunable-IFMR runs do the same [SURVEY.md C8]).  Carbonicity: the
    # reference does not sample it by default (sampleCarbonicity off);
    # sampling it under a FLAT prior leaves the curved (mod, carb)
    # WD-photometric valley with no scale — the diagnosed r4 slow mode
    # (R-hat ~2 at 49k draws; two SMC replicate sets disagree along the
    # valley).  WDIFMR_CARB_SIGMA sets a physical prior sd; <= 0
    # reproduces the flat-prior stress test.
    carb_sigma = float(os.environ.get("WDIFMR_CARB_SIGMA", "0.1"))
    model = post.make_single_pop_model(
        grid, ms,
        prior_mean=TRUTH,
        prior_sigma=np.array(
            [-1, -1, 0.3, 0.2, 0.1, carb_sigma, 0.3, 0.15, -1],
            np.float32),
        n_q=8, wd_cooling=wd_cooling, wd_atm=wd_atm, wd_stars=wds,
        ifmr_kind="linear", p_db=0.1, use_pallas=use_pallas,
        upsample=4,
    )
    tr = post.default_transform(model)
    fz = post.make_logpost_z_fn(model, tr)
    z0 = tr.inverse(jnp.asarray(TRUTH))
    free = post.free_mask(model)
    if os.environ.get("WDIFMR_PIN_CARB") == "1":
        # Reference-parity default: sampleCarbonicity is OFF in BASE-9
        # — carbonicity held at its configured value.  Pinning removes
        # the flat curved (mod, carb) valley (the diagnosed slow mode)
        # and the remaining 7-param posterior mixes crisply.
        f = np.asarray(free, np.float32).copy()
        f[5] = 0.0
        free = tuple(f)
    print(json.dumps({
        "backend": jax.default_backend(), "n_ms": int((~is_wd).sum()),
        "n_wd": int(is_wd.sum()), "use_pallas": use_pallas,
        "free_mask": list(free),
    }), flush=True)

    # Long warmup + long trajectories: the 8-free-dim posterior couples
    # the IFMR pair to (age, mod, carb) on a curved ridge that a short
    # diag-scale budget under-mixes (CPU diagnosis r4).  r4's
    # segment-exact WD integral (model/wd.py) removed the quadrature
    # wells that previously trapped chains outright.
    C = int(os.environ.get("WDIFMR_CHAINS", "16"))
    init = jnp.tile(z0[None, :], (C, 1)) + 0.01 * jax.random.normal(
        jax.random.PRNGKey(2), (C, 9))
    n_warm = int(os.environ.get("WDIFMR_WARMUP", "768"))
    n_samp = int(os.environ.get("WDIFMR_SAMPLES", "3072"))
    sampler = os.environ.get("WDIFMR_SAMPLER", "hmc")
    if sampler == "smc":
        # Tempered SMC as the production sampler for this posterior
        # (VERDICT r4 #3 option b): the curved (mod, carbonicity)
        # WD-photometric valley mixes slowly under HMC/NUTS (R-hat ~2
        # at 49k draws) because a fixed dense metric cannot straighten
        # curvature; SMC sidesteps mixing entirely — the tempered
        # bridge anneals INTO the valley and replicate agreement
        # replaces R-hat as the convergence criterion.
        from base_tpu.inference.smc import SMCConfig, make_smc_chunked_runner

        n_rep = 4
        n_part = int(os.environ.get("WDIFMR_PARTICLES", "512"))
        sd0 = 0.4

        def log_q0(z):
            return jnp.sum(-0.5 * ((z - z0) / sd0) ** 2
                           - jnp.log(sd0) - 0.9189385)

        def sample_q0(k, n):
            return z0[None, :] + sd0 * jax.random.normal(
                k, (n, z0.shape[0])
            )

        scfg = SMCConfig(n_particles=n_part,
                         n_move=int(os.environ.get("WDIFMR_NMOVE", "3")),
                         max_stages=int(os.environ.get(
                             "WDIFMR_STAGES", "24")),
                         ess_target=float(os.environ.get(
                             "WDIFMR_ESST", "0.6")))
        # Stage-chunked: one device execution per tempering stage (the
        # single-jit replicated run at 512 stars x upsample=4 exceeds
        # the tunnel's ~60 s device-execution cap).
        runner = make_smc_chunked_runner(fz, sample_q0, log_q0, scfg,
                                         n_rep=n_rep)
        t0 = time.perf_counter()
        z_part, info = runner(jax.random.PRNGKey(4))
        dt = time.perf_counter() - t0
        xs_flat = jax.vmap(tr.forward)(z_part)
        # Replicate agreement: per-replicate means vs pooled sd.
        xr = np.asarray(xs_flat).reshape(n_rep, -1, 9)
        rep_means = xr.mean(axis=1)
        pooled_sd = np.asarray(xs_flat).std(axis=0)
        rep_spread = rep_means.std(axis=0) / np.maximum(pooled_sd, 1e-9)
        names = ["logAge", "Y", "FeH", "mod", "Av", "carb", "ifmrI",
                 "ifmrS"]
        xnp = np.asarray(xs_flat)
        post_stats = {}
        for i, n in enumerate(names):
            post_stats[n] = dict(
                mean=round(float(xnp[:, i].mean()), 4),
                sd=round(float(xnp[:, i].std()), 4),
                truth=round(float(TRUTH[i]), 4),
                z=round(float((xnp[:, i].mean() - TRUTH[i])
                              / max(xnp[:, i].std(), 1e-9)), 2),
                rep_spread=round(float(rep_spread[i]), 3),
            )
        se = (f" +- {float(info['log_evidence_se']):.2f}"
              if "log_evidence_se" in info else "")
        print(json.dumps({
            "sampler": "smc", "wall_s": round(dt, 2),
            "n_rep": n_rep, "particles_per_rep": n_part,
            "stages": int(info["n_stages"]),
            "move_accept": round(float(info["accept"]), 3),
            "move_scale": round(float(info["move_scale"]), 4),
            "log_evidence": f"{float(info['log_evidence']):.2f}{se}",
            "rep_spread_max": round(float(rep_spread[:8].max()), 3),
        }), flush=True)
        print(json.dumps({"posterior": post_stats}), flush=True)
        return
    if sampler == "nuts":
        # The curved (mod, carbonicity) WD-photometric valley defeats
        # fixed-length trajectories; NUTS adapts the length per region.
        from base_tpu.inference.nuts import (
            NUTSConfig, make_nuts_chunked_runner,
        )

        ncfg = NUTSConfig(
            n_warmup=n_warm, n_samples=n_samp,
            max_depth=int(os.environ.get("WDIFMR_DEPTH", "9")),
            target_accept=float(os.environ.get("WDIFMR_TARGET", "0.85")),
            n_windows=6, dense_mass=True, free_mask=free)
        runner = make_nuts_chunked_runner(fz, ncfg, chunk_draws=32)
        lmax_eq = 2 ** ncfg.max_depth  # for the evals estimate only
    else:
        cfg = HMCConfig(n_warmup=n_warm, n_samples=n_samp,
                        l_max=int(os.environ.get("WDIFMR_LMAX", "48")),
                        target_accept=float(
                            os.environ.get("WDIFMR_TARGET", "0.8")),
                        n_windows=6,
                        dense_mass=True, free_mask=free,
                        jitter_mode="step")
        runner = make_hmc_chunked_runner(fz, cfg, chunk_draws=128)
        lmax_eq = cfg.l_max
    zs, info = runner(init, jax.random.PRNGKey(3), 256)  # warm compile
    jax.block_until_ready(zs)
    t0 = time.perf_counter()
    zs, info = runner(init, jax.random.PRNGKey(4))
    jax.block_until_ready(zs)
    dt = time.perf_counter() - t0
    if sampler == "nuts":
        print(json.dumps({
            "sampler": "nuts",
            "mean_leapfrogs": round(float(info["mean_leapfrogs"]), 1),
        }), flush=True)
    xs = jax.vmap(jax.vmap(tr.forward))(zs)
    names = ["logAge", "Y", "FeH", "mod", "Av", "carb", "ifmrI", "ifmrS"]
    idx = [0, 1, 2, 3, 4, 5, 6, 7]
    rhat = np.asarray(diag.split_rhat(xs))
    essv = np.asarray(diag.ess(xs))
    xnp = np.asarray(xs)
    post_stats = {}
    for n, i in zip(names, idx):
        post_stats[n] = dict(
            mean=round(float(xnp[..., i].mean()), 4),
            sd=round(float(xnp[..., i].std()), 4),
            truth=round(float(TRUTH[i]), 4),
            z=round(float((xnp[..., i].mean() - TRUTH[i])
                          / max(xnp[..., i].std(), 1e-9)), 2),
            rhat=round(float(rhat[i]), 4),
        )
    evals = (n_warm + n_samp) * lmax_eq * C
    print(json.dumps({
        "wall_s": round(dt, 2),
        "accept": round(float(info["accept_prob"]), 3),
        "ess_age": round(float(essv[0]), 1),
        "ess_age_per_sec": round(float(essv[0]) / dt, 1),
        "ess_ifmr_slope_per_sec": round(float(essv[7]) / dt, 1),
        "rhat_max_free": round(float(rhat[np.asarray(free) > 0].max()), 4),
        "grad_evals_per_sec": round(evals / dt, 0),
    }), flush=True)
    print(json.dumps({"posterior": post_stats}), flush=True)

    # sampleWDMass equivalent: per-WD conditionals from posterior draws.
    from base_tpu.model import conditionals as cond

    draws = jnp.asarray(np.asarray(xs).reshape(-1, 9)[::64])
    t1 = time.perf_counter()
    out = cond.sample_wd_masses(model, draws, jax.random.PRNGKey(9))
    jax.block_until_ready(out.zams_mass)
    dt2 = time.perf_counter() - t1
    zm = np.asarray(out.zams_mass)
    wm = np.asarray(out.wd_mass)
    truth_zams = np.asarray(cat.mass1)[is_wd]
    err = zm.mean(0) - truth_zams
    cover = np.abs(err) < 2.5 * zm.std(0) + 0.05
    print(json.dumps({
        "wd_conditionals": {
            "draws": int(draws.shape[0]), "wall_s": round(dt2, 2),
            "zams_mass_rmse": round(float(np.sqrt((err ** 2).mean())), 4),
            "zams_mass_cover_2p5sd": round(float(cover.mean()), 3),
            "wd_mass_mean": round(float(wm.mean()), 4),
        }
    }), flush=True)


if __name__ == "__main__":
    main()
