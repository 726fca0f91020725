"""BASELINE config 5 made real: a CONVERGED 10k-star posterior on one
chip (VERDICT r3 #1 — the r3 artifact demonstrated capacity only,
R-hat(age) 1.24).

Recipe (all pieces already in-tree):
  1. full-rank ADVI (host-chunked executions, tunnel-safe) finds the
     posterior mean and covariance — at 10k stars the posterior is
     ~10x tighter than the 100-star bench and an identity-metric warmup
     random walk never discovers it in any reasonable budget;
  2. chains initialize FROM VI draws (inside the typical set) and the
     HMC warmup warm-starts its dense metric from the VI covariance
     (hmc.warmup inv_mass0), so the windows only refine eps + metric;
  3. host-chunked HMC (chain_chunk bounds the [C, S, T] density
     intermediates; every device execution under the tunnel's ~60 s
     kill), step-jittered fixed-length trajectories.

Run from /root/repo: python -u benchmarks/longaxis_10k_converged.py
Captured output: benchmarks/longaxis_10k_converged.out
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
    S = int(os.environ.get("LONGAXIS_STARS", "10000"))
    # Self-consistent generative draw (the SBC lesson, tests/
    # test_calibration.py): the fitted density integrates EVERY star
    # over the q in [0,1] continuum from the grid's hull bottom, so the
    # simulator must draw q ~ U(0,1) for all stars and the full hull
    # mass range — at 10k stars any sim-vs-model prior mismatch
    # (percent_binary < 1, narrower min_mass) dwarfs the statistical
    # error and shows up as a many-sigma parameter bias.
    cat = simulate_cluster(grid, jnp.asarray(truth), S,
                           jax.random.PRNGKey(0), percent_binary=1.0,
                           min_mass=0.15)
    # limit_mag 24 = survey-realistic photometric noise (faint stars
    # get mag-scale sigmas).  censor=False: the detection cut on the
    # NOISY magnitude is a Malmquist truncation the likelihood does not
    # model, and at 10k stars even its small per-star bias is many
    # statistical sd (scripts/bias_study.py censor isolates it at
    # S=200); the truth-recovery artifact must generate from the model
    # class it fits.
    sc = scatter_cluster(cat.mags, jax.random.PRNGKey(1), limit_mag=24.0,
                         censor=False)
    # sigma_model: the model-discretization noise floor designed to
    # pair with upsample (stardata.make_ms_stars docstring) — at 10k
    # stars the statistical error (~0.003 dex) is BELOW the upsampled
    # piecewise-linear wiggle scale and chains trap in quadrature kinks
    # without it (measured: R-hat ~460 at upsample=4, sigma_model=0).
    sig_model = float(os.environ.get("LONGAXIS_SIGMA_MODEL", "0.01"))
    stars = make_ms_stars(np.asarray(sc.mags), np.asarray(sc.sigmas),
                          cm_prior=0.99, sigma_model=sig_model)
    use_pallas = jax.default_backend() == "tpu"
    # upsample=4 (the production default): at 10k stars the statistical
    # error is below the upsample=1 piecewise-linear quadrature bias
    # (r4 run: age z = -7.9); refining the segment quadrature shrinks
    # the bias ~h^2 at linear cost in T.
    upsample = int(os.environ.get("LONGAXIS_UPSAMPLE", "4"))
    model = post.make_single_pop_model(
        grid, stars, prior_mean=truth,
        prior_sigma=np.array([-1, -1, 0.3, 0.2, 0.1, -1, -1, -1, -1],
                             np.float32), n_q=int(os.environ.get("LONGAXIS_NQ", "8")),
        use_pallas=use_pallas,
        upsample=upsample)
    tr = post.default_transform(model)
    fz = post.make_logpost_z_fn(model, tr)
    z0 = tr.inverse(jnp.asarray(truth))
    free = np.asarray(post.free_mask(model), np.float32)

    print(json.dumps({"backend": jax.default_backend(), "stars": S,
                      "use_pallas": use_pallas, "upsample": upsample}),
          flush=True)

    # ---- stage 1: full-rank VI warm start -------------------------------
    from base_tpu.inference.vi import vi_warm_start

    C = 16
    t0 = time.perf_counter()
    init, inv_mass0, res = vi_warm_start(
        fz, z0, jax.random.PRNGKey(5), C, free_mask=free)
    jax.block_until_ready(init)
    t_vi = time.perf_counter() - t0
    print(json.dumps({
        "vi_wall_s": round(t_vi, 1),
        "vi_elbo": round(float(res.final_elbo), 2),
        "vi_age_mu": round(float(tr.forward(res.mu)[0]), 5),
    }), flush=True)

    # ---- stage 2: HMC from VI draws, VI metric --------------------------
    # Window/chunk sizes are env-tunable: at upsample=4 the per-draw
    # device cost is ~4x, and every single execution (one warmup
    # window, one sampling chunk) must stay under the tunnel's ~60 s
    # kill — more, smaller windows keep the same total adaptation.
    n_win = int(os.environ.get("LONGAXIS_WINDOWS", "6"))
    chunk = int(os.environ.get("LONGAXIS_CHUNK", "24"))
    n_samp = int(os.environ.get("LONGAXIS_SAMPLES", "1024"))
    cfg = HMCConfig(n_warmup=192, n_samples=n_samp, l_max=24,
                    n_windows=n_win,
                    dense_mass=True, free_mask=tuple(free),
                    jitter_mode="step", chain_chunk=8,
                    init_step=0.1)
    runner = make_hmc_chunked_runner(fz, cfg, chunk_draws=chunk)
    zs, info = runner(init, jax.random.PRNGKey(7), chunk,
                      inv_mass0=inv_mass0)           # warm compile
    jax.block_until_ready(zs)
    t1 = time.perf_counter()
    zs, info = runner(init, jax.random.PRNGKey(8), inv_mass0=inv_mass0)
    jax.block_until_ready(zs)
    dt = time.perf_counter() - t1
    xs = jax.vmap(jax.vmap(tr.forward))(zs)
    ess = float(diag.ess(xs[:, :, :1])[0])
    rhat = float(diag.split_rhat(xs[:, :, :1])[0])
    rhat_all = np.asarray(diag.split_rhat(xs[:, :, :5]))
    evals = (cfg.n_warmup + cfg.n_samples) * cfg.l_max * C
    age = np.asarray(xs[..., 0])
    out = {
        "hmc_wall_s": round(dt, 2),
        "total_wall_s": round(dt + t_vi, 2),
        "draws": int(zs.shape[0]) * C,
        "ess_age": round(ess, 1),
        "ess_age_per_sec": round(ess / (dt + t_vi), 2),
        "ess_per_draw": round(ess / (zs.shape[0] * C), 3),
        "accept": round(float(info["accept_prob"]), 3),
        "step_size": round(float(info["step_size"]), 6),
        "rhat_age": round(rhat, 4),
        "rhat_max5": round(float(rhat_all.max()), 4),
        "age_mean": round(float(age.mean()), 5),
        "age_sd": round(float(age.std()), 5),
        "age_truth_z": round(float((age.mean() - truth[0]) / max(age.std(), 1e-9)), 2),
        "age_truth_quantile": round(float((age < truth[0]).mean()), 3),
        "grad_evals_per_sec": round(evals / dt, 0),
        "star_evals_per_sec_M": round(evals * S / dt / 1e6, 1),
    }
    print(json.dumps(out), flush=True)
    ok = rhat < 1.01 and float(rhat_all.max()) < 1.02
    print(json.dumps({"converged": bool(ok)}), flush=True)


if __name__ == "__main__":
    main()
