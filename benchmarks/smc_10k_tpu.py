"""BASELINE config 5's SMC leg on the chip (VERDICT r4 #4): tempered
SMC at 10k stars, stage-chunked for the tunnel, autotuned moves,
replicated evidence +- SE.

Recipe (the pod recipe's sampler-agnostic shape):
  1. full-rank ADVI finds the posterior region (same warm start the
     converged HMC artifact uses — longaxis_10k_converged.py);
  2. the SMC reference distribution q0 is the VI Gaussian INFLATED 2x
     on the free dims: the tempered bridge then only has to anneal away
     the VI approximation error, so the adaptive beta ladder stays
     short even though the 10k-star posterior is ~30x tighter than any
     generic q0.  q0 is exactly normalized, so the log-evidence
     estimate is valid (it is log Z of the posterior against the same
     prior the HMC leg uses);
  3. stage-chunked replicated SMC (inference.smc.make_smc_chunked_
     runner): ONE device execution per tempering stage keeps every
     execution far under the tunnel's ~60 s kill; n_rep independent
     replicates give the evidence repeat-run SE and a replicate-
     agreement convergence check (rep_spread = spread of per-replicate
     means / pooled posterior sd).

Run from /root/repo: python -u benchmarks/smc_10k_tpu.py
Captured output: benchmarks/smc_10k_tpu.out
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

    from base_tpu.grids import synthetic
    from base_tpu.inference.smc import SMCConfig, make_smc_chunked_runner
    from base_tpu.inference.vi import (VIConfig, posterior_covariance,
                                       run_vi_chunked)
    from base_tpu.model import posterior as post
    from base_tpu.model.stardata import make_ms_stars
    from base_tpu.sim.scatter import scatter_cluster
    from base_tpu.sim.simulate import simulate_cluster

    grid = synthetic.make_grid(n_eep=64)
    S = int(os.environ.get("SMC10K_STARS", "10000"))
    cat = simulate_cluster(grid, jnp.asarray(TRUTH), S,
                           jax.random.PRNGKey(0), percent_binary=1.0,
                           min_mass=0.15)
    sc = scatter_cluster(cat.mags, jax.random.PRNGKey(1), limit_mag=24.0,
                         censor=False)
    stars = make_ms_stars(np.asarray(sc.mags), np.asarray(sc.sigmas),
                          cm_prior=0.99)
    use_pallas = jax.default_backend() == "tpu"
    upsample = int(os.environ.get("SMC10K_UPSAMPLE", "4"))
    model = post.make_single_pop_model(
        grid, stars, prior_mean=TRUTH,
        prior_sigma=np.array([-1, -1, 0.3, 0.2, 0.1, -1, -1, -1, -1],
                             np.float32),
        n_q=8, use_pallas=use_pallas, upsample=upsample)
    tr = post.default_transform(model)
    fz = post.make_logpost_z_fn(model, tr)
    z0 = tr.inverse(jnp.asarray(TRUTH))
    free = np.asarray(post.free_mask(model), np.float32)
    print(json.dumps({"backend": jax.default_backend(), "stars": S,
                      "use_pallas": use_pallas, "upsample": upsample}),
          flush=True)

    # ---- stage 1: VI locates the posterior ------------------------------
    t0 = time.perf_counter()
    vcfg = VIConfig(n_steps=600, n_mc=8, full_rank=True,
                    learning_rate=2e-2, init_log_sd=-4.0)
    res = run_vi_chunked(fz, z0, jax.random.PRNGKey(5), vcfg,
                         chunk_steps=100)
    jax.block_until_ready(res.mu)
    t_vi = time.perf_counter() - t0
    print(json.dumps({"vi_wall_s": round(t_vi, 1),
                      "vi_elbo": round(float(res.final_elbo), 2)}),
          flush=True)

    # ---- stage 2: q0 = VI Gaussian, inflated ----------------------------
    mu_np = np.asarray(res.mu, np.float64)
    cov_np = np.asarray(posterior_covariance(res), np.float64)
    inflate = 2.0
    freem = free > 0
    # Free block: VI covariance x inflate^2.  Pinned dims: sd 0.05,
    # uncorrelated (the density is flat there; they just ride along).
    cov_q = np.eye(9) * 0.05**2
    cov_q[np.ix_(freem, freem)] = (
        cov_np[np.ix_(freem, freem)] * inflate**2)
    mu_np = np.where(freem, mu_np, np.asarray(z0, np.float64))
    L_np = np.linalg.cholesky(cov_q)
    mu_q = jnp.asarray(mu_np, jnp.float32)
    L_q = jnp.asarray(L_np, jnp.float32)
    L_inv = jnp.asarray(np.linalg.inv(L_np), jnp.float32)
    log_det = float(np.sum(np.log(np.diag(L_np))))

    def log_q0(z):
        e = L_inv @ (z - mu_q)
        return (-0.5 * jnp.sum(e * e) - log_det
                - 0.5 * 9 * jnp.log(2.0 * jnp.pi))

    def sample_q0(k, n):
        eps = jax.random.normal(k, (n, 9))
        return mu_q[None, :] + eps @ L_q.T

    n_rep = int(os.environ.get("SMC10K_REPS", "4"))
    n_part = int(os.environ.get("SMC10K_PARTICLES", "1024"))
    scfg = SMCConfig(n_particles=n_part, max_stages=30, n_move=3)
    runner = make_smc_chunked_runner(fz, sample_q0, log_q0, scfg,
                                     n_rep=n_rep)
    t1 = time.perf_counter()
    z_part, info = runner(jax.random.PRNGKey(7))
    dt = time.perf_counter() - t1
    xs = np.asarray(jax.vmap(tr.forward)(z_part))
    xr = xs.reshape(n_rep, -1, 9)
    rep_means = xr.mean(axis=1)
    pooled_sd = xs.std(axis=0)
    rep_spread = rep_means.std(axis=0) / np.maximum(pooled_sd, 1e-9)
    names = ["logAge", "Y", "FeH", "mod", "Av"]
    post_stats = {}
    for i, n in enumerate(names):
        post_stats[n] = dict(
            mean=round(float(xs[:, i].mean()), 5),
            sd=round(float(xs[:, i].std()), 5),
            truth=round(float(TRUTH[i]), 4),
            z=round(float((xs[:, i].mean() - TRUTH[i])
                          / max(xs[:, i].std(), 1e-9)), 2),
            truth_quantile=round(float((xs[:, i] < TRUTH[i]).mean()), 3),
            rep_spread=round(float(rep_spread[i]), 3),
        )
    print(json.dumps({
        "smc_wall_s": round(dt, 2),
        "total_wall_s": round(dt + t_vi, 2),
        "n_rep": n_rep, "particles_per_rep": n_part,
        "stages": int(info["n_stages"]),
        "move_accept": round(float(info["accept"]), 3),
        "move_scale": round(float(info["move_scale"]), 4),
        "log_evidence": round(float(info["log_evidence"]), 2),
        "log_evidence_se": round(float(info["log_evidence_se"]), 3),
        "rep_spread_max_free": round(float(rep_spread[freem > 0].max()), 3),
        "particle_evals_per_sec": round(
            n_rep * n_part * (1 + scfg.n_move * int(info["n_stages"])) / dt,
            0),
    }), flush=True)
    print(json.dumps({"posterior": post_stats}), flush=True)


if __name__ == "__main__":
    main()
