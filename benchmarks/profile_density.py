"""Decompose the HMC leapfrog-step cost on the real chip.

The pallas parity artifact shows the marginal-likelihood core at ~2 ms
(fwd+vjp, C=64) yet the r1 sweep measured ~37 ms per batched leapfrog
step — this script times each stage of the density under vmap over
chains to find the missing 35 ms:

  table  : derive_isochrone + build_segment_table      (per proposal)
  marg   : ms_total_loglik on a precomputed table      (per proposal)
  full   : the complete logpost_z                      (per proposal)
  step   : one hmc_transition (l_max leapfrogs + MH)   (per transition)

Run:  python -u benchmarks/profile_density.py > profile_density.out 2>&1
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(fn, *args, n=20):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3  # ms


def main(n_chains: int = 64, n_stars: int = 100, use_pallas: bool = False):
    import jax
    import jax.numpy as jnp

    from base_tpu.grids import synthetic
    from base_tpu.grids.isochrone import derive_isochrone
    from base_tpu.inference import hmc as hmc_mod
    from base_tpu.model import likelihood as lk
    from base_tpu.model import posterior as post
    from base_tpu.model.stardata import make_ms_stars
    from base_tpu.sim.scatter import scatter_cluster
    from base_tpu.sim.simulate import simulate_cluster
    from base_tpu import constants as C

    truth = np.array([9.3, 0.27, -0.5, 10.0, 0.3, 0.5, 0, 0, 0], np.float32)
    grid = synthetic.make_grid(n_eep=64)
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
    zb = jnp.tile(z0[None, :], (n_chains, 1))
    zb = zb + 0.02 * jax.random.normal(jax.random.PRNGKey(2), zb.shape)

    def table_of(params):
        iso = derive_isochrone(model.grid, params[C.Param.FEH],
                               params[C.Param.YYY], params[C.Param.AGE])
        t = lk.build_segment_table(
            iso, model.q_grid, params[C.Param.MOD], params[C.Param.ABS],
            model.abs_coefs, binaries=model.binaries,
            uniform_q=model.uniform_q,
        )
        return t

    def table_scalar(z):
        x = tr.forward(z)
        t = table_of(x)
        return jnp.sum(t.lo) + jnp.sum(t.hi) + jnp.sum(t.logw)

    # fixed table for the marg-only stage
    t0 = table_of(jnp.asarray(truth))
    t0 = jax.tree_util.tree_map(jnp.asarray, t0)

    def marg_only(lo, hi, logw):
        tt = lk.SegmentTable(lo=lo, hi=hi, logw=logw, mask=t0.mask)
        return lk.ms_total_loglik(model.stars, tt, model.use_pallas)

    lob = jnp.tile(t0.lo[None], (n_chains, 1, 1))
    hib = jnp.tile(t0.hi[None], (n_chains, 1, 1))
    lwb = jnp.tile(t0.logw[None], (n_chains, 1))

    res = {"chains": n_chains, "stars": n_stars, "pallas": use_pallas,
           "backend": jax.default_backend()}

    f_full = jax.jit(jax.vmap(fz))
    res["full_fwd_ms"] = round(bench(f_full, zb), 3)
    g_full = jax.jit(jax.vmap(jax.value_and_grad(fz)))
    res["full_vjp_ms"] = round(bench(g_full, zb), 3)

    f_tab = jax.jit(jax.vmap(table_scalar))
    res["table_fwd_ms"] = round(bench(f_tab, zb), 3)
    g_tab = jax.jit(jax.vmap(jax.value_and_grad(table_scalar)))
    res["table_vjp_ms"] = round(bench(g_tab, zb), 3)

    f_marg = jax.jit(jax.vmap(marg_only))
    res["marg_fwd_ms"] = round(bench(f_marg, lob, hib, lwb), 3)
    g_marg = jax.jit(jax.vmap(jax.value_and_grad(marg_only)))
    res["marg_vjp_ms"] = round(bench(g_marg, lob, hib, lwb), 3)

    # one full HMC transition (l_max=16 leapfrogs + MH bookkeeping)
    cfg = hmc_mod.HMCConfig(l_max=16)
    states = hmc_mod.init_chains(fz, zb, jax.random.PRNGKey(3), cfg)
    inv_mass = jnp.ones((9,))
    eps = jnp.asarray(0.01)

    def one_step(st):
        def one(s):
            s2, ap = hmc_mod.hmc_transition(
                jax.value_and_grad(fz), s, eps, inv_mass, cfg
            )
            return s2, ap
        return jax.vmap(one)(st)

    f_step = jax.jit(one_step)
    t_step = bench(f_step, states, n=10)
    res["transition_ms"] = round(t_step, 3)
    res["transition_per_leapfrog_ms"] = round(t_step / cfg.l_max, 3)

    # 10-transition scan (amortizes dispatch)
    def scan10(st):
        def one(s):
            def body(s, _):
                s2, ap = hmc_mod.hmc_transition(
                    jax.value_and_grad(fz), s, eps, inv_mass, cfg
                )
                return s2, ap
            return jax.lax.scan(body, s, None, length=10)
        return jax.vmap(one)(st)

    f_scan = jax.jit(scan10)
    t_scan = bench(f_scan, states, n=5)
    res["scan10_ms"] = round(t_scan, 3)
    res["scan10_per_leapfrog_ms"] = round(t_scan / (10 * cfg.l_max), 3)
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    cs = [int(a) for a in sys.argv[1:] if a.isdigit()] or [64]
    pallas = "--pallas" in sys.argv
    for c in cs:
        main(n_chains=c, use_pallas=pallas)
