"""TPU parity + timing for the fused Pallas marginal-likelihood kernel.

VERDICT r1 #2: the kernel was parity-tested only in interpret mode on
CPU.  This script runs on the REAL chip and, across (S, T) shapes and a
vmapped chain batch, checks forward and VJP agreement between

  - jnp path:    likelihood.ms_star_log_marginals
  - pallas path: ops.pallas_marglik.fused_log_marginals

and times both (forward and value_and_grad of the field-mixture total,
the quantity HMC differentiates).  Its captured output is committed at
benchmarks/pallas_parity_tpu.out — the artifact backing the usePallas
default.

Run:  python -u benchmarks/pallas_parity_tpu.py | tee benchmarks/pallas_parity_tpu.out
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

# Run as a plain script from anywhere (PYTHONPATH breaks the axon TPU
# plugin registration, so the repo root is inserted here instead).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(fn, *args, n=20):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    import jax
    import jax.numpy as jnp

    from base_tpu.model import likelihood as lk
    from base_tpu.model.stardata import make_ms_stars
    from base_tpu.ops.pallas_marglik import fused_log_marginals

    print(f"backend={jax.default_backend()} devices={jax.devices()}",
          flush=True)
    interpret = jax.default_backend() != "tpu"
    key = jax.random.PRNGKey(0)

    for (S, T, B, C) in [(100, 504, 8, 1), (100, 504, 8, 64),
                         (100, 504, 8, 512), (1000, 504, 8, 64),
                         (10000, 1008, 8, 8), (100, 2048, 8, 256)]:
        ks = jax.random.split(jax.random.fold_in(key, S * T + C), 8)
        obs = 12.0 + 2.0 * jax.random.normal(ks[0], (S, B))
        sig = 0.02 + 0.1 * jax.random.uniform(ks[1], (S, B))
        stars = make_ms_stars(np.asarray(obs), np.asarray(sig),
                              cm_prior=0.99)
        # chain-batched tables (the real hot path: table varies per chain)
        lo = 12.0 + 2.0 * jax.random.normal(ks[2], (C, T, B))
        hi = lo + 0.1 * jax.random.normal(ks[3], (C, T, B))
        logw = -1.0 + jax.random.normal(ks[4], (C, T))
        mask = (jax.random.uniform(ks[5], (C, T)) > 0.05)

        def jnp_marg(lo, hi, logw, mask):
            t = lk.SegmentTable(lo=lo, hi=hi, logw=logw, mask=mask)
            return lk.ms_star_log_marginals(stars, t)

        def pl_marg(lo, hi, logw, mask):
            return fused_log_marginals(
                stars.obs_mags, stars.inv_var, stars.log_norm,
                lo, hi, logw, mask.astype(jnp.float32),
                interpret=interpret)

        def tot(marg_fn, lo, hi, logw, mask):
            lc = marg_fn(lo, hi, logw, mask)
            t = lk.SegmentTable(lo=lo, hi=hi, logw=logw, mask=mask)
            return lk.field_mixture_total(stars, lc)

        f_jnp = jax.jit(jax.vmap(jnp_marg))
        f_pl = jax.jit(jax.vmap(pl_marg))
        g_jnp = jax.jit(jax.vmap(jax.value_and_grad(
            lambda lo, hi, logw, mask: tot(jnp_marg, lo, hi, logw, mask),
            argnums=(0, 1, 2))))
        g_pl = jax.jit(jax.vmap(jax.value_and_grad(
            lambda lo, hi, logw, mask: tot(pl_marg, lo, hi, logw, mask),
            argnums=(0, 1, 2))))

        a = f_jnp(lo, hi, logw, mask)
        b = f_pl(lo, hi, logw, mask)
        fwd_err = float(jnp.max(jnp.abs(a - b) / (jnp.abs(a) + 1.0)))

        (va, ga) = g_jnp(lo, hi, logw, mask)
        (vb, gb) = g_pl(lo, hi, logw, mask)
        v_err = float(jnp.max(jnp.abs(va - vb) / (jnp.abs(va) + 1.0)))
        g_errs = [
            float(jnp.max(jnp.abs(x - y) / (jnp.max(jnp.abs(x)) + 1e-6)))
            for x, y in zip(ga, gb)
        ]

        t_f_jnp = bench(f_jnp, lo, hi, logw, mask)
        t_f_pl = bench(f_pl, lo, hi, logw, mask)
        t_g_jnp = bench(g_jnp, lo, hi, logw, mask)
        t_g_pl = bench(g_pl, lo, hi, logw, mask)
        print(
            f"S={S:6d} T={T:5d} B={B} C={C:4d}  "
            f"fwd_err={fwd_err:.2e} val_err={v_err:.2e} "
            f"grad_err={max(g_errs):.2e}  "
            f"fwd jnp {t_f_jnp*1e3:7.2f}ms pl {t_f_pl*1e3:7.2f}ms "
            f"({t_f_jnp/t_f_pl:4.2f}x)  "
            f"vjp jnp {t_g_jnp*1e3:7.2f}ms pl {t_g_pl*1e3:7.2f}ms "
            f"({t_g_jnp/t_g_pl:4.2f}x)",
            flush=True,
        )


if __name__ == "__main__":
    main()
