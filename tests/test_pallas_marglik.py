"""Pallas fused-marginal kernel parity vs the jnp path (forward and
VJP), run in interpreter mode on CPU (SURVEY.md §4.2 golden-parity
strategy: pallas(x) ~= jnp(x) over random batches)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from base_tpu.model import likelihood as lk
from base_tpu.model.stardata import make_ms_stars
from base_tpu.ops.pallas_marglik import fused_log_marginals
from base_tpu.ops.special import masked_logsumexp


def _random_problem(rng, S=37, T=133, B=8):
    model_mags = rng.normal(12.0, 3.0, (T + 1, B)).astype(np.float32)
    lo = model_mags[:-1]
    hi = lo + rng.normal(0.0, 0.3, (T, B)).astype(np.float32)
    # observations near random table rows so some weights are O(1)
    pick = rng.integers(0, T, S)
    obs = lo[pick] + rng.normal(0, 0.05, (S, B)).astype(np.float32)
    sig = np.abs(rng.normal(0.05, 0.02, (S, B))).astype(np.float32) + 0.01
    sig[rng.random((S, B)) < 0.1] = -9.0  # unobserved bands
    stars = make_ms_stars(obs, sig)
    logw = rng.normal(-2.0, 1.0, T).astype(np.float32)
    mask = (rng.random(T) > 0.15).astype(np.float32)
    table = lk.SegmentTable(
        lo=jnp.asarray(lo), hi=jnp.asarray(hi),
        logw=jnp.asarray(logw), mask=jnp.asarray(mask) > 0.5,
    )
    return stars, table


def _jnp_ref(stars, table):
    return lk.ms_star_log_marginals(stars, table)


def _pallas(stars, table):
    return fused_log_marginals(
        stars.obs_mags, stars.inv_var, stars.log_norm,
        table.lo, table.hi, table.logw,
        table.mask.astype(jnp.float32), True,  # interpret on CPU
    )


def test_forward_parity(rng):
    stars, table = _random_problem(rng)
    want = np.asarray(_jnp_ref(stars, table))
    got = np.asarray(_pallas(stars, table))
    sel = want > -200  # compare where float32 has real precision
    assert sel.sum() > 10
    # A-S erf polynomial vs exact erf: up to a few e-2 where a single
    # near-cancelling segment dominates; the kernel's own gradients are
    # exactly consistent with its forward (see module docstring).
    np.testing.assert_allclose(got[sel], want[sel], rtol=0, atol=5e-2)


def test_forward_parity_tile_multiple(rng):
    # Exact tile-size shapes (no padding path).
    stars, table = _random_problem(rng, S=256, T=256)
    want = np.asarray(_jnp_ref(stars, table))
    got = np.asarray(_pallas(stars, table))
    sel = want > -200
    np.testing.assert_allclose(got[sel], want[sel], rtol=0, atol=5e-2)


def test_vjp_parity(rng):
    stars, table = _random_problem(rng, S=23, T=67)
    g = rng.normal(0, 1.0, 23).astype(np.float32)

    def f_ref(lo, hi, logw, ln):
        t = lk.SegmentTable(lo=lo, hi=hi, logw=logw, mask=table.mask)
        st = stars
        import dataclasses

        st = dataclasses.replace(st, log_norm=ln)
        return jnp.sum(_jnp_ref(st, t) * g)

    def f_pal(lo, hi, logw, ln):
        return jnp.sum(
            fused_log_marginals(
                stars.obs_mags, stars.inv_var, ln, lo, hi, logw,
                table.mask.astype(jnp.float32), True,
            )
            * g
        )

    args = (table.lo, table.hi, table.logw, stars.log_norm)
    want = jax.grad(f_ref, argnums=(0, 1, 2, 3))(*args)
    got = jax.grad(f_pal, argnums=(0, 1, 2, 3))(*args)
    for w, gt, name in zip(want, got, ["lo", "hi", "logw", "log_norm"]):
        w = np.asarray(w)
        gt = np.asarray(gt)
        scale = np.abs(w).max() + 1e-6
        # float32 + erfc-based tails vs log_ndtr: ~3e-3 relative worst
        # case, well inside what the MH correction absorbs.
        np.testing.assert_allclose(
            gt / scale, w / scale, atol=5e-3, err_msg=name
        )


def test_vmap_over_tables(rng):
    """Chains carry different tables (params differ); the kernel must
    vmap over (lo, hi, logw) with shared photometry."""
    stars, table = _random_problem(rng, S=17, T=45)
    C = 3
    los = jnp.stack([table.lo + 0.01 * i for i in range(C)])
    his = jnp.stack([table.hi + 0.01 * i for i in range(C)])

    def one(lo, hi):
        return fused_log_marginals(
            stars.obs_mags, stars.inv_var, stars.log_norm,
            lo, hi, table.logw, table.mask.astype(jnp.float32), True,
        )

    got = np.asarray(jax.vmap(one)(los, his))
    for i in range(C):
        t = lk.SegmentTable(lo=los[i], hi=his[i], logw=table.logw,
                            mask=table.mask)
        want = np.asarray(_jnp_ref(stars, t))
        sel = want > -200
        np.testing.assert_allclose(got[i][sel], want[sel], atol=5e-2)
