"""Fused Pallas kernel: segment-exact marginal likelihood in one pass.

This is the BASELINE.json:5 kernel — "Pallas-kernel multilinear
interpolation fused into a vectorized per-star photometric
log-likelihood".  The jnp path (model.likelihood.segment_logintegrals +
masked_logsumexp) materializes alpha/beta/gamma/logI [S, T] intermediates
in HBM per proposal (4+ round trips of S*T floats); this kernel streams
segment tiles through VMEM, keeping a running (max, sumexp) accumulator
per star, so HBM traffic drops to reading the [T, B] table + [S, B]
photometry once per call, regardless of T.

Math is identical to the jnp path: per (star s, segment t)
  chi2(t) = alpha u^2 - 2 beta u + gamma  (u in [0, 1])
  logI = -(gamma - beta^2/alpha)/2 + (log 2pi - log alpha)/2
         + log(Phi(u1) - Phi(u0)),  u0 = -beta/sqrt(a), u1 = (a-b)/sqrt(a)
  out[s] = logsumexp_t(logI + logw) + log_norm[s]

The backward pass is a second kernel computing d/d{lo, hi, logw} with
the same tiling (softmax weights recomputed from the saved forward
output — nothing [S, T]-sized is ever stored).  Photometry inputs get
zero cotangents (data).

Layout: the table is passed TRANSPOSED ([B, T]) so per-band rows are
contiguous lanes; tiles are (S_TILE x T_TILE) = (256, 256) f32, well
under VMEM with headroom for ~6 live temporaries.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_BIG = -1e30
LOG_2PI = 1.8378770664093453
HALF_LOG_2PI = 0.9189385332046727
_ALPHA_EPS = 1e-12

S_TILE = 256
T_TILE = 256


def _log_erfc_pos(x: Array) -> Array:
    """log(erfc(x)) for x >= 0 via Abramowitz-Stegun 7.1.26.

    erfc(x) = P(t) exp(-x^2), t = 1/(1 + 0.3275911 x), |abs err of
    P(t)exp(-x^2)| <= 1.5e-7 — evaluated in log space so the tail never
    underflows.  Mosaic-safe: mul/exp/log only (no erf/erfc primitive,
    which Pallas TPU cannot lower).
    """
    t = 1.0 / (1.0 + 0.3275911 * x)
    poly = t * (
        0.254829592
        + t * (-0.284496736
               + t * (1.421413741
                      + t * (-1.453152027 + t * 1.061405429)))
    )
    return jnp.log(jnp.maximum(poly, 1e-30)) - x * x


def _log_ndtr(x: Array) -> Array:
    """Stable elementwise log Phi(x) (float32, kernel-safe)."""
    inv_sqrt2 = 0.7071067811865476
    xc = jnp.clip(x, -200.0, 200.0)
    # x <= 0: Phi(x) = 0.5 erfc(-x/sqrt2)
    left = jnp.log(0.5) + _log_erfc_pos(jnp.maximum(-xc, 0.0) * inv_sqrt2)
    # x > 0: Phi(x) = 1 - 0.5 erfc(x/sqrt2)
    q = 0.5 * jnp.exp(_log_erfc_pos(jnp.maximum(xc, 0.0) * inv_sqrt2))
    right = jnp.log1p(-jnp.minimum(q, 0.999999))
    return jnp.where(x > 0.0, right, left)


def _log_ndtr_diff(a: Array, b: Array):
    """(log(Phi(b) - Phi(a)), log_ndtr at reflected endpoints).  b >= a."""
    flip = (a + b) > 0
    aa = jnp.where(flip, -b, a)
    bb = jnp.where(flip, -a, b)
    la = _log_ndtr(aa)
    lb = _log_ndtr(bb)
    d = jnp.minimum(la - lb, -1e-7)
    return lb + jnp.log1p(-jnp.exp(d))


def _tile_logI(obs, iv, loT, hiT, logw, maskf, n_bands):
    """Shared per-tile computation: returns (logI+logw masked [S_t, T_t],
    alpha, beta, gamma)."""
    St = obs.shape[0]
    Tt = loT.shape[1]
    alpha = jnp.zeros((St, Tt), jnp.float32)
    beta = jnp.zeros((St, Tt), jnp.float32)
    gamma = jnp.zeros((St, Tt), jnp.float32)
    for bnd in range(n_bands):
        lo_b = loT[bnd : bnd + 1, :]          # [1, Tt]
        d_b = hiT[bnd : bnd + 1, :] - lo_b    # [1, Tt]
        o_b = obs[:, bnd : bnd + 1]           # [St, 1]
        iv_b = iv[:, bnd : bnd + 1]           # [St, 1]
        r_b = o_b - lo_b                      # [St, Tt]
        alpha = alpha + iv_b * d_b * d_b
        beta = beta + iv_b * r_b * d_b
        gamma = gamma + iv_b * r_b * r_b
    ac = jnp.maximum(alpha, _ALPHA_EPS)
    mu = beta / ac
    resid = jnp.maximum(gamma - beta * beta / ac, 0.0)
    sq = jnp.sqrt(ac)
    log_phi = _log_ndtr_diff(-sq * mu, sq * (1.0 - mu))
    log_i = -0.5 * resid + 0.5 * (LOG_2PI - jnp.log(ac)) + log_phi
    flat = -0.5 * gamma
    log_i = jnp.where(alpha > _ALPHA_EPS, log_i, flat)
    x = jnp.where(maskf > 0.5, log_i + logw, NEG_BIG)
    return x, alpha, beta, gamma, ac, mu, resid


def _fwd_kernel(
    obs_ref, iv_ref, ln_ref, loT_ref, hiT_ref, logw_ref, mask_ref,
    out_ref, m_sc, s_sc, *, n_bands: int,
):
    ti = pl.program_id(1)
    n_t = pl.num_programs(1)
    x, *_ = _tile_logI(
        obs_ref[:], iv_ref[:], loT_ref[:], hiT_ref[:],
        logw_ref[:], mask_ref[:], n_bands,
    )
    tm = jnp.max(x, axis=1, keepdims=True)          # [St, 1]
    tsum = jnp.sum(jnp.exp(x - tm), axis=1, keepdims=True)

    @pl.when(ti == 0)
    def _():
        m_sc[:] = tm
        s_sc[:] = tsum

    @pl.when(ti > 0)
    def _():
        m_old = m_sc[:]
        m_new = jnp.maximum(m_old, tm)
        s_sc[:] = s_sc[:] * jnp.exp(m_old - m_new) + tsum * jnp.exp(
            tm - m_new
        )
        m_sc[:] = m_new

    @pl.when(ti == n_t - 1)
    def _():
        out_ref[:] = (
            m_sc[:] + jnp.log(jnp.maximum(s_sc[:], 1e-38)) + ln_ref[:]
        )


def _bwd_kernel(
    obs_ref, iv_ref, loT_ref, hiT_ref, logw_ref, mask_ref,
    out_ref, g_ref,
    dlo_ref, dhi_ref, dlogw_ref, *, n_bands: int,
):
    si = pl.program_id(1)
    x, alpha, beta, gamma, ac, mu, resid = _tile_logI(
        obs_ref[:], iv_ref[:], loT_ref[:], hiT_ref[:],
        logw_ref[:], mask_ref[:], n_bands,
    )
    # softmax weight * upstream grad; out_ref/g_ref are [St, 1]
    gw = g_ref[:] * jnp.exp(x - out_ref[:])         # [St, Tt]

    # d logI / d {alpha, beta, gamma} by forward-mode AD of the SAME
    # formula the forward evaluates (including the polynomial log-ndtr),
    # so gradients are exactly consistent with the kernel's density —
    # hand-derived phi/D expressions drift where the polynomial
    # approximation's derivative departs from the true Mills ratio.
    def _logI_of(a, b, c):
        a_c = jnp.maximum(a, _ALPHA_EPS)
        mu_ = b / a_c
        resid_ = jnp.maximum(c - b * b / a_c, 0.0)
        sq_ = jnp.sqrt(a_c)
        lphi = _log_ndtr_diff(-sq_ * mu_, sq_ * (1.0 - mu_))
        li = -0.5 * resid_ + 0.5 * (LOG_2PI - jnp.log(a_c)) + lphi
        return jnp.where(a > _ALPHA_EPS, li, -0.5 * c)

    ones = jnp.ones_like(alpha)
    zeros = jnp.zeros_like(alpha)
    _, dIa = jax.jvp(_logI_of, (alpha, beta, gamma), (ones, zeros, zeros))
    _, dIb = jax.jvp(_logI_of, (alpha, beta, gamma), (zeros, ones, zeros))
    _, dIc = jax.jvp(_logI_of, (alpha, beta, gamma), (zeros, zeros, ones))

    ga = gw * dIa
    gb = gw * dIb
    gc = gw * dIc

    first = si == 0
    for bnd in range(n_bands):
        lo_b = loT_ref[bnd : bnd + 1, :]
        d_b = hiT_ref[bnd : bnd + 1, :] - lo_b
        o_b = obs_ref[:, bnd : bnd + 1]
        iv_b = iv_ref[:, bnd : bnd + 1]
        r_b = o_b - lo_b
        # d alpha/d lo = -2 iv d ; d beta/d lo = -iv (d + r) ; d gamma/d lo = -2 iv r
        dlo_t = jnp.sum(
            iv_b * (-2.0 * ga * d_b - gb * (d_b + r_b) - 2.0 * gc * r_b),
            axis=0, keepdims=True,
        )                                            # [1, Tt]
        # d alpha/d hi = 2 iv d ; d beta/d hi = iv r
        dhi_t = jnp.sum(
            iv_b * (2.0 * ga * d_b + gb * r_b), axis=0, keepdims=True
        )

        @pl.when(first)
        def _(bnd=bnd, dlo_t=dlo_t, dhi_t=dhi_t):
            dlo_ref[bnd : bnd + 1, :] = dlo_t
            dhi_ref[bnd : bnd + 1, :] = dhi_t

        @pl.when(jnp.logical_not(first))
        def _(bnd=bnd, dlo_t=dlo_t, dhi_t=dhi_t):
            dlo_ref[bnd : bnd + 1, :] = dlo_ref[bnd : bnd + 1, :] + dlo_t
            dhi_ref[bnd : bnd + 1, :] = dhi_ref[bnd : bnd + 1, :] + dhi_t

    dw_t = jnp.sum(gw, axis=0, keepdims=True)        # [1, Tt]

    @pl.when(first)
    def _():
        dlogw_ref[:] = dw_t

    @pl.when(jnp.logical_not(first))
    def _():
        dlogw_ref[:] = dlogw_ref[:] + dw_t


def _pad_to(x, n, axis, value=0.0):
    pad = n - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


@functools.lru_cache(maxsize=4)
def _make_fused(interpret: bool):
    @jax.custom_vjp
    def f(obs, inv_var, log_norm, lo, hi, logw, maskf):
        out, _ = _fwd(obs, inv_var, log_norm, lo, hi, logw, maskf, interpret)
        return out

    f.defvjp(
        functools.partial(_fwd_rule, interpret),
        functools.partial(_bwd_rule, interpret),
    )
    return f


def fused_log_marginals(
    obs: Array,      # [S, B]
    inv_var: Array,  # [S, B]
    log_norm: Array, # [S]
    lo: Array,       # [T, B]
    hi: Array,       # [T, B]
    logw: Array,     # [T]
    maskf: Array,    # [T] float {0, 1}
    interpret: bool = False,
) -> Array:
    """Per-star log marginal cluster likelihood, fused on-chip.  Matches
    likelihood.ms_star_log_marginals(stars, table) with the table pieces
    passed explicitly.  Differentiable wrt log_norm/lo/hi/logw."""
    return _make_fused(bool(interpret))(
        obs, inv_var, log_norm, lo, hi, logw, maskf
    )


def _fwd(obs, inv_var, log_norm, lo, hi, logw, maskf, interpret):
    S, B = obs.shape
    T = lo.shape[0]
    Sp = max(((S + S_TILE - 1) // S_TILE) * S_TILE, S_TILE)
    Tp = max(((T + T_TILE - 1) // T_TILE) * T_TILE, T_TILE)

    obs_p = _pad_to(obs, Sp, 0)
    iv_p = _pad_to(inv_var, Sp, 0)
    ln_p = _pad_to(log_norm.reshape(S, 1), Sp, 0)
    loT = _pad_to(lo.T, Tp, 1)                      # [B, Tp]
    hiT = _pad_to(hi.T, Tp, 1)
    logw_p = _pad_to(logw.reshape(1, T), Tp, 1)
    mask_p = _pad_to(maskf.reshape(1, T), Tp, 1)    # pad slots masked out

    grid = (Sp // S_TILE, Tp // T_TILE)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, n_bands=B),
        grid=grid,
        in_specs=[
            pl.BlockSpec((S_TILE, B), lambda si, ti: (si, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S_TILE, B), lambda si, ti: (si, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S_TILE, 1), lambda si, ti: (si, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, T_TILE), lambda si, ti: (0, ti),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, T_TILE), lambda si, ti: (0, ti),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T_TILE), lambda si, ti: (0, ti),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T_TILE), lambda si, ti: (0, ti),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((S_TILE, 1), lambda si, ti: (si, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Sp, 1), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((S_TILE, 1), jnp.float32),
            pltpu.VMEM((S_TILE, 1), jnp.float32),
        ],
        interpret=interpret,
    )(obs_p, iv_p, ln_p, loT, hiT, logw_p, mask_p)
    out = out[:S, 0]
    residuals = (obs, inv_var, log_norm, lo, hi, logw, maskf, out)
    return out, residuals


def _fwd_rule(interpret, obs, inv_var, log_norm, lo, hi, logw, maskf):
    return _fwd(obs, inv_var, log_norm, lo, hi, logw, maskf, interpret)


def _bwd_rule(interpret, residuals, g):
    obs, inv_var, log_norm, lo, hi, logw, maskf, out = residuals
    S, B = obs.shape
    T = lo.shape[0]
    Sp = max(((S + S_TILE - 1) // S_TILE) * S_TILE, S_TILE)
    Tp = max(((T + T_TILE - 1) // T_TILE) * T_TILE, T_TILE)

    obs_p = _pad_to(obs, Sp, 0)
    iv_p = _pad_to(inv_var, Sp, 0)
    loT = _pad_to(lo.T, Tp, 1)
    hiT = _pad_to(hi.T, Tp, 1)
    logw_p = _pad_to(logw.reshape(1, T), Tp, 1)
    mask_p = _pad_to(maskf.reshape(1, T), Tp, 1)
    # The kernel's x excludes log_norm while out includes it: remove it
    # so exp(x - out) is the true softmax weight.  Padded stars: g=0.
    out_p = _pad_to((out - log_norm).reshape(S, 1), Sp, 0)
    g_p = _pad_to(g.reshape(S, 1), Sp, 0)

    grid = (Tp // T_TILE, Sp // S_TILE)   # s innermost: accumulate over s
    dloT, dhiT, dlogw = pl.pallas_call(
        functools.partial(_bwd_kernel, n_bands=B),
        grid=grid,
        in_specs=[
            pl.BlockSpec((S_TILE, B), lambda ti, si: (si, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S_TILE, B), lambda ti, si: (si, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, T_TILE), lambda ti, si: (0, ti),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, T_TILE), lambda ti, si: (0, ti),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T_TILE), lambda ti, si: (0, ti),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T_TILE), lambda ti, si: (0, ti),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S_TILE, 1), lambda ti, si: (si, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S_TILE, 1), lambda ti, si: (si, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((B, T_TILE), lambda ti, si: (0, ti),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, T_TILE), lambda ti, si: (0, ti),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T_TILE), lambda ti, si: (0, ti),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Tp), jnp.float32),
            jax.ShapeDtypeStruct((B, Tp), jnp.float32),
            jax.ShapeDtypeStruct((1, Tp), jnp.float32),
        ],
        interpret=interpret,
    )(obs_p, iv_p, loT, hiT, logw_p, mask_p, out_p, g_p)

    dlo = dloT[:, :T].T
    dhi = dhiT[:, :T].T
    dlogw_out = dlogw[0, :T]
    zeros_obs = jnp.zeros_like(obs)
    zeros_iv = jnp.zeros_like(inv_var)
    # log_norm enters additively: d out/d log_norm = identity.
    dln = g
    dmask = jnp.zeros_like(maskf)
    return (zeros_obs, zeros_iv, dln, dlo, dhi, dlogw_out, dmask)

