"""Marginalized per-star photometric likelihood — the hot path.

TPU-native redesign of the reference inner loop [upstream: base9/marg.cpp
margEvolveWithBinary + base9/densities.cpp logLikelihood — SURVEY.md C10,
§3.2].  The reference loops stars x EEPs x secondary-masses x bands with
CPU threads; here the same quadrature is one dense computation:

1. Per proposal, build a combined-magnitude table over (EEP e, mass-ratio
   q_k) nodes: primary mags from the interpolated isochrone, secondary
   mags by mass lookup at m2 = q_k * m1_e, fluxes summed (deriveCombinedMags
   analog), distance modulus + per-band extinction applied.
2. The Gaussian band sum against S stars is one fused broadcast-reduce
   (residual form, float32-exact) -> chi2 [S, E*Q]; an MXU matmul
   variant exists for wide band sets.
3. Mass marginalization = masked logsumexp over E*Q with IMF x dM x dm2
   quadrature weights — log-space, so no underflow for faint stars.
4. Field-star mixture: logaddexp of the cluster marginal against the
   uniform-CMD field density weighted by the membership prior.

Everything is jittable, vmap-able over chains, and differentiable.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from jax import Array

from base_tpu.grids.isochrone import Isochrone, eep_mass_weights
from base_tpu.model import priors
from base_tpu.model.stardata import MSStars
from base_tpu.ops.special import NEG_INF, masked_logsumexp

LN10_04 = 0.9210340371976184  # 0.4 * ln 10


class ModelTable(NamedTuple):
    """Flattened (EEP x q) model-point table for one proposal."""

    mags: Array  # [T, B] apparent combined magnitudes
    logw: Array  # [T] log quadrature weights (IMF x dM x dm2)
    mask: Array  # [T] {0,1}


def combined_mags_table(
    iso: Isochrone,
    q_grid: Array,
    modulus: Array,
    absorption: Array,
    abs_coefs: Array,
    binaries: bool = True,
    uniform_q: bool = False,
    upsample: int = 4,
) -> ModelTable:
    """Build the per-proposal model table.

    q_grid [Q] mass ratios in [0, 1]; q=0 is the no-companion node, which
    the uniform-in-secondary-mass prior covers continuously (the reference
    integrates secondary mass on the EEP grid below the primary
    [SURVEY.md C10]; a fixed q grid is an equivalent static-shape
    quadrature).  `uniform_q` switches the secondary prior from uniform in
    m2 (reference behavior, weight m1*dq) to uniform in q (weight dq).

    `upsample` refines the EEP quadrature (exactly — the model is
    piecewise-linear in mass) so adjacent nodes differ by << sigma in
    magnitude; pair with `sigma_model` smoothing in make_ms_stars.
    """
    from base_tpu.grids.isochrone import upsample_isochrone

    iso = upsample_isochrone(iso, upsample)
    E = iso.mass.shape[0]
    m1 = iso.mass  # [E]
    dist = modulus + absorption * abs_coefs  # [B]
    app1 = iso.mags + dist  # [E, B]
    f1 = jnp.exp(-LN10_04 * app1)

    if binaries:
        Q = q_grid.shape[0]
        m2 = m1[:, None] * q_grid[None, :]  # [E, Q]
        mags2 = iso.mags_at_mass(m2.reshape(-1))  # [E*Q, B]
        app2 = mags2.reshape(E, Q, -1) + dist
        # Companions below the isochrone's lowest valid mass are dark
        # (treated as no companion); q=0 lands here automatically.
        lit = (m2 >= iso.min_mass).astype(app2.dtype)  # [E, Q]
        f2 = jnp.exp(-LN10_04 * app2) * lit[..., None]
        comb = -(1.0 / LN10_04) * jnp.log(f1[:, None, :] + f2)  # [E,Q,B]

        # Quadrature weights: trapezoid in q, times m1 for the uniform-in-
        # secondary-mass prior (dm2 = m1 dq).
        dq = jnp.gradient(q_grid)
        if uniform_q:
            logw_q = jnp.log(dq)[None, :] + jnp.zeros((E, 1))
        else:
            logw_q = jnp.log(jnp.maximum(m1, 1e-12))[:, None] + jnp.log(dq)[None, :]
        logw = (
            priors.log_imf(m1)[:, None]
            + jnp.log(jnp.maximum(eep_mass_weights(iso), 1e-30))[:, None]
            + logw_q
        )
        mask = jnp.broadcast_to((iso.valid > 0.5)[:, None], (E, Q))
        B = comb.shape[-1]
        return ModelTable(
            mags=comb.reshape(E * Q, B),
            logw=logw.reshape(E * Q),
            mask=mask.reshape(E * Q),
        )
    else:
        logw = priors.log_imf(m1) + jnp.log(
            jnp.maximum(eep_mass_weights(iso), 1e-30)
        )
        return ModelTable(mags=app1, logw=logw, mask=iso.valid > 0.5)


def gaussian_loglik_matrix(stars: MSStars, model_mags: Array) -> Array:
    """log N(obs | model) summed over bands, for all (star, model point).

    Residual form: chi2[s,t] = sum_b (o[s,b] - m[t,b])^2 * w[s,b].  The
    residuals are O(sigma), so float32 is exact where it matters — the
    expanded-quadratic matmul form (see gaussian_loglik_matmul) loses
    ~0.03 in chi2 to cancellation at o^2/sigma^2 ~ 1e6.  With B ~ 8 the
    matmul's MXU contraction is only ~6% utilized anyway, so the VPU
    residual form costs nothing; XLA fuses the band reduction without
    materializing [S, T, B].
    """
    diff = stars.obs_mags[:, None, :] - model_mags[None, :, :]  # [S,T,B]
    chi2 = jnp.sum(diff * diff * stars.inv_var[:, None, :], axis=-1)
    return -0.5 * chi2 + stars.log_norm[:, None]


def gaussian_loglik_matmul(stars: MSStars, model_mags: Array, center: Array) -> Array:
    """MXU variant for wide band sets (B >~ 64): two [S,B]x[B,T] matmuls
    on per-band-centered magnitudes.  `center` [B] should be ~the mean
    observed magnitude per band to limit float32 cancellation.
    """
    m = model_mags - center[None, :]
    o = stars.obs_mags - center[None, :]
    o = jnp.where(stars.inv_var > 0, o, 0.0)
    cross = jnp.dot(o * stars.inv_var, m.T, preferred_element_type=jnp.float32)
    quad = jnp.dot(stars.inv_var, (m * m).T, preferred_element_type=jnp.float32)
    c0 = jnp.sum(o * o * stars.inv_var, axis=-1)
    chi2 = c0[:, None] - 2.0 * cross + quad
    return -0.5 * chi2 + stars.log_norm[:, None]


def ms_star_log_marginals(stars: MSStars, table: ModelTable) -> Array:
    """Per-star log marginal cluster likelihood: logsumexp over the mass
    quadrature.  [S]"""
    ll = gaussian_loglik_matrix(stars, table.mags)  # [S, T]
    return masked_logsumexp(ll + table.logw[None, :], table.mask[None, :], axis=-1)


def ms_total_loglik(stars: MSStars, table: ModelTable) -> Array:
    """Sum over stars of the field-mixture log posterior density.

    density_s = CMprior_s * L_cluster_s + (1 - CMprior_s) * L_field_s
    [upstream: field-star mixture in base9/densities.cpp — SURVEY.md C9].
    """
    log_clust = ms_star_log_marginals(stars, table)  # [S]
    a = stars.log_cm + log_clust
    b = stars.log_1m_cm + stars.field_logdens
    m = jnp.maximum(a, b)
    per_star = m + jnp.log(jnp.exp(a - m) + jnp.exp(b - m))
    per_star = jnp.maximum(per_star, NEG_INF)
    return jnp.sum(per_star * stars.star_mask)
