"""Numerically-stable special ops used by the marginalized likelihood.

The reference accumulates exp(logPost) contributions in double precision
[upstream: base9/marg.cpp — SURVEY.md C10]; on TPU we work in float32 and
use max-shifted logsumexp with explicit masking so that padded EEP /
quadrature slots contribute exactly zero probability (not -inf * 0 NaNs,
the hazard flagged in SURVEY.md §7 "hard parts" #2).
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import Array

NEG_INF = -1e30  # finite stand-in for -inf: keeps gradients NaN-free


def masked_logsumexp(x: Array, mask: Array, axis=-1) -> Array:
    """log(sum_i mask_i * exp(x_i)) along `axis`, safe for all-masked rows.

    mask is boolean (or {0,1} float).  Rows with no valid entries return
    NEG_INF (a large negative float32, not -inf) so downstream sums stay
    finite and differentiable.
    """
    neg = jnp.asarray(NEG_INF, dtype=x.dtype)
    x = jnp.where(mask, x, neg)
    m = jnp.max(x, axis=axis, keepdims=True)
    m = jnp.maximum(m, neg)  # all-masked rows: avoid -inf shift
    s = jnp.sum(jnp.where(mask, jnp.exp(x - m), 0.0), axis=axis)
    out = jnp.squeeze(m, axis=axis) + jnp.log(jnp.maximum(s, 1e-38))
    return jnp.where(s > 0, out, neg)


def logaddexp(a: Array, b: Array) -> Array:
    """Stable log(e^a + e^b) tolerant of NEG_INF sentinels."""
    m = jnp.maximum(a, b)
    return m + jnp.log1p(jnp.exp(-jnp.abs(a - b)))


def log_gaussian(x: Array, mean: Array, sigma: Array) -> Array:
    """Elementwise log N(x | mean, sigma^2)."""
    z = (x - mean) / sigma
    return -0.5 * z * z - jnp.log(sigma) - 0.9189385332046727
