"""Regular-grid multilinear interpolation primitives.

TPU-native replacement for the reference's pointer-walking 2x2x2 corner
interpolation [upstream: base9/MsRgbModels/GenericMsModel.cpp — SURVEY.md
C5].  Design notes:

- Axes are small 1-D monotone arrays living in device memory; locating a
  query is a `searchsorted` (tiny) and the blend is a static Python loop
  over the 2^k corners, which XLA fuses into a handful of gathers + FMAs.
- Everything is differentiable: gradients flow through the lerp weights
  (piecewise-linear in the query), which is exactly what HMC/NUTS needs.
- Out-of-bounds queries are clamped to the boundary cell; callers receive
  an `in_bounds` flag so the log-density can veto (-inf) or the transform
  layer can keep samplers inside the hull.
"""
from __future__ import annotations

from typing import NamedTuple, Sequence

import jax.numpy as jnp
from jax import Array


class AxisLoc(NamedTuple):
    """Location of a query on one grid axis."""

    idx: Array   # int32, lower corner index in [0, len(axis)-2]
    frac: Array  # lerp weight, clamped to [0, 1] for blending
    inside: Array  # bool, True when the raw query was within the axis hull


def locate(axis: Array, x: Array) -> AxisLoc:
    """Find the cell of `x` on a monotone-increasing 1-D `axis`."""
    n = axis.shape[0]
    idx = jnp.clip(jnp.searchsorted(axis, x, side="right") - 1, 0, n - 2)
    lo = axis[idx]
    hi = axis[idx + 1]
    frac_raw = (x - lo) / (hi - lo)
    inside = (x >= axis[0]) & (x <= axis[-1])
    return AxisLoc(idx.astype(jnp.int32), jnp.clip(frac_raw, 0.0, 1.0), inside)


def multilinear(
    axes: Sequence[Array],
    values: Array,
    point: Sequence[Array],
):
    """Multilinear interpolation of `values` on a tensor-product grid.

    axes:   k monotone 1-D arrays, lengths (n_0, ..., n_{k-1})
    values: array with leading shape (n_0, ..., n_{k-1}) + trailing payload
    point:  k scalars (or broadcastable arrays; scalar use is typical —
            vmap for batches)

    Returns (interpolated payload, in_bounds flag).
    """
    k = len(axes)
    locs = [locate(a, p) for a, p in zip(axes, point)]
    inside = locs[0].inside
    for l in locs[1:]:
        inside = inside & l.inside

    out = None
    for corner in range(1 << k):
        idx = tuple(
            locs[d].idx + ((corner >> d) & 1) for d in range(k)
        )
        w = 1.0
        for d in range(k):
            t = locs[d].frac
            w = w * jnp.where((corner >> d) & 1, t, 1.0 - t)
        term = values[idx] * w
        out = term if out is None else out + term
    return out, inside


def gather_corners(axes: Sequence[Array], point: Sequence[Array]):
    """Return (corner index tuples, corner weights, in_bounds).

    Used when several payload arrays share the same grid axes (mass, mags,
    validity mask of an isochrone grid): locate once, blend many.
    """
    k = len(axes)
    locs = [locate(a, p) for a, p in zip(axes, point)]
    inside = locs[0].inside
    for l in locs[1:]:
        inside = inside & l.inside

    corners = []
    weights = []
    for corner in range(1 << k):
        idx = tuple(locs[d].idx + ((corner >> d) & 1) for d in range(k))
        w = 1.0
        for d in range(k):
            t = locs[d].frac
            w = w * jnp.where((corner >> d) & 1, t, 1.0 - t)
        corners.append(idx)
        weights.append(w)
    return corners, weights, inside


def blend(corners, weights, values: Array) -> Array:
    """Blend payload `values` over precomputed corners/weights."""
    out = None
    for idx, w in zip(corners, weights):
        term = values[idx] * w
        out = term if out is None else out + term
    return out


def interp1d(x_axis: Array, y: Array, xq: Array) -> Array:
    """Piecewise-linear 1-D interpolation with boundary clamping.

    y may have trailing payload dims; y.shape[0] == x_axis.shape[0].
    xq may be any shape; result has shape xq.shape + y.shape[1:].
    Monotone-increasing x_axis required.
    """
    loc = locate(x_axis, xq)
    lo = y[loc.idx]
    hi = y[loc.idx + 1]
    t = loc.frac
    # Broadcast frac over payload dims.
    t = t.reshape(t.shape + (1,) * (y.ndim - 1))
    return lo + (hi - lo) * t
