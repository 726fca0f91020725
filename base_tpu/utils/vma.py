"""Varying-manual-axes (vma) helpers for samplers used inside shard_map.

The sharded runners (base_tpu.parallel.run) run every sampler inside
`shard_map(..., check_vma=True)`.  vma checking is load-bearing, not
cosmetic: it is what makes reverse-mode AD of `lax.psum` insert the
transpose collectives, so the star-axis likelihood psum backprops the
FULL gradient instead of silently dropping every other shard's
contribution (a bug this repo shipped with check_vma=False: HMC chains
froze at eps~1e-12 because the density and its gradient disagreed).

Under vma tracking, `lax.scan` requires carry input/output types to
match INCLUDING their varying axes.  Sampler adaptation carries
(acceptance counters, step scales) start as replicated constants but
become chain-varying after one update.  `vma_like(x, ref)` promotes the
initial carry to the reference value's vma; it is a no-op outside
shard_map (or with no vma difference), so samplers stay usable unsharded
and under plain vmap.
"""
from __future__ import annotations

import jax


def vma_axes(x) -> frozenset:
    return frozenset(getattr(jax.typeof(x), "vma", frozenset()))


def vma_like(x, ref):
    """Return x marked varying over every mesh axis `ref` varies over."""
    missing = vma_axes(ref) - vma_axes(x)
    if not missing:
        return x
    return jax.lax.pcast(x, tuple(missing), to="varying")
