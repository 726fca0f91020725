"""Bijective reparameterizations for gradient-based samplers.

The reference's MH sampler rejects out-of-bounds proposals with a -inf
shortcut [upstream: MpiMcmcApplication logPostStep bounds check — SURVEY.md
§3.1].  HMC/NUTS instead sample in an unconstrained space z and map to the
bounded physical space x through a smooth bijection, adding log|dx/dz| to
the log-density.  Bounds for age/Y/FeH come from the model-grid hull.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from jax import Array


class IntervalTransform(NamedTuple):
    """Per-parameter affine-sigmoid transform onto (lo, hi).

    For parameters with lo == -inf and hi == +inf the transform is the
    identity.  `bounded` is a {0,1} float mask selecting the sigmoid path;
    using a mask (instead of Python branching) keeps one jittable code
    path for the whole parameter vector.
    """

    lo: Array       # [P]
    hi: Array       # [P]
    bounded: Array  # [P] float mask

    def forward(self, z: Array) -> Array:
        """Unconstrained z -> physical x."""
        s = jnp.clip(jax_sigmoid(z), 1e-7, 1.0 - 1e-7)
        x_b = self.lo + (self.hi - self.lo) * s
        return self.bounded * x_b + (1.0 - self.bounded) * z

    def inverse(self, x: Array) -> Array:
        """Physical x -> unconstrained z."""
        u = (x - self.lo) / jnp.where(
            self.bounded > 0, self.hi - self.lo, 1.0
        )
        u = jnp.clip(u, 1e-7, 1.0 - 1e-7)
        z_b = jnp.log(u) - jnp.log1p(-u)
        return self.bounded * z_b + (1.0 - self.bounded) * x

    def log_det_jacobian(self, z: Array) -> Array:
        """sum_p log |dx_p/dz_p| evaluated at unconstrained z."""
        s = jnp.clip(jax_sigmoid(z), 1e-7, 1.0 - 1e-7)
        ld = jnp.log(self.hi - self.lo + 1e-30) + jnp.log(s) + jnp.log1p(-s)
        return jnp.sum(self.bounded * ld, axis=-1)


def jax_sigmoid(z: Array) -> Array:
    return 0.5 * (jnp.tanh(0.5 * z) + 1.0)


def make_interval_transform(lo, hi) -> IntervalTransform:
    """Build a transform from per-parameter (lo, hi) arrays.

    Use +-inf (or None entries via build_bounds) for unbounded parameters.
    """
    lo = jnp.asarray(lo, dtype=jnp.float32)
    hi = jnp.asarray(hi, dtype=jnp.float32)
    bounded = (jnp.isfinite(lo) & jnp.isfinite(hi)).astype(jnp.float32)
    # Replace infinities so arithmetic on the unused path stays finite.
    lo = jnp.where(jnp.isfinite(lo), lo, 0.0)
    hi = jnp.where(jnp.isfinite(hi), hi, 1.0)
    return IntervalTransform(lo=lo, hi=hi, bounded=bounded)
