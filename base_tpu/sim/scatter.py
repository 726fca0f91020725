"""Photometric noise model — the scatterCluster equivalent.

TPU-native rebuild of the reference's noise stage [upstream:
scatterCluster/ — SURVEY.md E4, §3.3]: per-band magnitude-dependent
Gaussian uncertainties from an S/N-vs-magnitude model with bright/faint
cutoffs, emitting sampler-ready photometry (sigma < 0 marks a band
unobserved, matching the .phot convention [SURVEY.md C14]).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import Array


class ScatteredCatalog(NamedTuple):
    mags: Array    # [S, B] noisy apparent magnitudes
    sigmas: Array  # [S, B]; <= 0 where unobserved (outside cutoffs)


def sigma_model(
    mags: Array,
    limit_mag: float = 22.0,
    sigma_floor: float = 0.01,
) -> Array:
    """Photometric uncertainty vs magnitude.

    sigma(m) = sigma_floor + exp(1.09 (m - limit));  ~sigma_floor for
    bright stars, ~0.1 mag near the survey limit — the usual background-
    limited error curve shape (reference: per-band exposure-time S/N model
    [SURVEY.md E4]; exact form config-tunable).
    """
    return sigma_floor + jnp.exp(1.09 * (mags - limit_mag))


def scatter_cluster(
    mags: Array,
    key,
    limit_mag: float = 22.0,
    bright_limit: float = -10.0,
    faint_limit: float = 30.0,
    sigma_floor: float = 0.01,
) -> ScatteredCatalog:
    sig = sigma_model(mags, limit_mag, sigma_floor)
    noisy = mags + sig * jax.random.normal(key, mags.shape)
    observed = (noisy > bright_limit) & (noisy < faint_limit)
    return ScatteredCatalog(
        mags=jnp.where(observed, noisy, 99.0),
        sigmas=jnp.where(observed, sig, -9.0),
    )
