"""Forward cluster simulation — the simCluster equivalent.

TPU-native rebuild of the reference simulator [upstream: simCluster/ —
SURVEY.md E3, §3.3]: draw ZAMS masses from the IMF, assign binaries,
evolve every star through the *same* model grids the sampler uses (one
pure function, vmapped), and emit noiseless photometry.  Unlike the C++
(per-star scalar loop), the whole cluster evaluates as one batched
isochrone lookup.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import Array

from base_tpu import constants as C
from base_tpu.grids import filters as filt
from base_tpu.grids.isochrone import IsochroneGrid, derive_isochrone

LN10_04 = 0.9210340371976184


class SimCatalog(NamedTuple):
    mags: Array       # [S, B] noiseless apparent magnitudes
    mass1: Array      # [S] primary ZAMS mass
    mass_ratio: Array # [S] secondary/primary (0 = single)
    is_binary: Array  # [S] bool


def sample_imf_masses(key, n: int, lo: float, hi: float) -> Array:
    """Truncated-lognormal IMF draws: log10 M ~ N(mu, sig) on [lo, hi]."""
    zlo = (jnp.log10(lo) - C.IMF_LOG_MEAN) / C.IMF_LOG_SIGMA
    zhi = (jnp.log10(hi) - C.IMF_LOG_MEAN) / C.IMF_LOG_SIGMA
    z = jax.random.truncated_normal(key, zlo, zhi, (n,))
    return 10.0 ** (C.IMF_LOG_MEAN + C.IMF_LOG_SIGMA * z)


def simulate_cluster(
    grid: IsochroneGrid,
    params: Array,
    n_stars: int,
    key,
    percent_binary: float = 0.3,
    min_mass: float = 0.2,
) -> SimCatalog:
    """Simulate a single-population cluster at truth `params` (9-vector).

    MS/RGB stars only (masses truncated below the AGB tip); the WD branch
    joins once the cooling/atmosphere models land (SURVEY.md §7 step 6).
    """
    age = params[C.Param.AGE]
    y = params[C.Param.YYY]
    feh = params[C.Param.FEH]
    mod = params[C.Param.MOD]
    av = params[C.Param.ABS]

    iso = derive_isochrone(grid, feh, y, age)
    k1, k2, k3 = jax.random.split(key, 3)

    hull_max = jnp.max(jnp.where(iso.valid > 0.5, iso.mass, 0.0))
    m1 = sample_imf_masses(k1, n_stars, min_mass, float(hull_max) * 0.999)
    is_binary = jax.random.uniform(k2, (n_stars,)) < percent_binary
    q = jnp.where(is_binary, jax.random.uniform(k3, (n_stars,)), 0.0)

    dist = mod + av * jnp.asarray(filt.absorption_coefs(grid.bands))
    app1 = iso.mags_at_mass(m1) + dist  # [S, B]
    m2 = q * m1
    app2 = iso.mags_at_mass(m2) + dist
    lit = (m2 >= iso.min_mass)[:, None]
    f = jnp.exp(-LN10_04 * app1) + jnp.where(
        lit, jnp.exp(-LN10_04 * app2), 0.0
    )
    mags = -(1.0 / LN10_04) * jnp.log(f)
    return SimCatalog(mags=mags, mass1=m1, mass_ratio=q, is_binary=is_binary)
