"""Two-population (helium-spread) cluster model — the multiPopMcmc
equivalent.

TPU-native rebuild of the reference multi-pop sampler's density
[upstream: multiPopMcmc/MpiMcmcApplication.cpp, extended param enum
YYA/YYB/LAMBDA — SURVEY.md E2, §3.5; Stenning et al. 2016, NGC 2808-style
per BASELINE.json:10]: the parameter vector grows to 12 (the 9 shared
slots — Y slot unused — plus Y_A, Y_B, lambda), `logPostStep` derives
TWO isochrones per proposal, and each star's marginal likelihood is the
lambda-weighted mixture of its per-population marginals, computed before
the field-star mixing.

The population indicator is marginalized (not Gibbs-sampled as the
reference may do) so the density stays differentiable end to end —
SURVEY.md §7 hard-part #3.  Identifiability: Y_A < Y_B is enforced by
the sampling transform, not the density.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from base_tpu import constants as C
from base_tpu.grids import filters as filt
from base_tpu.grids.isochrone import IsochroneGrid, derive_isochrone
from base_tpu.model import likelihood as lk
from base_tpu.model.priors import ClusterPriors
from base_tpu.model.stardata import MSStars
from base_tpu.ops.special import NEG_INF
from base_tpu.utils.transforms import make_interval_transform

NPARAMS_MP = 12
MP_YYA = 9
MP_YYB = 10
MP_LAMBDA = 11

MP_PARAM_NAMES = C.PARAM_NAMES + ("Y_A", "Y_B", "lambda")


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MultiPopModel:
    grid: IsochroneGrid
    stars: MSStars
    priors: ClusterPriors    # over the 12-vector
    q_grid: Array
    abs_coefs: Array
    binaries: bool = dataclasses.field(metadata=dict(static=True), default=True)
    uniform_q: bool = dataclasses.field(metadata=dict(static=True), default=False)


def make_multipop_model(
    grid: IsochroneGrid,
    stars: MSStars,
    prior_mean: np.ndarray,   # [12]
    prior_sigma: np.ndarray,  # [12]; <= 0 flat
    n_q: int = 16,
    binaries: bool = True,
    uniform_q: bool = False,
) -> MultiPopModel:
    return MultiPopModel(
        grid=grid,
        stars=stars,
        priors=ClusterPriors(
            mean=jnp.asarray(prior_mean, jnp.float32),
            sigma=jnp.asarray(prior_sigma, jnp.float32),
        ),
        q_grid=jnp.linspace(0.0, 1.0, n_q, dtype=jnp.float32),
        abs_coefs=jnp.asarray(filt.absorption_coefs(grid.bands)),
        binaries=binaries,
        uniform_q=uniform_q,
    )


def log_post(model: MultiPopModel, params: Array) -> Array:
    """Un-normalized log posterior of the 12-vector."""
    age = params[C.Param.AGE]
    feh = params[C.Param.FEH]
    mod = params[C.Param.MOD]
    av = params[C.Param.ABS]
    ya = params[MP_YYA]
    yb = params[MP_YYB]
    lam = params[MP_LAMBDA]

    def marginals(y):
        iso = derive_isochrone(model.grid, feh, y, age)
        table = lk.build_segment_table(
            iso, model.q_grid, mod, av, model.abs_coefs,
            binaries=model.binaries, uniform_q=model.uniform_q,
        )
        return lk.ms_star_log_marginals(model.stars, table), iso.in_bounds

    la, in_a = marginals(ya)   # population A: fraction lambda
    lb, in_b = marginals(yb)   # population B: fraction 1 - lambda
    lam_c = jnp.clip(lam, 1e-6, 1.0 - 1e-6)
    a = jnp.log(lam_c) + la
    b = jnp.log1p(-lam_c) + lb
    m = jnp.maximum(a, b)
    log_clust = m + jnp.log(jnp.exp(a - m) + jnp.exp(b - m))   # [S]

    stars = model.stars
    fa = stars.log_cm + log_clust
    fb = stars.log_1m_cm + stars.field_logdens
    mm = jnp.maximum(fa, fb)
    per_star = mm + jnp.log(jnp.exp(fa - mm) + jnp.exp(fb - mm))
    per_star = jnp.maximum(per_star, NEG_INF)
    ll = jnp.sum(per_star * stars.star_mask)

    lp = model.priors.log_prior(params)
    ok = in_a & in_b & (lam > 0.0) & (lam < 1.0)
    return jnp.where(ok, ll + lp, NEG_INF)


def make_logpost_fn(model: MultiPopModel):
    def f(params: Array) -> Array:
        return log_post(model, params)

    return f


def default_transform(model: MultiPopModel, margin: float = 1e-3):
    """12-vector interval transform; Y_A/Y_B bounded by the grid's Y hull
    (callers wanting strict Y_A < Y_B should initialize ordered — the
    mixture is label-symmetric otherwise)."""
    g = model.grid
    lo = np.full(NPARAMS_MP, -np.inf, np.float32)
    hi = np.full(NPARAMS_MP, np.inf, np.float32)

    def span(ax):
        a0, a1 = float(ax[0]), float(ax[-1])
        d = (a1 - a0) * margin
        return a0 + d, a1 - d

    lo[C.Param.AGE], hi[C.Param.AGE] = span(g.age)
    lo[C.Param.FEH], hi[C.Param.FEH] = span(g.feh)
    lo[C.Param.YYY], hi[C.Param.YYY] = span(g.y)   # unused slot, kept sane
    lo[C.Param.ABS], hi[C.Param.ABS] = 0.0, 10.0
    lo[C.Param.CARBONICITY], hi[C.Param.CARBONICITY] = 0.0, 1.0
    lo[MP_YYA], hi[MP_YYA] = span(g.y)
    lo[MP_YYB], hi[MP_YYB] = span(g.y)
    lo[MP_LAMBDA], hi[MP_LAMBDA] = 0.0, 1.0
    return make_interval_transform(lo, hi)


def make_logpost_z_fn(model: MultiPopModel, transform):
    def f(z: Array) -> Array:
        x = transform.forward(z)
        return log_post(model, x) + transform.log_det_jacobian(z)

    return f
