"""ADVI-style variational inference over the cluster log density.

The reference has no VI; it is required by the north star
(BASELINE.json:5 "NUTS/HMC, VI, and SMC").  Standard ADVI (Kucukelbir et
al. 2017): a Gaussian family in the *unconstrained* space of
utils.transforms (mean-field diagonal or full-rank Cholesky), fitted by
maximizing the reparameterized ELBO with Adam.  The ELBO gradient is
just grad through `logpost_z` — the same jitted density the samplers
use — so VI costs one batched density eval per step and serves as a
fast initializer for HMC/SMC (posterior-shaped init + mass matrix).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax import Array


@dataclasses.dataclass(frozen=True)
class VIConfig:
    n_steps: int = 1500
    n_mc: int = 16            # MC samples per ELBO gradient
    learning_rate: float = 2e-2
    full_rank: bool = False
    init_log_sd: float = -2.0


class VIResult(NamedTuple):
    mu: Array          # [P]
    scale: Array       # [P] (mean-field sd) or [P, P] (Cholesky factor)
    elbo_trace: Array  # [n_steps]
    final_elbo: Array


def _sample_and_entropy(params, key, n_mc: int, full_rank: bool):
    mu = params["mu"]
    P = mu.shape[0]
    eps = jax.random.normal(key, (n_mc, P))
    if full_rank:
        # scale_tril parameterized by packed lower triangle with
        # softplus-positive diagonal for identifiability.
        tril = params["tril"]
        diag = jax.nn.softplus(jnp.diagonal(tril)) + 1e-6
        L = jnp.tril(tril, -1) + jnp.diag(diag)
        z = mu[None, :] + eps @ L.T
        entropy = jnp.sum(jnp.log(diag)) + 0.5 * P * (
            1.0 + jnp.log(2.0 * jnp.pi)
        )
    else:
        sd = jnp.exp(params["log_sd"])
        z = mu[None, :] + eps * sd[None, :]
        entropy = jnp.sum(params["log_sd"]) + 0.5 * P * (
            1.0 + jnp.log(2.0 * jnp.pi)
        )
    return z, entropy


def run_vi(
    logpost_z: Callable[[Array], Array],
    init_mu: Array,
    key: Array,
    cfg: VIConfig = VIConfig(),
) -> VIResult:
    """Fit the Gaussian family; fully traceable (jit yourself)."""
    P = init_mu.shape[0]
    if cfg.full_rank:
        params = dict(
            mu=init_mu,
            tril=jnp.diag(jnp.full((P,), cfg.init_log_sd)),
        )
    else:
        params = dict(
            mu=init_mu, log_sd=jnp.full((P,), cfg.init_log_sd)
        )

    opt = optax.adam(cfg.learning_rate)
    opt_state = opt.init(params)

    def neg_elbo(params, k):
        z, entropy = _sample_and_entropy(params, k, cfg.n_mc, cfg.full_rank)
        lp = jax.vmap(logpost_z)(z)
        return -(jnp.mean(lp) + entropy)

    def step(carry, k):
        params, opt_state = carry
        loss, g = jax.value_and_grad(neg_elbo)(params, k)
        updates, opt_state = opt.update(g, opt_state)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), -loss

    keys = jax.random.split(key, cfg.n_steps)
    (params, _), elbos = jax.lax.scan(step, (params, opt_state), keys)

    if cfg.full_rank:
        diag = jax.nn.softplus(jnp.diagonal(params["tril"])) + 1e-6
        L = jnp.tril(params["tril"], -1) + jnp.diag(diag)
        scale = L
    else:
        scale = jnp.exp(params["log_sd"])
    return VIResult(
        mu=params["mu"], scale=scale, elbo_trace=elbos,
        final_elbo=jnp.mean(elbos[-50:]),
    )


def sample_posterior(res: VIResult, key: Array, n: int) -> Array:
    """Draw n samples from the fitted family (unconstrained space)."""
    P = res.mu.shape[0]
    eps = jax.random.normal(key, (n, P))
    if res.scale.ndim == 2:
        return res.mu[None, :] + eps @ res.scale.T
    return res.mu[None, :] + eps * res.scale[None, :]
