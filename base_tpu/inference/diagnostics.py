"""Convergence diagnostics: split R-hat, ESS, and cross-chain summaries.

The reference computes no diagnostics in-process (acceptance ratios only;
R-hat/ESS are left to external R scripts [SURVEY.md §5 metrics]).  Here
they are first-class and on-device: pure jnp over [N, C, P] sample
stacks, so they run jitted on the chip that holds the chains, and a
`psum`/`all_gather` variant (see base_tpu.parallel) combines sharded
chains without ever gathering raw samples to the host.

Methods: split-R-hat and rank-normalization-free ESS per Vehtari,
Gelman et al. 2021 ("Rank-normalization, folding, and localization"),
with Geyer initial-positive-sequence truncation for the autocorrelation
sum.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from jax import Array


class ChainStats(NamedTuple):
    """Sufficient statistics of one chain batch for pooled diagnostics.

    Combining across shards is exact: means/vars pool via standard
    parallel-variance formulas (all fields are [C, P]; reduce the C axis
    after an all_gather of these small tensors, never of the samples).
    """

    mean: Array       # [C, P] per-chain mean
    var: Array        # [C, P] per-chain (ddof=1) variance
    n: Array          # scalar draws per chain


def chain_stats(samples: Array) -> ChainStats:
    """samples [N, C, P] -> per-chain sufficient statistics."""
    n = samples.shape[0]
    mean = jnp.mean(samples, axis=0)
    var = jnp.var(samples, axis=0, ddof=1)
    return ChainStats(mean=mean, var=var, n=jnp.asarray(n, jnp.float32))


def rhat_from_stats(stats: ChainStats) -> Array:
    """Gelman-Rubin potential-scale-reduction from per-chain stats. [P]"""
    n = stats.n
    w = jnp.mean(stats.var, axis=0)                       # within
    b = n * jnp.var(stats.mean, axis=0, ddof=1)           # between
    var_plus = (n - 1.0) / n * w + b / n
    return jnp.sqrt(var_plus / jnp.maximum(w, 1e-30))


def split_rhat(samples: Array) -> Array:
    """Split-R-hat: halve each chain before computing R-hat.  [P]

    samples [N, C, P]; N is truncated to even.
    """
    n = samples.shape[0] - (samples.shape[0] % 2)
    x = samples[:n]
    half = n // 2
    split = jnp.concatenate([x[:half], x[half:]], axis=1)  # [half, 2C, P]
    return rhat_from_stats(chain_stats(split))


def _autocov(x: Array) -> Array:
    """Biased autocovariance of x [N, ...] along axis 0 via FFT."""
    n = x.shape[0]
    xc = x - jnp.mean(x, axis=0, keepdims=True)
    # Zero-pad to 2n for linear (non-circular) correlation.
    f = jnp.fft.rfft(xc, n=2 * n, axis=0)
    acov = jnp.fft.irfft(f * jnp.conj(f), n=2 * n, axis=0)[:n]
    return jnp.real(acov) / n


def ess(samples: Array) -> Array:
    """Effective sample size per parameter, pooled across chains.  [P]

    samples [N, C, P].  Uses the multi-chain rho_t estimator of Vehtari
    et al. (combining W, B and per-chain autocovariances) and Geyer's
    initial-positive-sequence: sum paired correlations until a pair goes
    negative.  All static shapes; the cutoff is a masked cumulative
    product, not data-dependent control flow.
    """
    n, c, p = samples.shape
    acov = jnp.mean(_autocov(samples), axis=1)            # [N, P] mean over chains
    w = jnp.mean(jnp.var(samples, axis=0, ddof=1), axis=0)  # [P]
    mean_per_chain = jnp.mean(samples, axis=0)              # [C, P]
    if c > 1:
        b_over_n = jnp.var(mean_per_chain, axis=0, ddof=1)
    else:
        b_over_n = jnp.zeros((p,))
    var_plus = (n - 1.0) / n * w + b_over_n
    rho = 1.0 - (w - acov) / jnp.maximum(var_plus, 1e-30)   # [N, P]

    # Geyer pairs: P_k = rho_{2k} + rho_{2k+1}, k >= 0 (rho_0 = 1 included
    # implicitly via the tau formula below).
    n_pairs = n // 2
    pairs = rho[0 : 2 * n_pairs : 2] + rho[1 : 2 * n_pairs : 2]  # [n_pairs, P]
    pos = pairs > 0.0
    # keep while all previous pairs (from k=1; k=0 always kept) positive
    keep = jnp.cumprod(pos.astype(jnp.float32), axis=0)
    keep = keep.at[0].set(1.0)
    # Monotone decreasing envelope (initial monotone sequence).
    mono = jnp.minimum.accumulate(jnp.where(keep > 0, pairs, jnp.inf), axis=0)
    contrib = jnp.where(keep > 0, jnp.maximum(mono, 0.0), 0.0)
    tau = -1.0 + 2.0 * jnp.sum(contrib, axis=0)             # rho_0 counted twice
    tau = jnp.maximum(tau, 1.0 / n)
    return (n * c) / tau


def summarize(samples: Array, param_names=None) -> dict:
    """Host-side convenience: dict of mean/sd/rhat/ess arrays."""
    import numpy as np

    out = dict(
        mean=np.asarray(jnp.mean(samples, axis=(0, 1))),
        sd=np.asarray(jnp.std(samples, axis=(0, 1))),
        rhat=np.asarray(split_rhat(samples)),
        ess=np.asarray(ess(samples)),
    )
    if param_names is not None:
        out["names"] = list(param_names)
    return out
