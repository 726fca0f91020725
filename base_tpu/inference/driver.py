"""Checkpointed sampling driver: chunked HMC with save/resume.

Failure recovery for long runs (SURVEY.md §5 "failure detection /
checkpoint-resume" — absent in the reference): sampling proceeds in
host-level chunks of a jitted `sample_chunk`; after each chunk the full
run state (chain states incl. RNG keys, mass matrix, step size, the
preallocated sample store and the chunk cursor) is saved atomically.  A
re-launched run restores and continues; because chunk boundaries carry
the exact RNG keys, an interrupted+resumed run is bit-identical to an
uninterrupted one.

`run_checkpointed` is sampler-agnostic: it drives any (warm, step) pair
with the HMC state contract, so the single-device path
(run_hmc_checkpointed) and the shard_map path
(parallel.run.run_hmc_sharded_checkpointed) share one resume loop.
"""
from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from base_tpu.inference import hmc as hmc_mod
from base_tpu.io import checkpoint as ckpt


@dataclasses.dataclass(frozen=True)
class DriverConfig:
    checkpoint_path: str | None = None
    chunk_size: int = 100        # recorded samples per chunk
    checkpoint_every: int = 1    # chunks between saves
    on_window: Callable | None = None   # (chunk_idx, zs, lps) stream hook


def run_checkpointed(
    warm: Callable,   # (init_z, key) -> (chain_states, inv_mass, eps)
    step: Callable,   # (states, inv_mass, eps) -> (states, zs [C,n,P], lps, aps)
    init_z: Array,    # [C, P]
    key: Array,
    cfg: hmc_mod.HMCConfig,
    dcfg: DriverConfig = DriverConfig(),
):
    """Chunked warm+sample loop with atomic checkpoints and resume.

    Returns (samples [n_rec, C, P], info) exactly like run_hmc.  The
    chunk size also sets the streaming-diagnostics window: after every
    chunk, `dcfg.on_window(chunk_idx, zs, lps)` is called with the
    window's global samples (the in-run observability hook, SURVEY.md §5
    metrics plan).
    """
    C, P = init_z.shape
    n_rec = cfg.n_samples // cfg.thin
    n_chunks = max((n_rec + dcfg.chunk_size - 1) // dcfg.chunk_size, 1)
    chunk = min(dcfg.chunk_size, n_rec)

    def fresh_store():
        states, inv_mass, eps = warm(init_z, key)
        return dict(
            chain_state=states,
            inv_mass=inv_mass,
            eps=eps,
            samples=jnp.zeros((n_chunks * chunk, C, P)),
            logposts=jnp.zeros((n_chunks * chunk, C)),
            accepts=jnp.zeros((n_chunks,)),
            cursor=jnp.zeros((), jnp.int32),
        )

    store = None
    if dcfg.checkpoint_path and ckpt.checkpoint_exists(dcfg.checkpoint_path):
        like = jax.tree_util.tree_map(np.asarray, fresh_store())
        store = ckpt.restore_checkpoint(dcfg.checkpoint_path, like)
        store = jax.tree_util.tree_map(jnp.asarray, store)
    if store is None:
        store = fresh_store()

    start = int(store["cursor"])
    for ci in range(start, n_chunks):
        states, zs, lps, aps = step(
            store["chain_state"], store["inv_mass"], store["eps"]
        )
        lo = ci * chunk
        store["chain_state"] = states
        zs_t = jnp.swapaxes(zs, 0, 1)   # [n, C, P]
        lps_t = jnp.swapaxes(lps, 0, 1)
        store["samples"] = jax.lax.dynamic_update_slice(
            store["samples"], zs_t, (lo, 0, 0)
        )
        store["logposts"] = jax.lax.dynamic_update_slice(
            store["logposts"], lps_t, (lo, 0)
        )
        store["accepts"] = store["accepts"].at[ci].set(jnp.mean(aps))
        store["cursor"] = jnp.asarray(ci + 1, jnp.int32)
        if dcfg.checkpoint_path and (
            (ci + 1) % dcfg.checkpoint_every == 0 or ci + 1 == n_chunks
        ):
            ckpt.save_checkpoint(
                dcfg.checkpoint_path,
                jax.tree_util.tree_map(np.asarray, store),
            )
        if dcfg.on_window is not None:
            dcfg.on_window(ci, zs_t, lps_t)

    samples = store["samples"][:n_rec]
    info = dict(
        accept_prob=jnp.mean(store["accepts"]),
        step_size=store["eps"],
        inv_mass=store["inv_mass"],
        logposts=store["logposts"][:n_rec],
        final_states=store["chain_state"],
    )
    return samples, info


def run_hmc_checkpointed(
    logpost_fn: Callable,
    init_z: Array,   # [C, P]
    key: Array,
    cfg: hmc_mod.HMCConfig,
    dcfg: DriverConfig = DriverConfig(),
):
    """Single-device HMC with periodic checkpointing and automatic
    resume.  Returns (samples [n_rec, C, P], info) like run_hmc."""
    n_rec = cfg.n_samples // cfg.thin
    chunk = min(dcfg.chunk_size, n_rec)

    warm = jax.jit(
        lambda z, k: hmc_mod.warmup(
            logpost_fn, hmc_mod.init_chains(logpost_fn, z, k, cfg), cfg
        )
    )
    step = jax.jit(
        lambda st, im, eps: hmc_mod.sample_chunk(
            logpost_fn, st, im, eps, chunk, cfg
        )
    )
    return run_checkpointed(warm, step, init_z, key, cfg, dcfg)
