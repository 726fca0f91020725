"""Checkpoint/resume for sampler state.

The reference has NO resume — a crash loses the run, its only
persistence being the append-only .res rows [SURVEY.md §5].  Here
checkpointing is first-class: the full sampler state (chain positions,
cached log-posts/gradients, RNG keys, adaptation state, iteration
counter, accumulated samples) is one pytree, saved atomically with
Orbax and restored bit-exactly, so a killed run resumes mid-sampling
with identical results to an uninterrupted one (determinism test:
tests/test_checkpoint.py).
"""
from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np

try:  # Orbax is the preferred backend (async-capable, multi-host aware).
    import orbax.checkpoint as ocp

    _HAVE_ORBAX = True
except Exception:  # pragma: no cover
    _HAVE_ORBAX = False


def save_checkpoint(path: str, tree: Any) -> None:
    """Atomically save a pytree checkpoint (overwrites `path`)."""
    path = os.path.abspath(path)
    if _HAVE_ORBAX:
        ckptr = ocp.StandardCheckpointer()
        tmp = path + ".tmp"
        if os.path.exists(tmp):
            import shutil

            shutil.rmtree(tmp)
        ckptr.save(tmp, tree)
        ckptr.wait_until_finished()
        if os.path.exists(path):
            import shutil

            shutil.rmtree(path)
        os.replace(tmp, path)
    else:  # pragma: no cover — flat-npz fallback
        leaves, treedef = jax.tree_util.tree_flatten(tree)
        np.savez(
            path + ".npz",
            __treedef__=np.frombuffer(
                repr(treedef).encode(), dtype=np.uint8
            ),
            **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)},
        )


def restore_checkpoint(path: str, like: Any) -> Any:
    """Restore a checkpoint into the structure of `like` (a pytree with
    the right shapes/dtypes, e.g. the freshly-initialized state)."""
    path = os.path.abspath(path)
    if _HAVE_ORBAX:
        ckptr = ocp.StandardCheckpointer()
        return ckptr.restore(path, target=like)
    z = np.load(path + ".npz")  # pragma: no cover
    leaves, treedef = jax.tree_util.tree_flatten(like)
    new_leaves = [z[f"leaf_{i}"] for i in range(len(leaves))]
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def checkpoint_exists(path: str) -> bool:
    return os.path.exists(path) or os.path.exists(path + ".npz")
