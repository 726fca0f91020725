"""Fault injection: a worker process is SIGKILLed mid-sampling and a
re-launched worker resumes from the on-disk checkpoint.

SURVEY.md §5 failure-detection plan: the reference loses the run on a
crash; here the checkpointed driver must make kill + resume bit-identical
to an uninterrupted run (chunk boundaries carry exact RNG state)."""
from __future__ import annotations

import os
import subprocess
import sys

import numpy as np
import pytest

WORKER = r"""
import os, signal, sys
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from base_tpu.inference import hmc
from base_tpu.inference.driver import DriverConfig, run_hmc_checkpointed
from base_tpu.io import checkpoint as ckpt

ckpt_path, out_path, fault_after = sys.argv[1], sys.argv[2], int(sys.argv[3])

if fault_after > 0:
    # Die the hard way (SIGKILL: no cleanup, no atexit) after the Nth
    # checkpoint write completes — a genuine mid-run host failure.
    real_save = ckpt.save_checkpoint
    n_saves = [0]

    def dying_save(path, tree):
        real_save(path, tree)
        n_saves[0] += 1
        if n_saves[0] >= fault_after:
            os.kill(os.getpid(), signal.SIGKILL)

    ckpt.save_checkpoint = dying_save

def logpost(z):
    return -0.5 * jnp.sum(z * z) - 0.1 * jnp.sum(z ** 4)

init = jax.random.normal(jax.random.PRNGKey(3), (4, 2))
key = jax.random.PRNGKey(4)
cfg = hmc.HMCConfig(n_warmup=60, n_samples=120, l_max=8, n_windows=2)
samples, info = run_hmc_checkpointed(
    logpost, init, key, cfg,
    DriverConfig(checkpoint_path=ckpt_path, chunk_size=30),
)
np.save(out_path, np.asarray(samples))
print("DONE", flush=True)
"""


@pytest.mark.slow
def test_kill_and_resume_bit_identical(tmp_path):
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(__file__))
    env.pop("XLA_FLAGS", None)
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    ck_a = str(tmp_path / "ck_fault")
    ck_b = str(tmp_path / "ck_clean")
    out_a = str(tmp_path / "a.npy")
    out_b = str(tmp_path / "b.npy")

    def run(ckpt_path, out, fault_after):
        return subprocess.run(
            [sys.executable, str(script), ckpt_path, out, str(fault_after)],
            env=env, capture_output=True, text=True, timeout=600,
        )

    # Worker 1: killed after the 2nd of 4 chunk checkpoints.
    r1 = run(ck_a, out_a, fault_after=2)
    assert r1.returncode == -9, (r1.returncode, r1.stderr[-2000:])
    assert not os.path.exists(out_a)

    # Worker 2: resumes from the survivor checkpoint, runs to completion.
    r2 = run(ck_a, out_a, fault_after=0)
    assert r2.returncode == 0, r2.stderr[-2000:]

    # Reference: one uninterrupted run.
    r3 = run(ck_b, out_b, fault_after=0)
    assert r3.returncode == 0, r3.stderr[-2000:]

    np.testing.assert_array_equal(np.load(out_a), np.load(out_b))
