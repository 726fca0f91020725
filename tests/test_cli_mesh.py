"""CLI-path sharding + checkpoint/resume (VERDICT r1 item #3).

The reference has neither multi-device sharding nor resume; here the
production CLI must expose both: `single-pop --mesh C,S` runs the full
density over a (chains x stars) shard_map mesh, `--resume` survives a
SIGKILL mid-run and continues bit-identically, and `--metrics` streams
per-window R-hat/ESS rows during (not after) sampling [SURVEY.md §5].
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from base_tpu.io import res as resio
from base_tpu.tools.main import main

CFG = (
    "cluster:\n"
    "  starting_logAge: 9.5\n  starting_Fe_H: -0.3\n"
    "  starting_distMod: 8.0\n  starting_Av: 0.15\n"
    "  prior_Fe_H: -0.3\n  prior_distMod: 8.0\n  prior_Av: 0.15\n"
    "simCluster:\n  nStars: 40\n  percentBinary: 0.0\n"
    "scatterCluster:\n  limitMag: 26.0\n"
    "mcmc:\n  chains: 4\n  runIter: 320\n  warmup: 120\n"
    "  sampler: hmc\n  lMax: 8\n  noBinaries: true\n  denseMass: false\n"
)


@pytest.fixture(scope="module")
def photdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("climesh")
    cfg = d / "cfg.yaml"
    cfg.write_text(CFG)
    base = ["--config", str(cfg), "--seed", "5",
            "--outputFileBase", str(d / "sim")]
    main(["simulate"] + base)
    main(["scatter"] + base + ["--photFile", str(d / "sim.sim.phot")])
    return d


def _run(photdir, outbase, extra):
    main(
        ["single-pop", "--config", str(photdir / "cfg.yaml"),
         "--photFile", str(photdir / "sim.phot"),
         "--outputFileBase", str(photdir / outbase), "--seed", "5"]
        + extra
    )
    return resio.read_res(str(photdir / (outbase + ".res")))


def test_mesh_hmc_streams_window_metrics(photdir):
    """--mesh 4,2 on the 8-device CPU mesh + per-window JSONL rows."""
    mpath = photdir / "m.jsonl"
    chain = _run(photdir, "mesh", ["--mesh", "4,2", "--metrics", str(mpath)])
    assert chain.params.shape == (320, 9)
    assert np.isfinite(chain.logpost).all()
    assert abs(chain.params[:, 0].mean() - 9.5) < 0.2

    rows = [json.loads(l) for l in mpath.read_text().splitlines()]
    wins = [r for r in rows if r["event"] == "window"]
    assert len(wins) >= 2, "streaming diagnostics must emit per-window rows"
    assert all("rhat_logAge" in w and "ess_logAge" in w for w in wins)
    assert all(np.isfinite(w["logpost_mean"]) for w in wins)
    # windows streamed during the run: cumulative t strictly increases
    assert all(b["t"] > a["t"] for a, b in zip(wins, wins[1:]))


def test_mesh_matches_single_device(photdir):
    """The sharded CLI path must agree with the vmap path statistically
    (same model, same data; RNG streams differ by construction)."""
    a = _run(photdir, "plain", [])
    b = _run(photdir, "mesh2", ["--mesh", "2,4"])
    for j in (0, 2, 3):  # age, FeH, distMod
        sd = max(a.params[:, j].std(), 1e-4)
        assert abs(a.params[:, j].mean() - b.params[:, j].mean()) < 6 * sd


WORKER = r"""
import os, signal, sys
import jax
jax.config.update("jax_platforms", "cpu")

from base_tpu.io import checkpoint as ckpt

fault_after = int(sys.argv[1])
if fault_after > 0:
    real_save = ckpt.save_checkpoint
    n = [0]

    def dying_save(path, tree):
        real_save(path, tree)
        n[0] += 1
        if n[0] >= fault_after:
            os.kill(os.getpid(), signal.SIGKILL)

    ckpt.save_checkpoint = dying_save

from base_tpu.tools.main import main
main(sys.argv[2:])
print("DONE", flush=True)
"""


@pytest.mark.slow
def test_cli_kill_resume_bit_identical(photdir, tmp_path):
    """single-pop --resume: SIGKILL after the 2nd checkpoint, relaunch
    the same command line, final chain equals an uninterrupted run."""
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(__file__))
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    script = tmp_path / "worker.py"
    script.write_text(WORKER)

    def run(outbase, fault_after, mesh=None):
        argv = [
            sys.executable, str(script), str(fault_after),
            "single-pop", "--config", str(photdir / "cfg.yaml"),
            "--photFile", str(photdir / "sim.phot"),
            "--outputFileBase", str(photdir / outbase),
            "--seed", "5", "--resume",
        ]
        if mesh:
            argv += ["--mesh", mesh]
        return subprocess.run(
            argv, env=env, capture_output=True, text=True, timeout=900
        )

    r1 = run("faulted", fault_after=2, mesh="4,2")
    assert r1.returncode == -9, (r1.returncode, r1.stderr[-2000:])
    assert not os.path.exists(str(photdir / "faulted.res"))
    assert os.path.exists(str(photdir / "faulted.ckpt"))

    r2 = run("faulted", fault_after=0, mesh="4,2")
    assert r2.returncode == 0, r2.stderr[-2000:]

    r3 = run("clean", fault_after=0, mesh="4,2")
    assert r3.returncode == 0, r3.stderr[-2000:]

    a = resio.read_res(str(photdir / "faulted.res"))
    b = resio.read_res(str(photdir / "clean.res"))
    np.testing.assert_array_equal(a.params, b.params)
    np.testing.assert_array_equal(a.logpost, b.logpost)


def test_multipop_mesh_cli(photdir):
    """multi-pop --mesh: the multiPop density through the SAME sharded
    (chains x stars) machinery as single-pop (VERDICT r3 #3) — 12-param
    chain with the ordered Y_A < Y_B transform intact on the 8-device
    mesh."""
    main(
        ["multi-pop", "--config", str(photdir / "cfg.yaml"),
         "--photFile", str(photdir / "sim.phot"),
         "--outputFileBase", str(photdir / "mpmesh"), "--seed", "7",
         "--mesh", "4,2",
         "--set", "mcmc.runIter=192", "--set", "mcmc.warmup=96"]
    )
    raw = np.loadtxt(str(photdir / "mpmesh.mp.res"), skiprows=1)
    assert raw.shape == (192, 14)  # 12 params + logPost + chain
    assert np.isfinite(raw).all()
    ya, yb = raw[:, 9], raw[:, 10]
    assert (yb > ya).all()
    assert abs(raw[:, 0].mean() - 9.5) < 0.25


def test_multipop_mesh_resume_runs(photdir):
    """multi-pop --resume writes and consumes the .mp.ckpt checkpoint
    (smoke: two invocations — the second restores the finished store and
    rewrites identical output)."""
    argv = ["multi-pop", "--config", str(photdir / "cfg.yaml"),
            "--photFile", str(photdir / "sim.phot"),
            "--outputFileBase", str(photdir / "mpres"), "--seed", "7",
            "--resume",
            "--set", "mcmc.runIter=96", "--set", "mcmc.warmup=64"]
    main(argv)
    assert os.path.exists(str(photdir / "mpres.mp.ckpt"))
    a = np.loadtxt(str(photdir / "mpres.mp.res"), skiprows=1)
    main(argv)  # resumes from the completed checkpoint
    b = np.loadtxt(str(photdir / "mpres.mp.res"), skiprows=1)
    np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("sampler", ["nuts", "vi", "smc"])
def test_multipop_sampler_breadth(photdir, sampler):
    """multi-pop accepts every sampler the single-pop CLI does
    (VERDICT r4 #6): nuts/vi/smc run the 12-param ordered-transform
    density end to end at CI scale."""
    extra = ["--set", "mcmc.runIter=96", "--set", "mcmc.warmup=48"]
    if sampler == "smc":
        extra = ["--set", "mcmc.runIter=256", "--set", "mcmc.warmup=48"]
    main(
        ["multi-pop", "--config", str(photdir / "cfg.yaml"),
         "--photFile", str(photdir / "sim.phot"),
         "--outputFileBase", str(photdir / f"mp_{sampler}"), "--seed", "7",
         "--set", f"mcmc.sampler={sampler}"] + extra
    )
    raw = np.loadtxt(str(photdir / f"mp_{sampler}.mp.res"), skiprows=1)
    assert raw.shape[1] == 14  # 12 params + logPost + chain
    assert np.isfinite(raw[:, :12]).all()
    ya, yb = raw[:, 9], raw[:, 10]
    assert (yb > ya).all()
    assert abs(raw[:, 0].mean() - 9.5) < 0.3


def test_multipop_vi_mesh(photdir):
    """multi-pop sampler=vi under --mesh: the sharded ADVI path
    (parallel.run.run_vi_sharded) through the CLI."""
    main(
        ["multi-pop", "--config", str(photdir / "cfg.yaml"),
         "--photFile", str(photdir / "sim.phot"),
         "--outputFileBase", str(photdir / "mp_vi_mesh"), "--seed", "7",
         "--mesh", "4,2", "--set", "mcmc.sampler=vi",
         "--set", "mcmc.runIter=96", "--set", "mcmc.warmup=48"]
    )
    raw = np.loadtxt(str(photdir / "mp_vi_mesh.mp.res"), skiprows=1)
    assert np.isfinite(raw[:, :12]).all()
    assert abs(raw[:, 0].mean() - 9.5) < 0.3
