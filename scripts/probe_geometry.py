"""Compare long-run adaptive-MH vs HMC marginals on the bench posterior.

If HMC z-space stds are far below MH's, HMC chains are trapped (micro-
modes / bad metric); if they agree, mixing is just slow.  CPU backend.
Run: python -u scripts/probe_geometry.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from base_tpu.inference import diagnostics as diag
from base_tpu.inference import mh
from base_tpu.inference.hmc import HMCConfig, run_hmc
from base_tpu.grids import synthetic
from base_tpu.model import posterior as post
from base_tpu.model.stardata import make_ms_stars
from base_tpu.sim.scatter import scatter_cluster
from base_tpu.sim.simulate import simulate_cluster

truth = np.array([9.3, 0.27, -0.5, 10.0, 0.3, 0.5, 0, 0, 0], np.float32)
grid = synthetic.make_grid(n_eep=48)
n_stars = 60
cat = simulate_cluster(grid, jnp.asarray(truth), n_stars, jax.random.PRNGKey(0),
                       percent_binary=0.3)
sc = scatter_cluster(cat.mags, jax.random.PRNGKey(1), limit_mag=24.0)
stars = make_ms_stars(np.asarray(sc.mags), np.asarray(sc.sigmas), cm_prior=0.99)
model = post.make_single_pop_model(
    grid, stars, prior_mean=truth,
    prior_sigma=np.array([-1, -1, 0.3, 0.2, 0.1, -1, -1, -1, -1], np.float32),
    n_q=8)
tr = post.default_transform(model)
fz = post.make_logpost_z_fn(model, tr)
f = post.make_logpost_fn(model)
z0 = tr.inverse(jnp.asarray(truth))

# --- long adaptive MH, 4 chains ---------------------------------------------
step0 = jnp.asarray([0.03, 0.01, 0.05, 0.05, 0.03, 0.05, 0, 0, 0], jnp.float32)
cfg_mh = mh.MHConfig(n_stage1=500, n_stage2=500, n_main=8000)
keys = jax.random.split(jax.random.PRNGKey(11), 4)
x0 = jnp.tile(jnp.asarray(truth)[None, :], (4, 1))


def run_one(x, k):
    s, info = mh.run_adaptive_mh(f, x, k, step0, cfg_mh)
    return s, info["accept_rate"]


s_mh, acc = jax.jit(jax.vmap(run_one))(x0, keys)   # [4, n, 9]
s_mh = np.asarray(s_mh)
z_mh = np.asarray(jax.vmap(jax.vmap(tr.inverse))(jnp.asarray(s_mh)))
print("MH accept:", np.asarray(acc).round(3))
print("MH x-std :", s_mh.reshape(-1, 9).std(axis=0).round(5))
print("MH z-std :", z_mh.reshape(-1, 9).std(axis=0).round(5))
ess_mh = np.asarray(diag.ess(jnp.asarray(np.swapaxes(s_mh, 0, 1))))
print("MH ess   :", ess_mh.round(1), "of", 4 * cfg_mh.n_main)

# --- HMC, 8 chains, generous warmup ------------------------------------------
cfg_h = HMCConfig(n_warmup=600, n_samples=400, l_max=12, n_windows=6)
init = jnp.tile(z0[None, :], (8, 1)) + 0.02 * jax.random.normal(
    jax.random.PRNGKey(2), (8, 9))
zs, info = jax.jit(lambda z, k: run_hmc(fz, z, k, cfg_h))(
    init, jax.random.PRNGKey(4))
xs = np.asarray(jax.vmap(jax.vmap(tr.forward))(zs))
zs = np.asarray(zs)
print("HMC accept:", round(float(info["accept_prob"]), 3),
      "eps:", round(float(info["step_size"]), 5))
print("HMC inv_mass:", np.asarray(info["inv_mass"]).round(5))
print("HMC x-std:", xs.reshape(-1, 9).std(axis=0).round(5))
print("HMC z-std:", zs.reshape(-1, 9).std(axis=0).round(5))
ess_h = np.asarray(diag.ess(jnp.asarray(xs)))
print("HMC ess  :", ess_h.round(1), "of", 8 * cfg_h.n_samples)

# --- density slice: is it jagged at small scales? -----------------------------
# scan logpost along age through the truth at three resolutions
for half, n in [(0.02, 81), (0.002, 81)]:
    ages = np.linspace(truth[0] - half, truth[0] + half, n, dtype=np.float32)
    xs_scan = np.tile(truth, (n, 1))
    xs_scan[:, 0] = ages
    lps = np.asarray(jax.vmap(f)(jnp.asarray(xs_scan)))
    d2 = np.diff(lps, 2)
    print(f"age slice +-{half}: lp range {lps.max()-lps.min():.3f} "
          f"max|d2|={np.abs(d2).max():.4f} sign flips of d1: "
          f"{int((np.diff(np.sign(np.diff(lps))) != 0).sum())}")
