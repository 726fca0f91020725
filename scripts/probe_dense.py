"""Dense-metric + free_mask HMC on the bench posterior (CPU check).

Expectation: the age-FeH-mod ridge needs the dense metric; pinning the
flat unbounded IFMR dims (6-8) and carbonicity stops their random walk
from poisoning the pooled covariance.  Run: python -u scripts/probe_dense.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_platforms", "cpu")

import time
import numpy as np
import jax.numpy as jnp

from base_tpu.inference import diagnostics as diag
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
z0 = tr.inverse(jnp.asarray(truth))

cfg = HMCConfig(n_warmup=600, n_samples=400, l_max=12, n_windows=6,
                dense_mass=True,
                free_mask=(1, 1, 1, 1, 1, 0, 0, 0, 0))
init = jnp.tile(z0[None, :], (8, 1)) + 0.02 * jax.random.normal(
    jax.random.PRNGKey(2), (8, 9))
t0 = time.time()
zs, info = jax.jit(lambda z, k: run_hmc(fz, z, k, cfg))(
    init, jax.random.PRNGKey(4))
jax.block_until_ready(zs)
xs = np.asarray(jax.vmap(jax.vmap(tr.forward))(zs))
zs = np.asarray(zs)
print("wall:", round(time.time() - t0, 1))
print("accept:", round(float(info["accept_prob"]), 3),
      "eps:", round(float(info["step_size"]), 5))
im = np.asarray(info["inv_mass"])
print("inv_mass diag:", np.diag(im).round(4))
print("x-std:", xs.reshape(-1, 9).std(axis=0).round(5))
ess_h = np.asarray(diag.ess(jnp.asarray(xs)))
print("ess :", ess_h.round(1), "of", 8 * cfg.n_samples)
print("rhat:", np.asarray(diag.split_rhat(jnp.asarray(xs))).round(3))
