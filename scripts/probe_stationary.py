"""Is the HMC stationary distribution biased vs MH on the SBC model?

One fixed dataset; long adaptive-MH (x-space, no transform) vs long HMC
(z-space + Jacobian).  If the FeH means disagree beyond joint MC error,
the HMC path (transform/Jacobian/sampler) has a stationary bias; if they
agree, the SBC skew is finite-chain transient.
Run: python -u scripts/probe_stationary.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_platforms", "cpu")

import dataclasses
import numpy as np
import jax.numpy as jnp

from base_tpu import constants as C
from base_tpu.grids import synthetic
from base_tpu.inference import diagnostics as diag
from base_tpu.inference import mh
from base_tpu.inference.hmc import HMCConfig, run_hmc
from base_tpu.model import posterior as post
from base_tpu.model.stardata import make_ms_stars
from base_tpu.sim.scatter import scatter_cluster
from base_tpu.sim.simulate import simulate_cluster

small_grid = synthetic.make_grid(
    feh_axis=np.linspace(-1.5, 0.3, 4),
    y_axis=np.linspace(0.24, 0.31, 3),
    age_axis=np.linspace(8.6, 10.1, 6),
    n_eep=48,
)
BASE = np.array([9.3, 0.27, -0.5, 10.0, 0.3, 0.5, 0, 0, 0], np.float32)
PRIOR_SIGMA = np.array([0.12, -1, 0.22, 0.25, 0.08, -1, -1, -1, -1], np.float32)

# replica r=4 of the SBC run (one of the high-rank ones): rebuild dataset
rng = np.random.default_rng(11)
truths = np.tile(BASE, (64, 1))
for p in [C.Param.AGE, C.Param.FEH, C.Param.MOD, C.Param.ABS]:
    z = np.clip(rng.standard_normal(64), -2.5, 2.5)
    truths[:, p] += PRIOR_SIGMA[p] * z
r = 4
truth = truths[r]
print("truth:", truth[:5])
cat = simulate_cluster(small_grid, jnp.asarray(truth), 32,
                       jax.random.PRNGKey(100 + r), percent_binary=0.0)
sc = scatter_cluster(cat.mags, jax.random.PRNGKey(200 + r), limit_mag=33.0)
stars = make_ms_stars(np.asarray(sc.mags), np.asarray(sc.sigmas),
                      cm_prior=0.999)
frame = post.make_single_pop_model(small_grid, stars, prior_mean=BASE,
                                   prior_sigma=PRIOR_SIGMA, n_q=4,
                                   binaries=False)
f = post.make_logpost_fn(frame)
tr = post.default_transform(frame)
fz = post.make_logpost_z_fn(frame, tr)

# --- long MH, 4 chains -------------------------------------------------------
step0 = jnp.asarray([0.04, 0.02, 0.05, 0.05, 0.03, 0, 0, 0, 0], jnp.float32)
cfg_mh = mh.MHConfig(n_stage1=400, n_stage2=400, n_main=12000)
s_mh, _ = jax.jit(jax.vmap(
    lambda k: mh.run_adaptive_mh(f, jnp.asarray(truth), k, step0, cfg_mh)
))(jax.random.split(jax.random.PRNGKey(42), 4))
s_mh = np.asarray(s_mh).reshape(-1, 9)
ess_mh = np.asarray(diag.ess(jnp.asarray(np.swapaxes(
    np.asarray(s_mh).reshape(4, -1, 9), 0, 1))))
print("MH  mean5:", s_mh[:, :5].mean(axis=0).round(4),
      "sd5:", s_mh[:, :5].std(axis=0).round(4), "ess:", ess_mh[:5].round(0))

# --- long HMC, 8 chains ------------------------------------------------------
cfg_h = HMCConfig(n_warmup=384, n_samples=1500, l_max=16, n_windows=4,
                  dense_mass=True, free_mask=(1, 1, 1, 1, 1, 0, 0, 0, 0))
z0 = tr.inverse(jnp.asarray(truth))[None, :]
init = jnp.tile(z0, (8, 1)) + 0.02 * jax.random.normal(
    jax.random.PRNGKey(3), (8, 9))
zs, info = jax.jit(lambda z, k: run_hmc(fz, z, k, cfg_h))(
    init, jax.random.PRNGKey(7))
xs = np.asarray(jax.vmap(jax.vmap(tr.forward))(zs))
flat = xs.reshape(-1, 9)
ess_h = np.asarray(diag.ess(jnp.asarray(xs)))
print("HMC mean5:", flat[:, :5].mean(axis=0).round(4),
      "sd5:", flat[:, :5].std(axis=0).round(4), "ess:", ess_h[:5].round(0),
      "accept:", round(float(info["accept_prob"]), 3))
print("rank_mh (feh):", float((s_mh[:, 2] < truth[2]).mean()).__round__(4),
      "rank_hmc (feh):", float((flat[:, 2] < truth[2]).mean()).__round__(4))
