"""Regenerate tests/data/golden_singlepop.json after an intentional
density change (the goldens guard refactors, not the model definition —
see tests/test_goldens.py).

Long reference-mode run: 4 adaptive-MH chains on the pinned scenario.
Run from /root/repo:  python -u scripts/regen_goldens.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_platforms", "cpu")

import json

import numpy as np
import jax.numpy as jnp

from base_tpu.grids import synthetic
from base_tpu.inference import mh
from base_tpu.model import posterior as post
from base_tpu.model.stardata import make_ms_stars
from base_tpu.sim.scatter import scatter_cluster
from base_tpu.sim.simulate import simulate_cluster

TRUTH = np.array([9.3, 0.27, -0.5, 10.0, 0.3, 0.5, 0, 0, 0], np.float32)
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "data", "golden_singlepop.json")

grid = synthetic.make_grid(
    feh_axis=np.linspace(-1.5, 0.3, 4),
    y_axis=np.linspace(0.24, 0.31, 3),
    age_axis=np.linspace(8.6, 10.1, 6),
    n_eep=48,
)
cat = simulate_cluster(grid, jnp.asarray(TRUTH), 64,
                       jax.random.PRNGKey(77), percent_binary=0.3)
sc = scatter_cluster(cat.mags, jax.random.PRNGKey(78), limit_mag=24.0)
stars = make_ms_stars(np.asarray(sc.mags), np.asarray(sc.sigmas),
                      cm_prior=0.99)
model = post.make_single_pop_model(
    grid, stars, prior_mean=TRUTH,
    prior_sigma=np.array([-1, -1, 0.3, 0.2, 0.1, -1, -1, -1, -1], np.float32),
    n_q=8,
)
f_lp = post.make_logpost_fn(model)
lp_truth = float(f_lp(jnp.asarray(TRUTH)))
print("logpost at truth:", lp_truth)

step0 = jnp.asarray([0.05, 0.02, 0.05, 0.05, 0.03, 0, 0, 0, 0], jnp.float32)
cfg = mh.MHConfig(n_stage1=500, n_stage2=500, n_main=12000)
samples, info = jax.jit(jax.vmap(
    lambda k: mh.run_adaptive_mh(f_lp, jnp.asarray(TRUTH), k, step0, cfg)
))(jax.random.split(jax.random.PRNGKey(1234), 4))
s = np.asarray(samples).reshape(-1, 9)
golden = {
    "logpost_at_truth": lp_truth,
    "mean": [float(v) for v in s[:, :6].mean(axis=0)],
    "sd": [float(v) for v in s[:, :6].std(axis=0)],
    "accept": float(np.mean(np.asarray(info["accept_rate"]))),
}
with open(OUT, "w") as fh:
    json.dump(golden, fh, indent=1)
print("wrote", OUT)
print(json.dumps(golden, indent=1))
