import json, sys, time
import numpy as np
import jax, jax.numpy as jnp
from base_tpu.inference import diagnostics as diag
from base_tpu.inference.hmc import HMCConfig, run_hmc
from base_tpu.grids import synthetic
from base_tpu.model import posterior as post
from base_tpu.model.stardata import make_ms_stars
from base_tpu.sim.scatter import scatter_cluster
from base_tpu.sim.simulate import simulate_cluster

truth = np.array([9.3, 0.27, -0.5, 10.0, 0.3, 0.5, 0, 0, 0], np.float32)
grid = synthetic.make_grid(n_eep=64)
cfg = HMCConfig(n_warmup=256, n_samples=512, l_max=16, n_windows=4)
cat = simulate_cluster(grid, jnp.asarray(truth), 100, jax.random.PRNGKey(0), percent_binary=0.3)
sc = scatter_cluster(cat.mags, jax.random.PRNGKey(1), limit_mag=24.0)
stars = make_ms_stars(np.asarray(sc.mags), np.asarray(sc.sigmas), cm_prior=0.99)
model = post.make_single_pop_model(grid, stars, prior_mean=truth,
    prior_sigma=np.array([-1,-1,0.3,0.2,0.1,-1,-1,-1,-1], np.float32), n_q=8)
tr = post.default_transform(model)
fz = post.make_logpost_z_fn(model, tr)
z0 = tr.inverse(jnp.asarray(truth))
init = jnp.tile(z0[None,:], (64,1)) + 0.02*jax.random.normal(jax.random.PRNGKey(2), (64,9))
zs, info = jax.jit(lambda i,k: run_hmc(fz,i,k,cfg))(init, jax.random.PRNGKey(4))
jax.block_until_ready(zs)
xs = jax.vmap(jax.vmap(tr.forward))(zs)
print("step_size", float(info["step_size"]))
im = np.asarray(info["inv_mass"]); print("inv_mass diag", np.diag(im).round(6) if im.ndim==2 else im.round(6))
print("ess", np.asarray(diag.ess(xs)).round(1))
print("accept", round(float(info["accept_prob"]),3))
print("z std", np.asarray(zs.reshape(-1,9).std(axis=0)).round(5))
