import json, sys, time
import jax
jax.config.update("jax_platforms", "cpu")
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
n_stars, n_chains = 60, 8
cfg = HMCConfig(n_warmup=96, n_samples=160, l_max=6, n_windows=4)
cat = simulate_cluster(grid, jnp.asarray(truth), n_stars, jax.random.PRNGKey(0), percent_binary=0.3)
sc = scatter_cluster(cat.mags, jax.random.PRNGKey(1), limit_mag=24.0)
stars = make_ms_stars(np.asarray(sc.mags), np.asarray(sc.sigmas), cm_prior=0.99)
model = post.make_single_pop_model(grid, stars, prior_mean=truth,
    prior_sigma=np.array([-1, -1, 0.3, 0.2, 0.1, -1, -1, -1, -1], np.float32), n_q=8)
tr = post.default_transform(model)
fz = post.make_logpost_z_fn(model, tr)
z0 = tr.inverse(jnp.asarray(truth))
init = jnp.tile(z0[None, :], (n_chains, 1))
init = init + 0.02 * jax.random.normal(jax.random.PRNGKey(2), init.shape)
t0 = time.time()
zs, info = jax.jit(lambda z, k: run_hmc(fz, z, k, cfg))(init, jax.random.PRNGKey(4))
jax.block_until_ready(zs)
xs = jax.vmap(jax.vmap(tr.forward))(zs)
ess = np.asarray(diag.ess(xs))
im = np.asarray(info["inv_mass"])
print(json.dumps({
    "ess": np.round(ess, 1).tolist(),
    "ess_age": float(round(float(ess[0]), 1)),
    "accept": round(float(info["accept_prob"]), 3),
    "step_size": float(info["step_size"]),
    "inv_mass_diag": np.round(np.diag(im) if im.ndim == 2 else im, 6).tolist(),
    "age_sd": float(np.asarray(xs[..., 0]).std()),
    "wall_s": round(time.time() - t0, 1),
}))
