"""Instrumented reproduction of the failing HMC SBC config (ADVICE r2 high).

Runs ONE truth-started chain with HMCConfig(n_warmup=96, n_samples=192,
l_max=8, n_windows=2) on the SBC model and prints the per-step dual-
averaging trajectory (eps, accept) plus the window mass estimates, to
see where adaptation stalls.  Run from /root/repo:
    python -u scripts/probe_da.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from base_tpu import constants as C
from base_tpu.grids import synthetic
from base_tpu.inference import hmc
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

N_STARS = 32
BASE = np.array([9.3, 0.27, -0.5, 10.0, 0.3, 0.5, 0, 0, 0], np.float32)
PRIOR_SIGMA = np.array([0.12, -1, 0.22, 0.25, 0.08, -1, -1, -1, -1], np.float32)

truth = BASE.copy()
cat = simulate_cluster(small_grid, jnp.asarray(truth), N_STARS,
                       jax.random.PRNGKey(100), percent_binary=0.0)
sc = scatter_cluster(cat.mags, jax.random.PRNGKey(200), limit_mag=33.0)
stars = make_ms_stars(np.asarray(sc.mags), np.asarray(sc.sigmas), cm_prior=0.999)

frame = post.make_single_pop_model(small_grid, stars, prior_mean=BASE,
                                   prior_sigma=PRIOR_SIGMA, n_q=4, binaries=False)
tr = post.default_transform(frame)
fz = post.make_logpost_z_fn(frame, tr)
z0 = tr.inverse(jnp.asarray(truth))[None, :]

cfg = hmc.HMCConfig(n_warmup=96, n_samples=192, l_max=8, n_windows=2)
vgrad = jax.value_and_grad(fz)
seg_len = cfg.n_warmup // cfg.n_windows
P = z0.shape[-1]


@jax.jit
def run_window(st, inv_mass):
    chol = hmc._metric_chol(inv_mass)

    def body(st, _):
        eps = jnp.exp(st.da.log_eps)
        st2, ap = hmc.hmc_transition(vgrad, st, eps, inv_mass, cfg, chol=chol)
        st2 = st2._replace(da=hmc.da_update(st2.da, ap, cfg.target_accept))
        return st2, (st2.z, eps, ap, st2.logpost, st2.da.log_eps_avg)

    return jax.lax.scan(body, st, None, length=seg_len)


states = hmc.init_chains(fz, z0, jax.random.PRNGKey(9), cfg)
st = jax.tree_util.tree_map(lambda x: x[0], states)
print("initial logpost", float(st.logpost))

inv_mass = jnp.ones((P,))
for w in range(cfg.n_windows):
    st, (zs, epss, aps, lps, leas) = run_window(st, inv_mass)
    zs, epss, aps, lps, leas = map(np.asarray, (zs, epss, aps, lps, leas))
    for t in range(0, seg_len, 6):
        print(f"w{w} t{t:3d} eps={epss[t]:.3e} ap={aps[t]:.3f} "
              f"lea={leas[t]:.3f} lp={lps[t]:.1f}")
    var = zs.var(axis=0)
    print(f"window {w} z-std over window:", np.sqrt(var).round(5))
    if w == 0:
        inv_mass = jnp.asarray(var + 1e-6, jnp.float32)
        print("mass for window 1:", np.asarray(inv_mass).round(6))

eps_final = float(np.exp(leas[-1]))
print("frozen eps:", eps_final)


@jax.jit
def sample(st, inv_mass, eps):
    chol = hmc._metric_chol(inv_mass)

    def body(st, _):
        st2, ap = hmc.hmc_transition(vgrad, st, eps, inv_mass, cfg, chol=chol)
        return st2, (st2.z, ap)

    return jax.lax.scan(body, st, None, length=cfg.n_samples)


st, (zs, aps) = sample(st, inv_mass, jnp.asarray(eps_final))
zs = np.asarray(zs)
xs = np.asarray(jax.vmap(tr.forward)(jnp.asarray(zs)))
print("sampling accept:", float(np.mean(np.asarray(aps))).__round__(3))
print("age std over draws:", xs[:, C.Param.AGE].std().round(5))
print("z stds:", zs.std(axis=0).round(5))
print("true posterior scale guess: run longer chain...")
