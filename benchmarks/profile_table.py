"""Decompose the segment-table build cost on the real chip (r5).

The r4 profile (profile_density.out) showed the jnp table build at
~75-89% of the full density cost; this probe splits it further so the
fusion kernel targets the right piece:

  iso    : derive_isochrone alone (2x2x2 blend einsums)
  sec    : the secondary-mass smoothstep lookup (hat weights + matmul)
  comb   : combined_node_mags (sec + flux combine exp/log)
  table  : full build_segment_table
Each stage is timed fwd and vjp under vmap over chains.

Run from /root/repo:  python -u benchmarks/profile_table.py
"""
import os
import sys
import json
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(fn, *args, n=30):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main(n_chains=64):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from base_tpu.grids import synthetic
    from base_tpu.grids.isochrone import derive_isochrone
    from base_tpu.model import likelihood as lk
    from base_tpu.model import posterior as post
    from base_tpu.model.stardata import make_ms_stars
    from base_tpu.sim.scatter import scatter_cluster
    from base_tpu.sim.simulate import simulate_cluster
    from base_tpu import constants as C

    truth = np.array([9.3, 0.27, -0.5, 10.0, 0.3, 0.5, 0, 0, 0], np.float32)
    grid = synthetic.make_grid(n_eep=64)
    cat = simulate_cluster(grid, jnp.asarray(truth), 100,
                           jax.random.PRNGKey(0), percent_binary=0.3)
    sc = scatter_cluster(cat.mags, jax.random.PRNGKey(1), limit_mag=24.0)
    stars = make_ms_stars(np.asarray(sc.mags), np.asarray(sc.sigmas),
                          cm_prior=0.99)
    model = post.make_single_pop_model(
        grid, stars, prior_mean=truth,
        prior_sigma=np.array([-1, -1, 0.3, 0.2, 0.1, -1, -1, -1, -1],
                             np.float32), n_q=8)
    tr = post.default_transform(model)
    z0 = tr.inverse(jnp.asarray(truth))
    zb = jnp.tile(z0[None, :], (n_chains, 1))
    zb = zb + 0.02 * jax.random.normal(jax.random.PRNGKey(2), zb.shape)

    res = {"chains": n_chains, "backend": jax.default_backend(),
           "grid_FYA": [int(v) for v in grid.mass.shape[:3]],
           "E": int(grid.n_eep), "Q": int(model.q_grid.shape[0])}

    def iso_scalar(z):
        x = tr.forward(z)
        iso = derive_isochrone(model.grid, x[C.Param.FEH],
                               x[C.Param.YYY], x[C.Param.AGE])
        return jnp.sum(iso.mags) + jnp.sum(iso.mass) + jnp.sum(iso.valid)

    iso0 = derive_isochrone(model.grid, truth[2], truth[1], truth[0])
    iso0 = jax.tree_util.tree_map(jnp.asarray, iso0)

    def sec_scalar(z):
        x = tr.forward(z)
        m2 = (iso0.mass[:, None] * model.q_grid[None, :]).reshape(-1)
        # Scale queries by modulus to keep a z-dependence.
        mags2 = iso0.mags_at_mass(m2 * (1.0 + 0.0 * x[3]))
        return jnp.sum(mags2) * (1.0 + 0.0 * x[3])

    def comb_scalar(z):
        x = tr.forward(z)
        cm = lk.combined_node_mags(iso0, model.q_grid, x[C.Param.MOD],
                                   x[C.Param.ABS], model.abs_coefs)
        return jnp.sum(cm)

    def table_scalar(z):
        x = tr.forward(z)
        iso = derive_isochrone(model.grid, x[C.Param.FEH],
                               x[C.Param.YYY], x[C.Param.AGE])
        t = lk.build_segment_table(iso, model.q_grid, x[C.Param.MOD],
                                   x[C.Param.ABS], model.abs_coefs)
        return jnp.sum(t.lo) + jnp.sum(t.hi) + jnp.sum(t.logw)

    for nm, f in [("iso", iso_scalar), ("sec", sec_scalar),
                  ("comb", comb_scalar), ("table", table_scalar)]:
        ff = jax.jit(jax.vmap(f))
        res[f"{nm}_fwd_ms"] = round(bench(ff, zb), 3)
        gg = jax.jit(jax.vmap(jax.value_and_grad(f)))
        res[f"{nm}_vjp_ms"] = round(bench(gg, zb), 3)
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
