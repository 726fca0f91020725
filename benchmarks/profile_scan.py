"""In-scan component profile: the honest hot-spot decomposition (r5).

The r4 profile_density numbers timed each stage as its own jitted call;
profile_table.out (r5) showed EVERY such call costs ~1.44 ms at 64
chains — the host->tunnel dispatch floor, not compute.  (The r4 "table
build = 89% of density cost" reading was therefore wrong.)  This probe
times each component as N iterations inside one lax.scan (carrying the
parameter vector through a tiny perturbation so nothing hoists), minus
an empty-scan baseline — per-iteration costs with zero dispatch.

Run from /root/repo:  python -u benchmarks/profile_scan.py [--pallas]
"""
import os
import sys
import json
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_ITER = 50


def bench(fn, *args, n=10):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main(n_chains=64, use_pallas=False, upsample=1, n_q=8, n_stars=100):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from base_tpu.grids import synthetic
    from base_tpu.grids.isochrone import derive_isochrone, upsample_isochrone
    from base_tpu.model import likelihood as lk
    from base_tpu.model import posterior as post
    from base_tpu.model.stardata import make_ms_stars
    from base_tpu.sim.scatter import scatter_cluster
    from base_tpu.sim.simulate import simulate_cluster
    from base_tpu import constants as C

    truth = np.array([9.3, 0.27, -0.5, 10.0, 0.3, 0.5, 0, 0, 0], np.float32)
    grid = synthetic.make_grid(n_eep=64)
    cat = simulate_cluster(grid, jnp.asarray(truth), n_stars,
                           jax.random.PRNGKey(0), percent_binary=0.3)
    sc = scatter_cluster(cat.mags, jax.random.PRNGKey(1), limit_mag=24.0)
    stars = make_ms_stars(np.asarray(sc.mags), np.asarray(sc.sigmas),
                          cm_prior=0.99)
    model = post.make_single_pop_model(
        grid, stars, prior_mean=truth,
        prior_sigma=np.array([-1, -1, 0.3, 0.2, 0.1, -1, -1, -1, -1],
                             np.float32),
        n_q=n_q, upsample=upsample, use_pallas=use_pallas)
    tr = post.default_transform(model)
    z0 = tr.inverse(jnp.asarray(truth))
    zb = jnp.tile(z0[None, :], (n_chains, 1))
    zb = zb + 0.02 * jax.random.normal(jax.random.PRNGKey(2), zb.shape)

    res = {"chains": n_chains, "stars": n_stars, "pallas": use_pallas,
           "upsample": upsample, "n_q": n_q,
           "backend": jax.default_backend()}

    def scan_of(scalar_fn, grad=True):
        f = jax.value_and_grad(scalar_fn) if grad else scalar_fn

        def body(z, _):
            if grad:
                v, g = jax.vmap(f)(z)
                z = z + 1e-7 * g
            else:
                v = jax.vmap(f)(z)
                z = z + 1e-7 * v[:, None]
            return z, jnp.sum(v)

        return jax.jit(lambda z: jax.lax.scan(body, z, None, length=N_ITER))

    def empty(z):
        return jnp.sum(z * 1e-7)

    def iso_scalar(z):
        x = tr.forward(z)
        iso = derive_isochrone(model.grid, x[C.Param.FEH],
                               x[C.Param.YYY], x[C.Param.AGE])
        return jnp.sum(iso.mags) * 1e-3 + jnp.sum(iso.mass) * 1e-3

    def table_scalar(z):
        x = tr.forward(z)
        base_iso = derive_isochrone(model.grid, x[C.Param.FEH],
                                    x[C.Param.YYY], x[C.Param.AGE])
        iso = base_iso
        if model.upsample > 1:
            iso = upsample_isochrone(base_iso, model.upsample)
        t = lk.build_segment_table(iso, model.q_grid, x[C.Param.MOD],
                                   x[C.Param.ABS], model.abs_coefs,
                                   sec_iso=base_iso)
        return (jnp.sum(t.lo) + jnp.sum(t.hi) + jnp.sum(t.logw)) * 1e-5

    # marg on a FIXED table: time the kernel/jnp marginal alone.
    x0 = tr.forward(z0)
    base_iso0 = derive_isochrone(model.grid, x0[C.Param.FEH],
                                 x0[C.Param.YYY], x0[C.Param.AGE])
    iso0 = base_iso0
    if model.upsample > 1:
        iso0 = upsample_isochrone(base_iso0, model.upsample)
    t0_ = lk.build_segment_table(iso0, model.q_grid, x0[C.Param.MOD],
                                 x0[C.Param.ABS], model.abs_coefs,
                                 sec_iso=base_iso0)
    t0_ = jax.tree_util.tree_map(jnp.asarray, t0_)

    def marg_scalar(z):
        # perturb the table by z so the scan cannot hoist it
        tt = lk.SegmentTable(lo=t0_.lo + z[3] * 1e-9, hi=t0_.hi + z[3] * 1e-9,
                             logw=t0_.logw, mask=t0_.mask)
        return lk.ms_total_loglik(model.stars, tt, model.use_pallas) * 1e-3

    fz = post.make_logpost_z_fn(model, tr)

    stages = [("empty", empty), ("iso", iso_scalar),
              ("table", table_scalar), ("marg", marg_scalar),
              ("full", fz)]
    base_ms = None
    for nm, f in stages:
        t_g = bench(scan_of(f, grad=True), zb) / N_ITER
        if nm == "empty":
            base_ms = t_g
            res["empty_ms"] = round(t_g, 4)
            continue
        res[f"{nm}_vjp_ms"] = round(t_g - base_ms, 4)
    # forward-only for the full density
    res["full_fwd_ms"] = round(
        bench(scan_of(fz, grad=False), zb) / N_ITER - base_ms, 4)
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    use_pallas = "--pallas" in sys.argv
    ups = [int(a.split("=")[1]) for a in sys.argv if a.startswith("--upsample=")]
    nqs = [int(a.split("=")[1]) for a in sys.argv if a.startswith("--nq=")]
    ns = [int(a.split("=")[1]) for a in sys.argv if a.startswith("--stars=")]
    main(use_pallas=use_pallas, upsample=ups[0] if ups else 1,
         n_q=nqs[0] if nqs else 8, n_stars=ns[0] if ns else 100)
