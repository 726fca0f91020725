"""Pallas fused-marginal kernel parity vs the jnp path (forward and
VJP), run in interpreter mode on CPU (SURVEY.md §4.2 golden-parity
strategy: pallas(x) ~= jnp(x) over random batches)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from base_tpu.model import likelihood as lk
from base_tpu.model.stardata import make_ms_stars
from base_tpu.ops.pallas_marglik import fused_log_marginals
from base_tpu.ops.special import masked_logsumexp


def _random_problem(rng, S=37, T=133, B=8):
    model_mags = rng.normal(12.0, 3.0, (T + 1, B)).astype(np.float32)
    lo = model_mags[:-1]
    hi = lo + rng.normal(0.0, 0.3, (T, B)).astype(np.float32)
    # observations near random table rows so some weights are O(1)
    pick = rng.integers(0, T, S)
    obs = lo[pick] + rng.normal(0, 0.05, (S, B)).astype(np.float32)
    sig = np.abs(rng.normal(0.05, 0.02, (S, B))).astype(np.float32) + 0.01
    sig[rng.random((S, B)) < 0.1] = -9.0  # unobserved bands
    stars = make_ms_stars(obs, sig)
    logw = rng.normal(-2.0, 1.0, T).astype(np.float32)
    mask = (rng.random(T) > 0.15).astype(np.float32)
    table = lk.SegmentTable(
        lo=jnp.asarray(lo), hi=jnp.asarray(hi),
        logw=jnp.asarray(logw), mask=jnp.asarray(mask) > 0.5,
    )
    return stars, table


def _jnp_ref(stars, table):
    return lk.ms_star_log_marginals(stars, table)


def _pallas(stars, table, matmul=None):
    return fused_log_marginals(
        stars.obs_mags, stars.inv_var, stars.log_norm,
        table.lo, table.hi, table.logw,
        table.mask.astype(jnp.float32), True,  # interpret on CPU
        matmul=matmul,
    )


@pytest.mark.parametrize("matmul", [False, True])
def test_forward_parity_contraction_forms(rng, matmul):
    """Both alpha/beta/gamma forms (residual band loop and the MXU
    matmul expansion with per-band centering) must match the jnp path;
    the matmul form additionally must match the LOOP form to ~1e-3
    (its float32 cancellation budget, _abg_matmul docstring)."""
    stars, table = _random_problem(rng, S=64, T=128)
    want = np.asarray(_jnp_ref(stars, table))
    got = np.asarray(_pallas(stars, table, matmul=matmul))
    sel = want > -200
    np.testing.assert_allclose(got[sel], want[sel], rtol=0, atol=5e-2)
    loop = np.asarray(_pallas(stars, table, matmul=False))
    np.testing.assert_allclose(got[sel], loop[sel], rtol=0, atol=5e-3)


def test_forward_parity(rng):
    stars, table = _random_problem(rng)
    want = np.asarray(_jnp_ref(stars, table))
    got = np.asarray(_pallas(stars, table))
    sel = want > -200  # compare where float32 has real precision
    assert sel.sum() > 10
    # A-S erf polynomial vs exact erf: up to a few e-2 where a single
    # near-cancelling segment dominates; the kernel's own gradients are
    # exactly consistent with its forward (see module docstring).
    np.testing.assert_allclose(got[sel], want[sel], rtol=0, atol=5e-2)


def test_forward_parity_tile_multiple(rng):
    # Exact tile-size shapes (no padding path).
    stars, table = _random_problem(rng, S=256, T=256)
    want = np.asarray(_jnp_ref(stars, table))
    got = np.asarray(_pallas(stars, table))
    sel = want > -200
    np.testing.assert_allclose(got[sel], want[sel], rtol=0, atol=5e-2)


def test_vjp_parity(rng):
    stars, table = _random_problem(rng, S=23, T=67)
    g = rng.normal(0, 1.0, 23).astype(np.float32)

    def f_ref(lo, hi, logw, ln):
        t = lk.SegmentTable(lo=lo, hi=hi, logw=logw, mask=table.mask)
        st = stars
        import dataclasses

        st = dataclasses.replace(st, log_norm=ln)
        return jnp.sum(_jnp_ref(st, t) * g)

    def f_pal(lo, hi, logw, ln):
        return jnp.sum(
            fused_log_marginals(
                stars.obs_mags, stars.inv_var, ln, lo, hi, logw,
                table.mask.astype(jnp.float32), True,
            )
            * g
        )

    args = (table.lo, table.hi, table.logw, stars.log_norm)
    want = jax.grad(f_ref, argnums=(0, 1, 2, 3))(*args)
    got = jax.grad(f_pal, argnums=(0, 1, 2, 3))(*args)
    for w, gt, name in zip(want, got, ["lo", "hi", "logw", "log_norm"]):
        w = np.asarray(w)
        gt = np.asarray(gt)
        scale = np.abs(w).max() + 1e-6
        # float32 + erfc-based tails vs log_ndtr: ~3e-3 relative worst
        # case, well inside what the MH correction absorbs.
        np.testing.assert_allclose(
            gt / scale, w / scale, atol=5e-3, err_msg=name
        )


def test_vmap_over_tables(rng):
    """Chains carry different tables (params differ); the kernel must
    vmap over (lo, hi, logw) with shared photometry."""
    stars, table = _random_problem(rng, S=17, T=45)
    C = 3
    los = jnp.stack([table.lo + 0.01 * i for i in range(C)])
    his = jnp.stack([table.hi + 0.01 * i for i in range(C)])

    def one(lo, hi):
        return fused_log_marginals(
            stars.obs_mags, stars.inv_var, stars.log_norm,
            lo, hi, table.logw, table.mask.astype(jnp.float32), True,
        )

    got = np.asarray(jax.vmap(one)(los, his))
    for i in range(C):
        t = lk.SegmentTable(lo=los[i], hi=his[i], logw=table.logw,
                            mask=table.mask)
        want = np.asarray(_jnp_ref(stars, t))
        sel = want > -200
        np.testing.assert_allclose(got[i][sel], want[sel], atol=5e-2)


# ---------------------------------------------------------------------------
# Fused table-build kernel (ops.pallas_table) parity
# ---------------------------------------------------------------------------


def _iso_problem(rng, E=24, B=6, upsample=1):
    import numpy as np

    from base_tpu.grids import synthetic
    from base_tpu.grids.isochrone import derive_isochrone, upsample_isochrone

    grid = synthetic.make_grid(n_eep=E, bands=["U", "B", "V", "R", "I",
                                               "J"][:B])
    base = derive_isochrone(grid, jnp.asarray(-0.5), jnp.asarray(0.27),
                            jnp.asarray(9.3))
    iso = upsample_isochrone(base, upsample) if upsample > 1 else base
    q = jnp.linspace(0.0, 1.0, 7)
    coefs = jnp.asarray(np.linspace(1.2, 0.4, B), jnp.float32)
    return iso, base, q, coefs


@pytest.mark.parametrize("upsample", [1, 3])
def test_fused_table_matches_jnp(rng, upsample):
    """build_segment_table_fused == build_segment_table (binaries) to
    float32 reassociation, including the upsampled/base-secondary split."""
    iso, base, q, coefs = _iso_problem(rng, upsample=upsample)
    mod = jnp.asarray(9.7)
    av = jnp.asarray(0.23)
    want = lk.build_segment_table(iso, q, mod, av, coefs, binaries=True,
                                  sec_iso=base)
    got = lk.build_segment_table_fused(iso, q, mod, av, coefs,
                                       sec_iso=base, interpret=True)
    np.testing.assert_allclose(np.asarray(got.lo), np.asarray(want.lo),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(got.hi), np.asarray(want.hi),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(got.logw), np.asarray(want.logw),
                               atol=1e-6)
    np.testing.assert_array_equal(np.asarray(got.mask),
                                  np.asarray(want.mask))


def test_fused_table_vjp_matches_jnp(rng):
    """Gradients of a table functional w.r.t. the proposal inputs must
    agree between the fused kernel's analytic backward and XLA autodiff
    of the jnp builder — this is the table half of the fusion's
    correctness story (cotangents flow through the smoothstep weights
    into the base mass axis AND the node masses)."""
    iso, base, q, coefs = _iso_problem(rng, upsample=2)
    w_lo = jnp.asarray(rng.normal(0, 1, (iso.mass.shape[0] - 1)
                                  * q.shape[0] * coefs.shape[0])
                       .reshape(-1, coefs.shape[0]).astype(np.float32))

    def functional(builder):
        def f(mod, av, mags, sec_mags, s_mass, s_axis, s_mm):
            import dataclasses as dc

            # Separate scales stress each mass-gradient path on its own
            # (node masses -> dm2; the base lookup axis -> dxl/dxr/
            # dinv_d*; min_mass -> the lit ramp).  A single joint scale
            # is ill-conditioned: the three paths cancel to ~0 by the
            # interpolation identity, so their float32 residuals would
            # dominate the comparison.
            iso2 = dc.replace(iso, mags=mags, mass=s_mass * iso.mass)
            base2 = dc.replace(
                base, mags=sec_mags,
                mass_sorted=s_axis * base.mass_sorted,
                min_mass=s_mm * base.min_mass,
            )
            t = builder(iso2, q, mod, av, coefs, base2)
            return jnp.sum(t.lo * w_lo) + jnp.sum(jnp.cos(t.hi))

        return f

    f_jnp = functional(
        lambda i, qq, m, a, c, s: lk.build_segment_table(
            i, qq, m, a, c, binaries=True, sec_iso=s)
    )
    f_pal = functional(
        lambda i, qq, m, a, c, s: lk.build_segment_table_fused(
            i, qq, m, a, c, sec_iso=s, interpret=True)
    )
    args = (jnp.asarray(9.7), jnp.asarray(0.23), iso.mags, base.mags,
            jnp.asarray(1.03), jnp.asarray(1.01), jnp.asarray(0.98))
    want = jax.grad(f_jnp, argnums=(0, 1, 2, 3, 4, 5, 6))(*args)
    got = jax.grad(f_pal, argnums=(0, 1, 2, 3, 4, 5, 6))(*args)
    for w, gt, name in zip(want, got,
                           ["mod", "av", "mags", "sec_mags",
                            "s_mass", "s_axis", "s_minmass"]):
        w = np.asarray(w)
        gt = np.asarray(gt)
        scale = np.abs(w).max() + 1e-6
        np.testing.assert_allclose(gt / scale, w / scale, atol=2e-4,
                                   err_msg=name)
