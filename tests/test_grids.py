"""Isochrone grid packing + EEP-aligned derive tests (SURVEY.md §4.2.2)."""
import jax
import jax.numpy as jnp
import numpy as np

from base_tpu.grids import isochrone as iso
from base_tpu.grids import synthetic


def test_pack_shapes(small_grid):
    g = small_grid
    F, Y, A = g.feh.shape[0], g.y.shape[0], g.age.shape[0]
    assert g.mass.shape == (F, Y, A, g.n_eep)
    assert g.mags.shape == (F, Y, A, g.n_eep, g.n_bands)
    assert g.valid.shape == (F, Y, A, g.n_eep)
    # Every isochrone has at least one valid EEP; masses monotone on valid.
    v = np.asarray(g.valid)
    m = np.asarray(g.mass)
    assert (v.sum(-1) > 0).all()
    for idx in np.ndindex(v.shape[:3]):
        n = int(v[idx].sum())
        assert (np.diff(m[idx][:n]) > 0).all()


def test_derive_on_node_matches_grid(small_grid):
    """Interpolating exactly at a grid node returns that node's isochrone."""
    g = small_grid
    fi, yi, ai = 1, 1, 2
    out = iso.derive_isochrone(g, g.feh[fi], g.y[yi], g.age[ai])
    n = int(np.asarray(g.valid[fi, yi, ai]).sum())
    np.testing.assert_allclose(
        np.asarray(out.mass)[:n], np.asarray(g.mass[fi, yi, ai])[:n], rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out.mags)[:n], np.asarray(g.mags[fi, yi, ai])[:n],
        rtol=1e-4, atol=1e-4,
    )
    assert bool(out.in_bounds)


def test_derive_midpoint_between_ages(small_grid):
    """Between two age nodes, EEP-aligned blend = average of corners where
    both are valid."""
    g = small_grid
    fi, yi, ai = 0, 0, 1
    age_mid = 0.5 * (g.age[ai] + g.age[ai + 1])
    out = iso.derive_isochrone(g, g.feh[fi], g.y[yi], age_mid)
    v = np.asarray(g.valid[fi, yi, ai]) * np.asarray(g.valid[fi, yi, ai + 1])
    want_mass = 0.5 * (
        np.asarray(g.mass[fi, yi, ai]) + np.asarray(g.mass[fi, yi, ai + 1])
    )
    got = np.asarray(out.mass)
    np.testing.assert_allclose(got[v > 0.5], want_mass[v > 0.5], rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(out.valid) <= v + 1e-6, True)


def test_derive_out_of_bounds(small_grid):
    g = small_grid
    out = iso.derive_isochrone(g, jnp.float32(5.0), g.y[0], g.age[0])
    assert not bool(out.in_bounds)


def test_mags_at_mass_matches_physics():
    """mags_at_mass on a dense isochrone reproduces the generator physics."""
    age, feh, y = 9.4, -0.3, 0.27
    m, mg = synthetic.make_isochrone(age, feh, y, 400, ("B", "V", "I"))
    g = synthetic.make_grid(
        feh_axis=np.array([feh - 0.2, feh, feh + 0.2]),
        y_axis=np.array([y - 0.02, y, y + 0.02]),
        age_axis=np.array([age - 0.2, age, age + 0.2]),
        n_eep=400,
        bands=("B", "V", "I"),
        ragged=False,
    )
    out = iso.derive_isochrone(g, feh, y, age)
    q = np.linspace(m[0] + 1e-3, m[-1] - 1e-3, 37).astype(np.float32)
    got = np.asarray(out.mags_at_mass(jnp.asarray(q)))
    want = synthetic.star_mags(q, age, feh, y, ("B", "V", "I"))
    # mags_at_mass uses smoothstep weights (C^1, HMC-critical; see
    # ops.interp.hat_weight_matrix): interpolation error is first-order
    # in the cell size like the linear scheme (max |S(t)-t| ~ 0.096 of
    # the within-cell variation), so the bound loosens at the steep
    # faint end.  upsample_isochrone shrinks it proportionally.
    np.testing.assert_allclose(got, want, atol=2.5e-2)
    up = iso.upsample_isochrone(out, 4)
    got4 = np.asarray(up.mags_at_mass(jnp.asarray(q)))
    np.testing.assert_allclose(got4, want, atol=8e-3)


def test_eep_mass_weights_integrate(small_grid):
    """Sum of dM weights ~ mass span of the isochrone."""
    g = small_grid
    out = iso.derive_isochrone(g, g.feh[1], g.y[1], g.age[3])
    w = np.asarray(iso.eep_mass_weights(out))
    v = np.asarray(out.valid) > 0.5
    span = np.asarray(out.mass)[v].max() - np.asarray(out.mass)[v].min()
    assert abs(w.sum() - span) / span < 0.05


def test_derive_jit_and_grad(small_grid):
    g = small_grid

    @jax.jit
    def f(age):
        out = iso.derive_isochrone(g, jnp.float32(-0.5), jnp.float32(0.27), age)
        return jnp.sum(out.mags * out.valid[:, None])

    val = f(jnp.float32(9.3))
    grad = jax.grad(f)(jnp.float32(9.3))
    assert np.isfinite(float(val)) and np.isfinite(float(grad))
