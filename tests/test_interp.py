"""Unit tests for regular-grid interpolation vs scipy (SURVEY.md §4.2.1)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.interpolate import RegularGridInterpolator

from base_tpu.ops import interp as iops


@pytest.mark.parametrize("k", [1, 2, 3])
def test_multilinear_matches_scipy(k, rng):
    axes = [np.sort(rng.uniform(-2, 2, size=n)).astype(np.float32)
            for n in (7, 5, 6)[:k]]
    payload = rng.normal(size=tuple(len(a) for a in axes) + (4,)).astype(
        np.float32
    )
    ref = RegularGridInterpolator(axes, payload)
    # Interior queries only (scipy errors outside the hull).
    pts = np.stack(
        [rng.uniform(a[0] + 1e-3, a[-1] - 1e-3, size=50) for a in axes], -1
    ).astype(np.float32)

    f = jax.jit(
        lambda p: iops.multilinear(
            [jnp.asarray(a) for a in axes], jnp.asarray(payload), list(p)
        )
    )
    got = np.stack([np.asarray(f(tuple(p))[0]) for p in pts])
    want = ref(pts).astype(np.float32)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_out_of_bounds_flag():
    axis = jnp.linspace(0.0, 1.0, 5)
    vals = jnp.arange(5.0)
    _, inside = iops.multilinear([axis], vals, [jnp.float32(1.5)])
    assert not bool(inside)
    out, inside = iops.multilinear([axis], vals, [jnp.float32(0.5)])
    assert bool(inside)
    np.testing.assert_allclose(np.asarray(out), 2.0, rtol=1e-6)


def test_clamping_at_edges():
    axis = jnp.linspace(0.0, 1.0, 5)
    vals = jnp.arange(5.0) ** 2
    out, _ = iops.multilinear([axis], vals, [jnp.float32(2.0)])
    np.testing.assert_allclose(np.asarray(out), 16.0, rtol=1e-6)


def test_gradient_flows():
    axis = jnp.linspace(0.0, 1.0, 5)
    vals = jnp.arange(5.0) ** 2

    def f(x):
        out, _ = iops.multilinear([axis], vals, [x])
        return out

    g = jax.grad(f)(jnp.float32(0.6))
    # On cell [0.5, 0.75]: values 4 -> 9, slope = 5 / 0.25 = 20
    np.testing.assert_allclose(np.asarray(g), 20.0, rtol=1e-5)


def test_interp1d_payload(rng):
    x = np.sort(rng.uniform(0, 1, 16)).astype(np.float32)
    y = rng.normal(size=(16, 3)).astype(np.float32)
    xq = rng.uniform(x[0], x[-1], size=(10,)).astype(np.float32)
    got = np.asarray(iops.interp1d(jnp.asarray(x), jnp.asarray(y), jnp.asarray(xq)))
    for j in range(3):
        want = np.interp(xq, x, y[:, j])
        np.testing.assert_allclose(got[:, j], want, rtol=1e-5, atol=1e-5)
