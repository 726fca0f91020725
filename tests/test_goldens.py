"""Golden-value regression tests (SURVEY.md §4.2.5): pinned posterior
moments and density values from a long reference-mode (adaptive-MH,
marginalized-mass) run guard refactors of the grid/likelihood stack
until real BASE-9 outputs are available for cross-validation."""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from base_tpu.grids import synthetic
from base_tpu.inference import mh
from base_tpu.model import posterior as post
from base_tpu.model.stardata import make_ms_stars
from base_tpu.sim.scatter import scatter_cluster
from base_tpu.sim.simulate import simulate_cluster

GOLDEN_PATH = os.path.join(
    os.path.dirname(__file__), "data", "golden_singlepop.json"
)
TRUTH = np.array([9.3, 0.27, -0.5, 10.0, 0.3, 0.5, 0, 0, 0], np.float32)


@pytest.fixture(scope="module")
def golden_model():
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
    return post.make_single_pop_model(
        grid, stars, prior_mean=TRUTH,
        prior_sigma=np.array([-1, -1, 0.3, 0.2, 0.1, -1, -1, -1, -1],
                             np.float32),
        n_q=8,
    )


def test_logpost_at_truth_golden(golden_model):
    """The density value itself is deterministic: tight tolerance."""
    with open(GOLDEN_PATH) as f:
        golden = json.load(f)
    got = float(post.make_logpost_fn(golden_model)(jnp.asarray(TRUTH)))
    np.testing.assert_allclose(got, golden["logpost_at_truth"], rtol=1e-4)


@pytest.mark.slow
def test_posterior_moments_golden(golden_model):
    """A fresh (shorter) run must agree with the pinned long-run moments
    within combined Monte-Carlo error."""
    with open(GOLDEN_PATH) as f:
        golden = json.load(f)
    f_lp = post.make_logpost_fn(golden_model)
    step0 = jnp.asarray([0.05, 0.02, 0.05, 0.05, 0.03, 0, 0, 0, 0],
                        jnp.float32)
    cfg = mh.MHConfig(n_stage1=400, n_stage2=400, n_main=2000)
    samples, _ = jax.jit(jax.vmap(
        lambda k: mh.run_adaptive_mh(f_lp, jnp.asarray(TRUTH), k, step0, cfg)
    ))(jax.random.split(jax.random.PRNGKey(123), 4))
    s = np.asarray(samples).reshape(-1, 9)
    for i in range(5):
        mean_g = golden["mean"][i]
        sd_g = golden["sd"][i]
        # generous MC tolerance: short run, correlated samples
        assert abs(s[:, i].mean() - mean_g) < 5 * sd_g / 3 + 1e-3, (
            i, s[:, i].mean(), mean_g, sd_g
        )
        assert 0.4 * sd_g < s[:, i].std() + 1e-5 < 2.5 * sd_g + 1e-3, (
            i, s[:, i].std(), sd_g
        )
