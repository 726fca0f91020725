"""Diagnostics + sharded-execution tests on the 8-fake-device CPU mesh
(SURVEY.md §4.2 item 4: exact shard_map/collective code paths in CI)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from base_tpu.inference import diagnostics as diag
from base_tpu.inference import hmc, mh
from base_tpu.model import posterior as post
from base_tpu.model.stardata import make_ms_stars
from base_tpu.parallel import run as prun
from base_tpu.parallel.mesh import make_mesh
from base_tpu.sim.scatter import scatter_cluster
from base_tpu.sim.simulate import simulate_cluster

TRUTH = np.array([9.3, 0.27, -0.5, 10.0, 0.3, 0.5, 0.0, 0.0, 0.0], np.float32)


# ---------- diagnostics ------------------------------------------------------

def test_rhat_iid_close_to_one(rng):
    x = rng.normal(size=(500, 8, 3)).astype(np.float32)
    r = np.asarray(diag.split_rhat(jnp.asarray(x)))
    assert np.all(r < 1.05)


def test_rhat_detects_divergent_chains(rng):
    x = rng.normal(size=(500, 4, 2)).astype(np.float32)
    x[:, 0, 0] += 10.0  # one chain far away in param 0
    r = np.asarray(diag.split_rhat(jnp.asarray(x)))
    assert r[0] > 2.0 and r[1] < 1.05


def test_ess_iid(rng):
    x = rng.normal(size=(1000, 4, 2)).astype(np.float32)
    e = np.asarray(diag.ess(jnp.asarray(x)))
    assert np.all(e > 2500) and np.all(e < 6000)


def test_ess_ar1(rng):
    # AR(1) with rho=0.9: tau = (1+rho)/(1-rho) = 19
    rho, n, c = 0.9, 4000, 4
    eps = rng.normal(size=(n, c)).astype(np.float32)
    x = np.zeros((n, c), np.float32)
    for t in range(1, n):
        x[t] = rho * x[t - 1] + np.sqrt(1 - rho**2) * eps[t]
    e = float(diag.ess(jnp.asarray(x[..., None]))[0])
    want = n * c / 19.0
    assert 0.5 * want < e < 2.0 * want, (e, want)


# ---------- sharded runners --------------------------------------------------

@pytest.fixture(scope="module")
def cluster_model(small_grid):
    cat = simulate_cluster(
        small_grid, jnp.asarray(TRUTH), 50, jax.random.PRNGKey(21),
        percent_binary=0.0,
    )
    sc = scatter_cluster(cat.mags, jax.random.PRNGKey(22), limit_mag=24.0)
    stars = make_ms_stars(np.asarray(sc.mags), np.asarray(sc.sigmas),
                          cm_prior=0.999)
    return post.make_single_pop_model(
        small_grid, stars,
        prior_mean=TRUTH,
        prior_sigma=np.array([-1, -1, 0.3, 0.2, 0.1, -1, -1, -1, -1],
                             np.float32),
        n_q=6, binaries=False,
    )


def test_star_sharded_logpost_and_grad_match_single_device(cluster_model):
    """The psum-over-star-shards density AND its gradient must match the
    replicated evaluation (50 stars pad to 52 across 4 shards — padding
    must not leak).

    The gradient check is the load-bearing half: with check_vma=False,
    grad-of-psum silently dropped every other shard's contribution (each
    device kept only its local-stars gradient), which collapsed sharded
    HMC warmup to eps ~ 1e-12 and froze the chains.  check_vma=True is
    what makes the psum transpose insert the correct collectives — this
    test pins both the setting and the numbers."""
    mesh = make_mesh(n_chain_shards=2, n_star_shards=4)
    single = post.make_logpost_fn(cluster_model)
    want_v, want_g = jax.value_and_grad(single)(jnp.asarray(TRUTH))

    sharded_model = prun.shard_stars(cluster_model, mesh)
    stars = sharded_model.stars
    import dataclasses
    frame = dataclasses.replace(sharded_model, stars=None)

    from jax.sharding import PartitionSpec as P

    def device_fn(stars_local, params):
        f = prun.local_logpost_fn(frame, stars_local, prun.STAR_AXIS)
        return jax.value_and_grad(f)(params)

    fn = jax.jit(jax.shard_map(
        device_fn, mesh=mesh,
        in_specs=(prun._star_specs(stars), P()),
        out_specs=(P(), P()), check_vma=True,
    ))
    got_v, got_g = fn(stars, jnp.asarray(TRUTH))
    # float32 star-sum reassociation across shards: ~1e-5 relative
    np.testing.assert_allclose(float(got_v), float(want_v), rtol=1e-5)
    # gradient components span O(1)-O(200); reassociation inside the
    # segment sums costs up to ~1e-3 of the largest component
    np.testing.assert_allclose(
        np.asarray(got_g), np.asarray(want_g), rtol=5e-3,
        atol=2e-3 * float(jnp.max(jnp.abs(want_g))),
    )


def test_hmc_sharded_chains_actually_move(cluster_model):
    """Regression for the frozen-chain failure mode: recorded draws must
    differ across the draw axis, and recorded logposts must be
    consistent with the density at the recorded positions (the broken
    gradient path produced accept=0.99 with zero movement, which the
    truth-recovery assertions could not distinguish from convergence)."""
    mesh = make_mesh(n_chain_shards=4, n_star_shards=2)
    tr = post.default_transform(cluster_model)
    z0 = tr.inverse(jnp.asarray(TRUTH))
    init = jnp.tile(z0[None, :], (8, 1))
    init = init + 0.01 * jax.random.normal(jax.random.PRNGKey(8), init.shape)
    cfg = hmc.HMCConfig(n_warmup=100, n_samples=60, l_max=8, n_windows=2)
    zs, info = prun.run_hmc_sharded(
        cluster_model, tr, init, jax.random.PRNGKey(9), cfg, mesh
    )
    z = np.asarray(zs)
    # every chain moves between draws
    per_chain_ptp = np.ptp(z, axis=0).max(axis=-1)  # [C]
    assert (per_chain_ptp > 1e-4).all(), per_chain_ptp
    # step size is sane (the bug froze it at ~1e-12)
    assert float(np.asarray(info["step_size"])) > 1e-6
    # recorded logposts consistent with the density at the recorded z
    fz = post.make_logpost_z_fn(cluster_model, tr)
    lp_true = np.asarray(jax.vmap(jax.vmap(fz))(zs))
    lps = np.asarray(info["logposts"])
    np.testing.assert_allclose(lps, lp_true, atol=0.5, rtol=1e-4)


def test_mh_sharded_runs_and_recovers(cluster_model):
    mesh = make_mesh(n_chain_shards=4, n_star_shards=2)
    step0 = jnp.asarray([0.05, 0.02, 0.05, 0.05, 0.03, 0, 0, 0, 0],
                        jnp.float32)
    cfg = mh.MHConfig(n_stage1=200, n_stage2=200, n_main=400)
    init = jnp.tile(jnp.asarray(TRUTH)[None, :], (8, 1))
    samples, info = prun.run_mh_sharded(
        cluster_model, init, jax.random.PRNGKey(7), step0, cfg, mesh
    )
    s = np.asarray(samples)  # [n_rec, 8, 9]
    assert s.shape == (400, 8, 9)
    assert np.isfinite(np.asarray(info["logposts"])).all()
    # Chains must differ (per-chain RNG fold_in works).
    assert np.std(s[-1, :, 0]) > 0
    age = s[200:, :, 0]
    assert abs(age.mean() - TRUTH[0]) < 0.1


def test_hmc_sharded_runs_and_recovers(cluster_model):
    mesh = make_mesh(n_chain_shards=4, n_star_shards=2)
    tr = post.default_transform(cluster_model)
    z0 = tr.inverse(jnp.asarray(TRUTH))
    init = jnp.tile(z0[None, :], (8, 1))
    init = init + 0.01 * jax.random.normal(jax.random.PRNGKey(8), init.shape)
    cfg = hmc.HMCConfig(n_warmup=100, n_samples=100, l_max=8, n_windows=2)
    zs, info = prun.run_hmc_sharded(
        cluster_model, tr, init, jax.random.PRNGKey(9), cfg, mesh
    )
    assert zs.shape == (100, 8, 9)
    assert float(info["accept_prob"]) > 0.3
    xs = np.asarray(jax.vmap(jax.vmap(tr.forward))(zs))
    assert abs(xs[:, :, 0].mean() - TRUTH[0]) < 0.1
    r = np.asarray(diag.split_rhat(jnp.asarray(xs[:, :, :5])))
    assert np.all(np.isfinite(r))


def test_smc_sharded_cluster(cluster_model):
    """Tempered SMC on the cluster posterior over the 2-D mesh
    (BASELINE config 5 machinery at CI scale): particles shard on the
    chain axis, stars psum inside the tempered density."""
    from base_tpu.inference.smc import SMCConfig
    from base_tpu.model import posterior as post

    mesh = make_mesh(n_chain_shards=4, n_star_shards=2)
    tr = post.default_transform(cluster_model)
    z0 = tr.inverse(jnp.asarray(TRUTH))
    cfg = SMCConfig(n_particles=128, n_move=2, max_stages=16)
    particles, info = prun.run_smc_sharded(
        cluster_model, tr, z0, jax.random.PRNGKey(17), cfg, mesh,
        q0_sd=0.3,
    )
    assert particles.shape == (512, 9)
    assert float(info["beta"]) == 1.0
    xs = np.asarray(jax.vmap(tr.forward)(particles))
    assert np.isfinite(xs).all()
    assert abs(xs[:, 0].mean() - TRUTH[0]) < 0.1
    assert np.isfinite(float(info["log_evidence"]))


def test_nuts_sharded_runs_and_recovers(cluster_model):
    from base_tpu.inference.nuts import NUTSConfig

    mesh = make_mesh(n_chain_shards=4, n_star_shards=2)
    tr = post.default_transform(cluster_model)
    z0 = tr.inverse(jnp.asarray(TRUTH))
    init = jnp.tile(z0[None, :], (8, 1))
    init = init + 0.01 * jax.random.normal(jax.random.PRNGKey(18), init.shape)
    cfg = NUTSConfig(n_warmup=60, n_samples=60, max_depth=5, n_windows=2)
    zs, info = prun.run_nuts_sharded(
        cluster_model, tr, init, jax.random.PRNGKey(19), cfg, mesh
    )
    assert zs.shape == (60, 8, 9)
    assert float(info["accept_prob"]) > 0.3
    assert float(info["mean_leapfrogs"]) > 1.0
    xs = np.asarray(jax.vmap(jax.vmap(tr.forward))(zs))
    assert abs(xs[:, :, 0].mean() - TRUTH[0]) < 0.1


def test_vi_sharded_matches_single_device(cluster_model):
    """Sharded ADVI (VERDICT r4 #6): MC-sharded ELBO over the chain axis
    + star-psum density.  The fitted mean must agree with single-device
    VI within the families' own posterior scales, and the warm-start
    helper must produce a usable dense metric."""
    from base_tpu.inference import vi as vi_mod

    mesh = make_mesh(n_chain_shards=4, n_star_shards=2)
    tr = post.default_transform(cluster_model)
    fz = post.make_logpost_z_fn(cluster_model, tr)
    z0 = tr.inverse(jnp.asarray(TRUTH))
    cfg = vi_mod.VIConfig(n_steps=400, n_mc=4, full_rank=True,
                          learning_rate=2e-2, init_log_sd=-3.0)
    res_sh = prun.run_vi_sharded(
        cluster_model, tr, z0, jax.random.PRNGKey(31), cfg, mesh,
        chunk_steps=200,
    )
    res_1d = vi_mod.run_vi_chunked(fz, z0, jax.random.PRNGKey(31), cfg)
    assert np.isfinite(float(res_sh.final_elbo))
    # Sharded MC pooling = 4x the MC budget; ELBO should be no worse.
    assert float(res_sh.final_elbo) > float(res_1d.final_elbo) - 3.0
    sd_1d = np.sqrt(np.maximum(np.diag(
        np.asarray(vi_mod.posterior_covariance(res_1d))), 1e-12))
    dmu = np.abs(np.asarray(res_sh.mu) - np.asarray(res_1d.mu))
    free = np.asarray(post.free_mask(cluster_model)) > 0
    assert (dmu[free] < 6 * sd_1d[free]).all(), (dmu, sd_1d)

    draws, cov, _ = prun.vi_warm_start_sharded(
        cluster_model, tr, z0, jax.random.PRNGKey(32), 8, mesh,
        free_mask=post.free_mask(cluster_model), cfg=cfg,
    )
    assert draws.shape == (8, 9)
    assert cov.shape == (9, 9)
    evals = np.linalg.eigvalsh(np.asarray(cov))
    assert (evals > 0).all()
    # Pinned dims carry z0 exactly and a unit metric diagonal.
    pinned = ~free
    assert np.allclose(np.asarray(draws)[:, pinned],
                       np.asarray(z0)[None, pinned])


def test_mh_sharded_burn_model(cluster_model):
    """useDuringBurnIn under a mesh (VERDICT r4 weak #8): stages 1-2
    target a sharded star-subset model, stage 3 the full one; the run
    must move and land on the posterior."""
    import dataclasses as dc

    from base_tpu.inference.mh import MHConfig
    from base_tpu.model.stardata import MSStars

    mesh = make_mesh(n_chain_shards=4, n_star_shards=2)
    # Burn-in subset: first 30 stars.
    sub = jax.tree_util.tree_map(lambda x: x[:30], cluster_model.stars)
    burn_model = dc.replace(cluster_model, stars=sub)
    cfg = MHConfig(n_stage1=60, n_stage2=120, n_main=120)
    init = jnp.tile(jnp.asarray(TRUTH)[None, :], (8, 1))
    step0 = np.zeros(9, np.float32)
    step0[[0, 2, 3, 4]] = [0.03, 0.05, 0.05, 0.02]
    xs, info = prun.run_mh_sharded(
        cluster_model, init, jax.random.PRNGKey(33), jnp.asarray(step0),
        cfg, mesh, burn_model=burn_model,
    )
    assert xs.shape[1] == 8
    x = np.asarray(xs)
    assert np.isfinite(x).all()
    assert x[:, :, 0].std() > 0  # chains moved
    assert abs(x[:, :, 0].mean() - TRUTH[0]) < 0.15
