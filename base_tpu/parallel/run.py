"""Sharded posterior evaluation and sampler drivers (shard_map).

This is the scale-out layer of the framework (SURVEY.md §7 step 5): the
single-chip log-posterior of base_tpu.model.posterior becomes, unchanged,
a 2-D-sharded program:

  - stars are split across the "stars" mesh axis; every device computes
    its shard's per-star marginal likelihoods and the total rides one
    `psum` (the partial sums are scalars — ICI traffic per proposal is a
    few bytes, the blockwise/ring-attention property of SURVEY.md §2.4);
  - chains are split across the "chains" axis; each device vmaps its
    local block, and warmup adaptation pools across devices with
    psum/pmean inside the sampler itself (hmc.run_hmc axis_name).

Gradients flow through psum (its transpose is psum), so the same
machinery serves HMC/NUTS.  Everything here also runs on a 1-device
mesh, which is how CI exercises the exact collective code paths on 8
fake CPU devices (SURVEY.md §4.2 item 4).
"""
from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array
from jax import shard_map
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from base_tpu import constants as C
from base_tpu.grids.isochrone import derive_isochrone
from base_tpu.model import likelihood as lk
from base_tpu.model.posterior import SinglePopModel
from base_tpu.model.stardata import MSStars
from base_tpu.ops.special import NEG_INF
from base_tpu.parallel.mesh import CHAIN_AXIS, STAR_AXIS, pad_to_multiple

from base_tpu.inference import hmc as hmc_mod
from base_tpu.inference import mh as mh_mod


def shard_stars(model: SinglePopModel, mesh: Mesh) -> SinglePopModel:
    """Pad the star axis to the star-shard count and place each per-star
    array with a NamedSharding over the "stars" axis (grid and other
    model leaves stay replicated)."""
    n_star_shards = mesh.shape[STAR_AXIS]
    stars = model.stars
    S = stars.n_stars
    S_pad = pad_to_multiple(S, n_star_shards)
    if S_pad != S:
        stars = _repad_stars(stars, S_pad)

    def place(x):
        s = NamedSharding(mesh, P(STAR_AXIS))
        return jax.device_put(x, s)

    stars = jax.tree_util.tree_map(place, stars)
    return dataclasses.replace(model, stars=stars)


def _repad_stars(stars: MSStars, pad_to: int) -> MSStars:
    """Host-side re-pad of an MSStars pytree to a larger static S."""
    extra = pad_to - stars.n_stars

    def pad(x, val=0.0):
        x = np.asarray(x)
        w = [(0, extra)] + [(0, 0)] * (x.ndim - 1)
        return jnp.asarray(np.pad(x, w, constant_values=val))

    return MSStars(
        obs_over_var=pad(stars.obs_over_var),
        inv_var=pad(stars.inv_var),
        c0=pad(stars.c0),
        log_norm=pad(stars.log_norm),
        log_cm=pad(stars.log_cm, -1.0),
        log_1m_cm=pad(stars.log_1m_cm, -1.0),
        field_logdens=pad(stars.field_logdens),
        star_mask=pad(stars.star_mask),
        obs_mags=pad(stars.obs_mags),
        obs_sigma=pad(stars.obs_sigma, -9.0),
    )


def local_logpost_fn(
    model: SinglePopModel, stars_local: MSStars, star_axis: str | None
) -> Callable[[Array], Array]:
    """Per-device log posterior: local star partial + psum over the star
    axis + (replicated) prior.  Identical on every device after the psum.
    """

    def f(params: Array) -> Array:
        age = params[C.Param.AGE]
        y = params[C.Param.YYY]
        feh = params[C.Param.FEH]
        mod = params[C.Param.MOD]
        av = params[C.Param.ABS]
        iso = derive_isochrone(model.grid, feh, y, age)
        table = lk.build_segment_table(
            iso, model.q_grid, mod, av, model.abs_coefs,
            binaries=model.binaries, uniform_q=model.uniform_q,
        )
        ll = lk.ms_total_loglik(stars_local, table)
        if star_axis is not None:
            ll = jax.lax.psum(ll, star_axis)
        lp = model.priors.log_prior(params)
        return jnp.where(iso.in_bounds, ll + lp, NEG_INF)

    return f


def _star_specs(stars: MSStars):
    return jax.tree_util.tree_map(lambda _: P(STAR_AXIS), stars)


def run_hmc_sharded(
    model: SinglePopModel,
    transform,
    init_z: Array,   # [C_total, P] unconstrained initial positions
    key: Array,
    cfg: hmc_mod.HMCConfig,
    mesh: Mesh,
):
    """HMC over a (chains x stars) mesh.  Returns (z samples
    [n_rec, C_total, P], info) with device-invariant info scalars."""
    model = shard_stars(model, mesh)
    stars = model.stars
    frame = dataclasses.replace(model, stars=None)

    def device_fn(stars_local, init_z_local, key):
        ci = jax.lax.axis_index(CHAIN_AXIS)
        # All star-shards of one chain block MUST share the same RNG
        # stream: their psum-ed logpost is identical, and identical keys
        # keep proposals/accepts in lockstep (no cross-shard divergence).
        dkey = jax.random.fold_in(key, ci)
        base = local_logpost_fn(frame, stars_local, STAR_AXIS)

        def logpost_z(z):
            x = transform.forward(z)
            return base(x) + transform.log_det_jacobian(z)

        samples, info = hmc_mod.run_hmc(
            logpost_z, init_z_local, dkey, cfg, axis_name=CHAIN_AXIS
        )
        accept = jax.lax.pmean(info["accept_prob"], CHAIN_AXIS)
        return samples, accept, info["step_size"], info["inv_mass"]

    fn = shard_map(
        device_fn,
        mesh=mesh,
        in_specs=(_star_specs(stars), P(CHAIN_AXIS, None), P()),
        out_specs=(P(None, CHAIN_AXIS, None), P(), P(), P()),
        check_vma=False,
    )
    samples, accept, step_size, inv_mass = jax.jit(fn)(stars, init_z, key)
    return samples, dict(
        accept_prob=accept, step_size=step_size, inv_mass=inv_mass
    )


def run_nuts_sharded(
    model: SinglePopModel,
    transform,
    init_z: Array,   # [C_total, P]
    key: Array,
    cfg,             # nuts.NUTSConfig
    mesh: Mesh,
):
    """NUTS over the (chains x stars) mesh — same contract as
    run_hmc_sharded (dual averaging pools across devices inside
    nuts.run_nuts via axis_name)."""
    from base_tpu.inference import nuts as nuts_mod

    model = shard_stars(model, mesh)
    stars = model.stars
    frame = dataclasses.replace(model, stars=None)

    def device_fn(stars_local, init_z_local, key):
        ci = jax.lax.axis_index(CHAIN_AXIS)
        dkey = jax.random.fold_in(key, ci)
        base = local_logpost_fn(frame, stars_local, STAR_AXIS)

        def logpost_z(z):
            x = transform.forward(z)
            return base(x) + transform.log_det_jacobian(z)

        samples, info = nuts_mod.run_nuts(
            logpost_z, init_z_local, dkey, cfg, axis_name=CHAIN_AXIS
        )
        accept = jax.lax.pmean(info["accept_prob"], CHAIN_AXIS)
        nlf = jax.lax.pmean(info["mean_leapfrogs"], CHAIN_AXIS)
        return samples, accept, info["step_size"], info["inv_mass"], nlf

    fn = shard_map(
        device_fn,
        mesh=mesh,
        in_specs=(_star_specs(stars), P(CHAIN_AXIS, None), P()),
        out_specs=(P(None, CHAIN_AXIS, None), P(), P(), P(), P()),
        check_vma=False,
    )
    samples, accept, step_size, inv_mass, nlf = jax.jit(fn)(
        stars, init_z, key
    )
    return samples, dict(
        accept_prob=accept, step_size=step_size, inv_mass=inv_mass,
        mean_leapfrogs=nlf,
    )


def run_smc_sharded(
    model: SinglePopModel,
    transform,
    center_z: Array,        # [P] q0 center in unconstrained space
    key: Array,
    cfg,                    # smc.SMCConfig (n_particles = PER SHARD)
    mesh: Mesh,
    q0_sd: float = 0.5,
):
    """Tempered SMC over the (chains x stars) mesh: particles shard on
    the chain axis (pooled-weight systematic resampling via all_gather),
    stars shard inside the density via psum — the pod-scale
    BASELINE.json:11 configuration.  Returns (particles [N_total, P],
    info)."""
    from base_tpu.inference import smc as smc_mod

    model = shard_stars(model, mesh)
    stars = model.stars
    frame = dataclasses.replace(model, stars=None)
    P_dim = center_z.shape[0]

    def device_fn(stars_local, key):
        ci = jax.lax.axis_index(CHAIN_AXIS)
        base = local_logpost_fn(frame, stars_local, STAR_AXIS)

        def log_target(z):
            x = transform.forward(z)
            return base(x) + transform.log_det_jacobian(z)

        def log_q0(z):
            return jnp.sum(
                -0.5 * ((z - center_z) / q0_sd) ** 2
                - jnp.log(q0_sd) - 0.9189385332046727
            )

        def sample_q0(k, n):
            # distinct particles per chain shard, identical across star
            # shards (their psum-ed density keeps them in lockstep)
            kk = jax.random.fold_in(k, ci)
            return center_z[None, :] + q0_sd * jax.random.normal(
                kk, (n, P_dim)
            )

        return smc_mod.run_smc(
            log_target, sample_q0, log_q0, key, cfg,
            axis_name=CHAIN_AXIS,
        )

    fn = shard_map(
        device_fn,
        mesh=mesh,
        in_specs=(_star_specs(stars), P()),
        out_specs=(
            P(CHAIN_AXIS, None),
            dict(log_evidence=P(), beta=P(), n_stages=P(), accept=P(),
                 betas=P()),
        ),
        check_vma=False,
    )
    particles, info = jax.jit(fn)(stars, key)
    return particles, info


def run_mh_sharded(
    model: SinglePopModel,
    init_position: Array,   # [C_total, P]
    key: Array,
    step_init: Array,       # [P]
    cfg: mh_mod.MHConfig,
    mesh: Mesh,
):
    """Reference-parity adaptive MH over the (chains x stars) mesh.
    Chains are embarrassingly parallel; stars psum inside the density."""
    model = shard_stars(model, mesh)
    stars = model.stars
    frame = dataclasses.replace(model, stars=None)

    def device_fn(stars_local, init_local, key):
        ci = jax.lax.axis_index(CHAIN_AXIS)
        dkey = jax.random.fold_in(key, ci)
        f = local_logpost_fn(frame, stars_local, STAR_AXIS)

        def one_chain(pos, k):
            return mh_mod.run_adaptive_mh(f, pos, k, step_init, cfg)

        C_local = init_local.shape[0]
        keys = jax.random.split(dkey, C_local)
        samples, info = jax.vmap(one_chain)(init_local, keys)
        acc = jax.lax.pmean(jnp.mean(info["accept_rate"]), CHAIN_AXIS)
        return samples, info["logposts"], acc

    fn = shard_map(
        device_fn,
        mesh=mesh,
        in_specs=(_star_specs(stars), P(CHAIN_AXIS, None), P()),
        out_specs=(P(CHAIN_AXIS, None, None), P(CHAIN_AXIS, None), P()),
        check_vma=False,
    )
    samples, logposts, accept = jax.jit(fn)(stars, init_position, key)
    # [C_total, n_rec, P] -> [n_rec, C_total, P] to match diagnostics.
    return jnp.swapaxes(samples, 0, 1), dict(
        accept_rate=accept, logposts=logposts
    )
