"""Distributed SMC and MCMC over a device mesh.

SURVEY.md §2b items 1-3: particles/chains shard over the mesh's ``dp`` axis;
weight normalization and the log-ML estimate become collective reductions;
resampling ancestry is exchanged with ``all_gather``.

Two execution styles:

1. **SPMD-partitioned** (`sharded_particle_filter`): the compiled
   single-program filter from inference/vsmc.py run under sharding
   constraints — XLA's partitioner inserts psum/all-to-all for the
   logsumexp reductions and the resampling gather. Zero algorithm changes.

2. **Explicit shard_map** (`shardmap_resample_fn`): deterministic cross-shard
   systematic resampling with a *fixed* reduction order — the weight vector
   is all-gathered in shard order and reduced locally, so ancestors are
   bitwise-identical for any dp size (the BASELINE.json determinism
   requirement), which `tests/test_sharded.py` asserts 1-vs-8 devices.

SCALE NOTE (round 4): both forms here move O(N) state per shard —
`shardmap_resample_fn` all_gathers the full particle state. They remain as
the simple/reference implementations (and for the vmapped tier); the
SCALABLE path is :mod:`modppl_tpu.parallel.sharded_smc`, which shards the
fast batched tier itself and exchanges only boundary segments
(O(N) int32 ancestors + O(halo·C) state rows per shard) with the same
bitwise layout invariance. Use `sharded_batched_particle_filter` for the
10^6-particle cross-host configuration (BASELINE configs[4]).
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from modppl_tpu.inference import vsmc
from modppl_tpu.parallel.mesh import constrain_particles
from modppl_tpu.parallel.resample import RESAMPLERS, systematic_parents
from modppl_tpu.utils import logsumexp


# --------------------------------------------------------------------------
# 1. SPMD-partitioned filter
# --------------------------------------------------------------------------

def sharded_particle_filter(mesh, key, kernel, state0, init_constraints,
                            step_constraints, num_particles,
                            resampling="systematic", ess_threshold=1.0):
    """The compiled particle filter with its particle axis sharded over dp.

    Same semantics and results as inference/vsmc.particle_filter; XLA
    partitions the per-particle vmap across the mesh and inserts the
    collectives for normalization/resampling.
    """
    resampler = RESAMPLERS[resampling]

    @partial(jax.jit, static_argnames=())
    def run(key, state0, init_constraints, step_constraints):
        s, init_traces = vsmc.smc_init(key, kernel, state0, init_constraints,
                                       num_particles)
        s = vsmc.SMCState(s.key, constrain_particles(s.state, mesh),
                          constrain_particles(s.log_weights, mesh),
                          s.log_ml, s.t)

        def body(carry, cons_t):
            carry, ys = vsmc.smc_step(carry, kernel, cons_t, num_particles,
                                      resampler, ess_threshold)
            carry = vsmc.SMCState(
                carry.key, constrain_particles(carry.state, mesh),
                constrain_particles(carry.log_weights, mesh),
                carry.log_ml, carry.t)
            return carry, ys

        s, (step_traces, parents, ess, resampled) = jax.lax.scan(
            body, s, step_constraints)
        log_ml = s.log_ml + logsumexp(s.log_weights) \
            - jnp.log(float(num_particles))
        return {"state": s.state, "log_weights": s.log_weights,
                "log_ml": log_ml, "ess": ess, "ancestors": parents}

    with mesh:
        return run(key, state0, init_constraints, step_constraints)


# --------------------------------------------------------------------------
# 2. Explicit deterministic cross-shard resampling (shard_map)
# --------------------------------------------------------------------------

def shardmap_resample_fn(mesh, axis="dp"):
    """Build a deterministic cross-shard systematic resampler.

    Returns ``resample(key, log_weights_local, state_local) ->
    (new_state_local, parents_local, log_total_weight)`` where the local
    arrays carry the per-shard slice of the particle axis.

    Fixed reduction order: weights are all-gathered ordered by shard index
    and reduced locally (identically on every shard), so the global
    ancestor vector — and therefore the resampled particle system — is
    bitwise-identical regardless of the number of shards.
    """

    def local_fn(key, lw_local, state_local):
        # all_gather in shard order -> every shard sees the full, identically
        # ordered weight vector (tiled=True concatenates along axis 0)
        lw_all = jax.lax.all_gather(lw_local, axis, tiled=True)
        n_total = lw_all.shape[0]
        n_local = lw_local.shape[0]
        log_total = logsumexp(lw_all)
        log_norm = lw_all - log_total
        parents = systematic_parents(key, log_norm)  # same on all shards
        idx = jax.lax.axis_index(axis)
        my_parents = jax.lax.dynamic_slice_in_dim(
            parents, idx * n_local, n_local)
        state_all = jax.tree_util.tree_map(
            lambda x: jax.lax.all_gather(x, axis, tiled=True), state_local)
        new_state_local = jax.tree_util.tree_map(
            lambda x: jnp.take(x, my_parents, axis=0), state_all)
        return new_state_local, my_parents, log_total

    in_specs = (P(), P(axis), P(axis))
    out_specs = (P(axis), P(axis), P())
    return shard_map(local_fn, mesh=mesh, in_specs=in_specs,
                     out_specs=out_specs, check_vma=False)


def distributed_logsumexp_fn(mesh, axis="dp"):
    """psum-based distributed logsumexp over a sharded vector (fixed-order
    per-shard partial reduction + pmax/psum)."""

    def local_fn(lw_local):
        m_local = jnp.max(lw_local)
        m = jax.lax.pmax(m_local, axis)
        s = jax.lax.psum(jnp.sum(jnp.exp(lw_local - m)), axis)
        return m + jnp.log(s)

    return shard_map(local_fn, mesh=mesh, in_specs=(P(axis),),
                     out_specs=P(), check_vma=False)


# --------------------------------------------------------------------------
# Sharded HMC chains
# --------------------------------------------------------------------------

def sharded_hmc(mesh, key, model, args, observed, **hmc_kwargs):
    """Run inference/hmc.hmc with the chain axis sharded over the mesh's dp
    axis (the 10^4-chain north-star configuration). Multi-chain runs use
    pooled adaptation by default (hmc's own default); for the explicitly
    collective, bitwise-deterministic layout use :func:`shardmap_hmc`."""
    from modppl_tpu.inference.hmc import hmc

    with mesh:
        return hmc(key, model, args, observed, **hmc_kwargs)


def shardmap_hmc(mesh, key, model, args, observed, *, num_samples=1000,
                 num_warmup=500, num_chains=8, step_size=0.1,
                 num_leapfrog=16, target_accept=0.8, selection=None,
                 axis="dp"):
    """Pooled-adaptation HMC with the chain axis explicitly sharded.

    The whole pipeline (warmup with psum/all_gather-pooled dual averaging +
    Welford mass, then sampling) runs under ``shard_map``; the shared
    (eps, inv_mass) are adapted from ALL chains' statistics with the fixed
    reduction order of adaptation._pooled_sum, and per-chain PRNG streams
    key off global chain indices — so the run is bitwise-identical to
    ``hmc(..., pooled_adaptation=True)`` on one
    device (asserted in tests/test_pooled_adaptation.py).
    """
    from modppl_tpu.inference.hmc import (
        _pooled_chains,
        make_unconstrained_logprob,
    )
    from jax.flatten_util import ravel_pytree

    n_shards = mesh.shape[axis]
    if num_chains % n_shards:
        raise ValueError(f"num_chains {num_chains} not divisible by "
                         f"{axis}={n_shards}")

    # identical setup + key derivations to inference/hmc.hmc
    k_init, k_run = jax.random.split(key)
    init_trace, _ = model.generate(k_init, args, observed)
    logprob, u0, _, constrain = make_unconstrained_logprob(
        model, args, init_trace, observed, selection)
    u0_flat, unravel = ravel_pytree(u0)

    def logprob_flat(u_flat):
        return logprob(unravel(u_flat))

    chain_keys = jax.random.split(k_run, num_chains)
    jitter = jax.vmap(lambda k: 0.5 * jax.random.normal(
        k, u0_flat.shape, u0_flat.dtype))(chain_keys)
    u0s = u0_flat[None, :] + jitter

    def local_fn(k, u0s_local):
        return _pooled_chains(k, logprob_flat, u0s_local, num_warmup,
                              num_samples, step_size, num_leapfrog,
                              target_accept, axis_name=axis)

    run = shard_map(local_fn, mesh=mesh,
                    in_specs=(P(), P(axis)),
                    out_specs=(P(axis), P(axis), P(axis), P(axis), P(),
                               P()),
                    check_vma=False)
    with mesh:
        us, logps, aprobs, divs, eps, inv_mass = jax.jit(run)(
            jax.random.fold_in(k_run, 0), u0s)

    def constrain_flat(u_flat):
        return constrain(unravel(u_flat))

    samples = jax.vmap(jax.vmap(constrain_flat))(us)
    return {"samples": samples, "logp": logps, "accept_prob": aprobs,
            "divergences": divs, "step_size": eps, "inv_mass": inv_mass,
            "unconstrained": us}


def shardmap_chees(mesh, key, model, args, observed, *, num_chains=8,
                   axis="dp", **chees_kwargs):
    """ChEES-HMC with the chain axis explicitly sharded (round 5).

    The pooled trajectory-length + step-size + mass adaptation crosses
    shards through adaptation._pooled_sum's fixed add trees, and per-chain
    randoms key off GLOBAL chain indices — dp=1 and dp=8 runs of the same
    problem agree (asserted in tests/test_chees.py). The ChEES criterion's
    cross-chain means pool over ALL chains on every shard, so the shared
    (eps, tau) see the full 10^4-chain signal.
    """
    from modppl_tpu.inference.chees import chees_runner

    n_shards = mesh.shape[axis]
    if num_chains % n_shards:
        raise ValueError(f"num_chains {num_chains} not divisible by "
                         f"{axis}={n_shards}")

    k_init, k_run = jax.random.split(key)
    runner = chees_runner(model, args, observed, num_chains=num_chains,
                          axis_name=axis, setup_key=k_init, **chees_kwargs)
    u0_flat = runner.u0_flat

    # identical global u0s construction to the single-device runner
    chain_keys = jax.random.split(k_run, num_chains)
    jitter = jax.vmap(lambda k: 0.5 * jax.random.normal(
        k, u0_flat.shape, u0_flat.dtype))(chain_keys)
    u0s = u0_flat[None, :] + jitter

    sharded = shard_map(
        runner.chains, mesh=mesh,
        in_specs=(P(), P(axis)),
        out_specs=(P(axis), P(axis), P(axis), P(axis), P(), P(), P()),
        check_vma=False)
    with mesh:
        us, logps, aprobs, divs, nsteps, eps, tau = jax.jit(sharded)(
            k_run, u0s)

    samples = jax.vmap(jax.vmap(runner.constrain_flat))(us)
    return {"samples": samples, "logp": logps, "accept_prob": aprobs,
            "divergences": divs, "step_size": eps,
            "trajectory_length": tau, "num_leapfrog": nsteps,
            "unconstrained": us}
