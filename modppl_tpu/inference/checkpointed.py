"""Checkpointed inference drivers: resumable long SMC and HMC runs.

SURVEY.md §5 / VERDICT r3 #8: utils/checkpoint.py serializes pytrees, but
until round 4 neither runner could emit or resume a mid-run checkpoint — a
preempted 10^6-particle filter or long-warmup HMC run restarted from zero.
These drivers chunk the compiled programs on the host and persist the
carry every ``checkpoint_every`` steps:

- the UNINTERRUPTED run executes the same chunked programs with the same
  per-chunk key slices, so a resumed run is BITWISE-identical to an
  uninterrupted one (asserted in tests/test_checkpointed.py);
- each chunk is one cached XLA program (two shapes at most: full chunk +
  remainder), so the steady-state cost matches the monolithic scan.
"""

from functools import partial

import jax
import jax.numpy as jnp

from modppl_tpu.inference import vsmc
from modppl_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint


# --------------------------------------------------------------------------
# SMC: chunked particle filter
# --------------------------------------------------------------------------

def checkpointed_particle_filter(key, kernel, state0, init_constraints,
                                 step_constraints, num_particles, *,
                                 checkpoint_path, checkpoint_every,
                                 resume_from=None, resampling="systematic",
                                 ess_threshold=1.0):
    """`vsmc.particle_filter` semantics, chunked over time with a
    checkpoint after every ``checkpoint_every`` steps.

    Args:
      checkpoint_path: file prefix for utils/checkpoint.py artifacts (the
        same path is overwritten each chunk — the checkpoint IS the most
        recent resumable state).
      resume_from: a checkpoint path to restore; the filter then processes
        only the remaining steps (``step_constraints`` must be the SAME
        full-length constraints as the original run).

    Returns {"state", "log_weights", "log_ml", "t"} — the final particle
    system (per-step stacks are not accumulated across chunks; long runs
    are exactly the case where O(T·N) stacks do not fit).
    """
    resampler = vsmc.RESAMPLERS[resampling]
    total_steps = jax.tree_util.tree_leaves(step_constraints)[0].shape[0]

    @partial(jax.jit, static_argnames=("num_steps",))
    def chunk_fn(s, cons_chunk, num_steps):
        def body(carry, cons_t):
            carry, _ = vsmc.smc_step(carry, kernel, cons_t, num_particles,
                                     resampler, ess_threshold,
                                     store_traces=False)
            return carry, None

        s, _ = jax.lax.scan(body, s, cons_chunk, length=num_steps)
        return s

    if resume_from is None:
        s, _ = vsmc.smc_init(key, kernel, state0, init_constraints,
                             num_particles)
        done = 0
    else:
        # restore into the init structure (same model/config required)
        s_example, _ = vsmc.smc_init(key, kernel, state0, init_constraints,
                                     num_particles)
        s, meta = restore_checkpoint(resume_from, s_example)
        done = int(meta["step"])

    while done < total_steps:
        k = min(checkpoint_every, total_steps - done)
        cons_chunk = jax.tree_util.tree_map(
            lambda x: jax.lax.dynamic_slice_in_dim(x, done, k),
            step_constraints)
        s = chunk_fn(s, cons_chunk, k)
        done += k
        jax.block_until_ready(s.log_ml)
        save_checkpoint(checkpoint_path, s, step=done)

    from modppl_tpu.utils import logsumexp

    log_ml = s.log_ml + logsumexp(s.log_weights) \
        - jnp.log(float(num_particles))
    return {"state": s.state, "log_weights": s.log_weights,
            "log_ml": log_ml, "t": s.t}


# --------------------------------------------------------------------------
# SMC: chunked SHARDED batched filter (the 10^6-particle headline tier)
# --------------------------------------------------------------------------

def checkpointed_sharded_particle_filter(mesh, key, kernel, state0,
                                         init_constraints, step_constraints,
                                         num_particles, *, checkpoint_path,
                                         checkpoint_every, resume_from=None,
                                         ess_threshold=1.0, auto_batch=False,
                                         halo=None):
    """`parallel.sharded_smc.sharded_batched_particle_filter` semantics,
    chunked over time with a checkpoint after every ``checkpoint_every``
    steps (VERDICT r4 #3 — the 10^6-particle run is the one most worth
    preempt-protecting; until round 5 only the vmapped tier could resume).

    Each chunk scans the EXACT per-step body of the one-shot sharded
    filter (sharded_smc._filter_parts), so a resumed run is
    BITWISE-identical to an uninterrupted equally-chunked run at dp=1 AND
    dp=8 (tests/test_checkpointed.py). Per-step ancestry/ESS stacks are
    not accumulated (the long-run convention of
    :func:`checkpointed_particle_filter`).

    Returns {"state", "log_weights", "log_ml", "t"}.
    """
    from modppl_tpu.parallel import sharded_smc
    from modppl_tpu.parallel.mesh import constrain_particles

    body, lse, wrapped = sharded_smc._filter_parts(
        mesh, kernel, num_particles, ess_threshold, auto_batch, halo,
        False, None, None, None)
    total_steps = jax.tree_util.tree_leaves(step_constraints)[0].shape[0]

    @partial(jax.jit, static_argnames=("num_steps",))
    def chunk_fn(s, cons_chunk, num_steps):
        def b(carry, cons_t):
            carry, _ = body(carry, cons_t)
            return carry, None

        s, _ = jax.lax.scan(b, s, cons_chunk, length=num_steps)
        return s

    @jax.jit
    def init_fn(k):
        s, _ = vsmc.batched_smc_init(k, wrapped, state0, init_constraints,
                                     num_particles)
        return vsmc.SMCState(s.key, constrain_particles(s.state, mesh),
                             constrain_particles(s.log_weights, mesh),
                             s.log_ml, s.t)

    if resume_from is None:
        s = init_fn(key)
        done = 0
    else:
        s_example = init_fn(key)
        s, meta = restore_checkpoint(resume_from, s_example)
        done = int(meta["step"])

    while done < total_steps:
        k = min(checkpoint_every, total_steps - done)
        cons_chunk = jax.tree_util.tree_map(
            lambda x: jax.lax.dynamic_slice_in_dim(x, done, k),
            step_constraints)
        s = chunk_fn(s, cons_chunk, k)
        done += k
        jax.block_until_ready(s.log_ml)
        save_checkpoint(checkpoint_path, s, step=done)

    log_ml = s.log_ml + lse(s.log_weights) \
        - jnp.log(float(num_particles))
    return {"state": s.state, "log_weights": s.log_weights,
            "log_ml": log_ml, "t": s.t}


# --------------------------------------------------------------------------
# HMC: chunked pooled-adaptation sampler
# --------------------------------------------------------------------------

def checkpointed_hmc_runner(model, args, observed, *, checkpoint_path,
                            checkpoint_every, num_samples=1000,
                            num_warmup=500, num_chains=2, step_size=0.1,
                            num_leapfrog=16, target_accept=0.8,
                            selection=None, setup_key=None):
    """Build a resumable pooled-adaptation HMC runner.

    Returns ``run(key, resume_from=None) -> dict`` (hmc_runner's output
    contract minus the quadratic fast path): warmup runs as one program,
    then sampling proceeds in ``checkpoint_every``-sized chunks, saving
    (positions, eps, inv_mass, collected count) after each. A resumed run
    re-executes only the remaining chunks with the same per-chunk key
    slices — bitwise-identical outputs to the uninterrupted chunked run.
    """
    from jax.flatten_util import ravel_pytree

    from modppl_tpu.inference.adaptation import run_warmup_pooled
    from modppl_tpu.inference.hmc import (
        hmc_transition,
        make_unconstrained_logprob,
    )

    if num_chains < 2:
        raise ValueError("checkpointed_hmc_runner: pooled adaptation needs "
                         "num_chains >= 2")

    init_trace, _ = model.generate(
        setup_key if setup_key is not None else jax.random.PRNGKey(0),
        args, observed)
    logprob, u0, _, constrain = make_unconstrained_logprob(
        model, args, init_trace, observed, selection)
    u0_flat, unravel = ravel_pytree(u0)

    def logprob_flat(u_flat):
        return logprob(unravel(u_flat))

    grad = jax.grad(logprob_flat)

    @jax.jit
    def warm(k_run):
        chain_keys = jax.random.split(k_run, num_chains)
        jitter = jax.vmap(lambda k: 0.5 * jax.random.normal(
            k, u0_flat.shape, u0_flat.dtype))(chain_keys)
        u0s = u0_flat[None, :] + jitter
        key = jax.random.fold_in(k_run, 0)

        def warm_transition(k, u, eps, inv_mass):
            u, _, aprob, _ = hmc_transition(k, u, logprob_flat, grad, eps,
                                            num_leapfrog, inv_mass)
            return u, aprob

        us, eps, inv_mass = run_warmup_pooled(
            jax.random.fold_in(key, 0), u0s, warm_transition, num_warmup,
            step_size, target_accept)
        return us, eps, inv_mass

    @partial(jax.jit, static_argnames=("k_steps",))
    def chunk(us, eps, inv_mass, k_run, start, k_steps):
        key = jax.random.fold_in(k_run, 0)
        base = jax.random.fold_in(key, 2)
        # per-sample keys by INDEX fold-in — invariant to chunk boundaries
        # and to num_samples, so any resume schedule replays the same
        # stream
        keys = jax.vmap(lambda i: jax.random.fold_in(base, i))(
            start + jnp.arange(k_steps))
        gidx = jnp.arange(num_chains)

        def sample_body(us_c, k):
            ks = jax.vmap(lambda i: jax.random.fold_in(k, i))(gidx)
            us_c, logps, aprobs, divs = jax.vmap(
                lambda kk, uu: hmc_transition(
                    kk, uu, logprob_flat, grad, eps, num_leapfrog,
                    inv_mass))(ks, us_c)
            return us_c, (us_c, logps, aprobs, divs)

        us, ys = jax.lax.scan(sample_body, us, keys)
        return us, ys

    def constrain_flat(u_flat):
        return constrain(unravel(u_flat))

    def run(k_run, resume_from=None):
        if resume_from is None:
            us, eps, inv_mass = warm(k_run)
            done = 0
        else:
            example = {"us": jnp.zeros((num_chains,) + u0_flat.shape,
                                       u0_flat.dtype),
                       "eps": jnp.zeros((), u0_flat.dtype),
                       "inv_mass": jnp.zeros(u0_flat.shape, u0_flat.dtype)}
            state, meta = restore_checkpoint(resume_from, example)
            us, eps, inv_mass = (state["us"], state["eps"],
                                 state["inv_mass"])
            done = int(meta["step"])

        outs = []
        while done < num_samples:
            k = min(checkpoint_every, num_samples - done)
            us, ys = chunk(us, eps, inv_mass, k_run, done, k)
            outs.append(ys)
            done += k
            jax.block_until_ready(us)
            save_checkpoint(checkpoint_path,
                            {"us": us, "eps": eps, "inv_mass": inv_mass},
                            step=done)

        uss, logps, aprobs, divs = (
            jnp.concatenate([y[i] for y in outs], axis=0)
            for i in range(4))
        sw = lambda x: jnp.swapaxes(x, 0, 1)
        uss, logps, aprobs, divs = sw(uss), sw(logps), sw(aprobs), sw(divs)
        samples = jax.vmap(jax.vmap(constrain_flat))(uss)
        return {"samples": samples, "logp": logps, "accept_prob": aprobs,
                "divergences": divs, "step_size": eps,
                "unconstrained": uss}

    return run
