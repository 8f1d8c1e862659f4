"""Conditional SMC and particle Gibbs (with ancestor sampling).

The other half of the particle-MCMC family started by
:mod:`modppl_tpu.inference.pmcmc` (Andrieu, Doucet & Holenstein 2010):
where PMMH targets *parameters* through an SMC likelihood estimate,
particle Gibbs targets the *latent trajectory* of a state-space model by
iterating conditional-SMC (CSMC) sweeps — a particle filter in which one
particle is pinned to the previous sweep's reference trajectory, making
the sampled path a valid Gibbs update for the exact smoothing posterior.
Ancestor sampling (Lindsten, Jordan & Schön, JMLR 2014) resamples the
pinned particle's ancestry each step, which breaks path degeneracy and
dramatically improves mixing for long sequences.

Everything compiles to one XLA program: a sweep is a ``lax.scan`` over
time of vmapped generates (as in inference/vsmc.py) plus one pinned
generate per step, and :func:`particle_gibbs` scans whole sweeps.

No reference counterpart (the reference's particle filter,
modppl/src/inference/particle_filter.rs, has no conditional form); built
generically on the GFI: the pinned particle's weight and the
ancestor-sampling scores are read off the trace's per-address logp leaves
rather than requiring model-specific densities.

Why CSMC stays on the VMAPPED tier (unlike FIVO/PMMH, which route through
the batched plate-stream tier via ``auto_batch=True``): the sweep's
log-ML is inseparable from its per-particle trace surgery — slot 0 is
overwritten with the reference trajectory after every extend (_splice0),
its weight is re-scored from the pinned generate, and validity requires
conditional *multinomial* ancestors with slot 0 pinned. A shared plate
stream would draw slot 0's latents from the common counter stream and
discard them, gaining nothing (the splice dominates), while the
per-particle vmap keeps the pinned lane an ordinary lane. The free
particles' extend is the same vmapped generate the reference tier uses.
"""

from functools import partial

import jax
import jax.numpy as jnp

from modppl_tpu.parallel.resample import gather_particles
from modppl_tpu.utils import logsumexp


def _constraints_with(base, extra_dict):
    """base constraints plus {addr: value} entries, as a fresh Trie."""
    out = base.copy()
    for addr, value in extra_dict.items():
        out.observe(addr, value)
    return out


def _score_at(trace, addrs):
    """Sum of the trace's recorded logps at (and below) the given addresses."""
    total = jnp.zeros(())
    for addr in addrs:
        total = total + trace.data.search(addr).weight()
    return total


def _splice0(batched, pinned):
    """Overwrite slot 0 of every leading-axis leaf with the pinned pytree."""
    return jax.tree_util.tree_map(
        lambda b, p: b.at[0].set(p), batched, pinned)


def csmc_sweep(key, kernel, state0, init_constraints, step_constraints,
               ref_init, ref_steps, num_particles, ancestor_sampling=True):
    """One conditional-SMC sweep; returns a freshly sampled trajectory.

    Args:
      kernel: ScanKernel (inference/vsmc.py) — static trace structure.
      init_constraints / step_constraints: observation Tries as in
        :func:`modppl_tpu.inference.vsmc.particle_filter` (step leaves carry
        a leading T-1 axis).
      ref_init: {addr: value} — the reference trajectory's latent choices
        for the init model.
      ref_steps: {addr: array[(T-1,) + shape]} — per-step latent choices of
        the reference for the step model.
      num_particles: N (slot 0 carries the reference).
      ancestor_sampling: resample the pinned particle's ancestor each step
        from w_i * p(ref_t | x_i) (PGAS); False pins ancestry to slot 0.

    Returns dict with ``ref_init`` / ``ref_steps`` (the newly sampled
    trajectory, same structure as the inputs) and ``log_ml`` (the sweep's
    marginal-likelihood estimate).
    """
    latent_init_addrs = tuple(sorted(ref_init.keys()))
    latent_step_addrs = tuple(sorted(ref_steps.keys()))
    obs_init_addrs = tuple(init_constraints.addresses())
    obs_step_addrs_trie = jax.tree_util.tree_map(
        lambda x: x[0], step_constraints)
    obs_step_addrs = tuple(obs_step_addrs_trie.addresses())

    k_init_free, k_init_pin, k_scan, k_pick = jax.random.split(key, 4)

    # ---- t = 0: free particles + pinned slot 0 -----------------------------
    keys = jax.random.split(k_init_free, num_particles)
    traces, log_w = jax.vmap(
        lambda k: kernel.init.generate(k, (state0,), init_constraints))(keys)
    pinned, _ = kernel.init.generate(
        k_init_pin, (state0,),
        _constraints_with(init_constraints, ref_init))
    log_w = log_w.at[0].set(_score_at(pinned, obs_init_addrs))
    states = _splice0(traces.retv, pinned.retv)
    choices0 = {a: jax.vmap(lambda d: d.read(a))(traces.data)
                   .at[0].set(pinned.data.read(a))
                for a in latent_init_addrs}

    def step(carry, inp):
        states, log_w, log_ml, t, key = carry
        cons_t, ref_t = inp
        key, k_res, k_anc, k_gen, k_pin = jax.random.split(key, 5)

        # resample (always): conditional *multinomial* — iid categorical
        # ancestors for the free slots with slot 0 pinned is exactly the
        # conditional resampling scheme CSMC's validity proof uses
        # (systematic assignment with an overwritten slot is not).
        log_total = logsumexp(log_w)
        log_norm = log_w - log_total
        log_ml = log_ml + log_total - jnp.log(float(num_particles))
        parents = jax.random.categorical(
            k_res, log_norm, shape=(num_particles,)).astype(jnp.int32)
        if ancestor_sampling:
            # PGAS: ancestor of the pinned slot ~ w_i * p(ref_t | x_i);
            # generate-with-full-constraints weight = logp(ref latents|x_i)
            # + logp(obs_t | ref latents) — the obs term is i-independent,
            # so it drops out of the categorical.
            full_t = _constraints_with(cons_t, ref_t)

            def ref_score(st):
                _, w = kernel.step.generate(
                    jax.random.PRNGKey(0), (t, st), full_t)
                return w

            anc_logits = log_norm + jax.vmap(ref_score)(states)
            parent0 = jax.random.categorical(k_anc, anc_logits).astype(
                jnp.int32)
        else:
            parent0 = jnp.zeros((), parents.dtype)
        parents = parents.at[0].set(parent0)
        states = gather_particles(states, parents)

        # extend: free particles + pinned slot 0 on the reference choices
        keys_g = jax.random.split(k_gen, num_particles)
        traces, log_w = jax.vmap(
            lambda k, st: kernel.step.generate(k, (t, st), cons_t)
        )(keys_g, states)
        state0_t = jax.tree_util.tree_map(lambda s: s[0], states)
        pinned, _ = kernel.step.generate(
            k_pin, (t, state0_t), _constraints_with(cons_t, ref_t))
        log_w = log_w.at[0].set(_score_at(pinned, obs_step_addrs))
        states = _splice0(traces.retv, pinned.retv)
        choices_t = {a: jax.vmap(lambda d: d.read(a))(traces.data)
                        .at[0].set(pinned.data.read(a))
                     for a in latent_step_addrs}
        return ((states, log_w, log_ml, t + 1, key),
                (choices_t, parents))

    carry0 = (states, log_w, jnp.zeros(()), jnp.ones((), jnp.int32), k_scan)
    (states, log_w, log_ml, _, _), (choices_steps, parents_steps) = \
        jax.lax.scan(step, carry0, (step_constraints, ref_steps))
    log_ml = log_ml + logsumexp(log_w) - jnp.log(float(num_particles))

    # ---- sample a trajectory and backtrack its ancestry --------------------
    j_final = jax.random.categorical(
        k_pick, log_w - logsumexp(log_w)).astype(jnp.int32)

    def back(j, inp):
        choices_t, parents_t = inp
        picked = {a: v[j] for a, v in choices_t.items()}
        return parents_t[j], picked

    j0, new_ref_steps = jax.lax.scan(
        back, j_final, (choices_steps, parents_steps), reverse=True)
    new_ref_init = {a: v[j0] for a, v in choices0.items()}
    return {"ref_init": new_ref_init, "ref_steps": new_ref_steps,
            "log_ml": log_ml}


def _prior_reference(key, kernel, state0, init_constraints, step_constraints,
                     latent_init_addrs, latent_step_addrs):
    """A single bootstrap path from the prior to seed the first sweep."""
    k0, k_scan = jax.random.split(key)
    tr0, _ = kernel.init.generate(k0, (state0,), init_constraints)
    ref_init = {a: tr0.data.read(a) for a in latent_init_addrs}

    def body(carry, inp):
        t, state, key = carry
        cons_t = inp
        key, k = jax.random.split(key)
        tr, _ = kernel.step.generate(k, (t, state), cons_t)
        return (t + 1, tr.retv, key), {a: tr.data.read(a)
                                       for a in latent_step_addrs}

    _, ref_steps = jax.lax.scan(
        body, (jnp.ones((), jnp.int32), tr0.retv, k_scan), step_constraints)
    return ref_init, ref_steps


@partial(jax.jit, static_argnames=(
    "kernel", "num_particles", "num_sweeps", "ancestor_sampling",
    "latent_init_addrs", "latent_step_addrs"))
def particle_gibbs(key, kernel, state0, init_constraints, step_constraints,
                   *, latent_init_addrs, latent_step_addrs,
                   num_particles=64, num_sweeps=200, ancestor_sampling=True):
    """Particle Gibbs: iterate CSMC sweeps, each conditioning on the last
    sampled trajectory. Targets the exact smoothing posterior
    p(x_{0:T-1} | y_{0:T-1}).

    Args:
      latent_init_addrs / latent_step_addrs: tuples naming the latent
        addresses of the init / step generative functions (the non-observed
        choices that constitute the trajectory).

    Returns {"init": {addr: (num_sweeps,) + shape},
             "steps": {addr: (num_sweeps, T-1) + shape},
             "log_ml": (num_sweeps,)} — one sampled trajectory per sweep.
    """
    k_seed, k_sweeps = jax.random.split(key)
    ref_init, ref_steps = _prior_reference(
        k_seed, kernel, state0, init_constraints, step_constraints,
        latent_init_addrs, latent_step_addrs)

    def sweep(carry, k):
        ref_init, ref_steps = carry
        out = csmc_sweep(k, kernel, state0, init_constraints,
                         step_constraints, ref_init, ref_steps,
                         num_particles, ancestor_sampling=ancestor_sampling)
        new = (out["ref_init"], out["ref_steps"])
        return new, (out["ref_init"], out["ref_steps"], out["log_ml"])

    keys = jax.random.split(k_sweeps, num_sweeps)
    _, (inits, steps, log_mls) = jax.lax.scan(
        sweep, (ref_init, ref_steps), keys)
    return {"init": inits, "steps": steps, "log_ml": log_mls}
