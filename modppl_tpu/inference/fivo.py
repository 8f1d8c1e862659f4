"""FIVO / variational SMC: learn SMC proposal parameters by gradient ascent
on the filter's log-marginal-likelihood estimate.

No reference counterpart (the reference has no gradients). The filter's
``log_ml`` is a differentiable function of proposal parameters when the
proposal samples reparameterizably (every continuous sampler in
``dists.scalar`` is location-scale or a smooth transform of parameter-free
draws): ascending it tightens the FIVO bound

    E[log Z_hat] <= log Z,

pushing the proposal toward the locally-optimal p(x_t | x_{t-1}, y_t).
Gradients flow through weights and proposed samples; resampling ancestors
are integers, so their selection is treated as a stop-gradient (the
standard biased-but-effective FIVO gradient — Maddison et al. 2017,
Naesseth et al. 2018). Each optimization step is one compiled
filter-forward + backward on the device.
"""

from functools import partial

import jax
import jax.numpy as jnp
import optax

from modppl_tpu.inference.vsmc import batched_particle_filter, particle_filter


def fivo_objective(key, kernel, proposal, params, state0, init_constraints,
                   step_constraints, num_particles, resampling="multinomial",
                   ess_threshold=1.0, auto_batch=False):
    """The (stochastic) FIVO bound: log_ml of one guided filter run.

    ``auto_batch=True`` routes through the batched tier (VERDICT r3 #2):
    the model/proposal run under the record/plate scheme — gradients flow
    identically (every site with state-dependent params keeps its own
    per-lane reparameterized stream)."""
    if auto_batch:
        out = batched_particle_filter(
            key, kernel, state0, init_constraints, step_constraints,
            num_particles, resampling=resampling,
            ess_threshold=ess_threshold, auto_batch=True,
            proposal=proposal, proposal_params=params)
    else:
        out = particle_filter(
            key, kernel, state0, init_constraints, step_constraints,
            num_particles, resampling=resampling,
            ess_threshold=ess_threshold, store_traces=False,
            proposal=proposal, proposal_params=params)
    return out["log_ml"]


def fit_proposal(key, kernel, proposal, params0, state0, init_constraints,
                 step_constraints, num_particles, *, num_steps=200,
                 learning_rate=0.05, optimizer=None, batch_size=1,
                 resampling="multinomial", ess_threshold=1.0,
                 auto_batch=False):
    """Optimize proposal params by ascending the FIVO bound.

    Args:
      proposal: @gen over args (t, state, constraints_t, params).
      params0: initial parameter pytree (traced through the filter).
      batch_size: independent filter runs averaged per gradient step
        (vmapped — cuts gradient noise at linear compute cost).
    Returns (params, bounds) — the optimized parameters and the per-step
    (batch-mean) bound trajectory. The whole loop is one lax.scan of jitted
    value-and-grad steps.
    """
    opt = optimizer if optimizer is not None else optax.adam(learning_rate)

    obj = partial(fivo_objective, kernel=kernel, proposal=proposal,
                  state0=state0, init_constraints=init_constraints,
                  step_constraints=step_constraints,
                  num_particles=num_particles, resampling=resampling,
                  ess_threshold=ess_threshold, auto_batch=auto_batch)

    def batch_obj(p, k):
        ks = jax.random.split(k, batch_size)
        return jnp.mean(jax.vmap(lambda kk: obj(kk, params=p))(ks))

    grad_fn = jax.value_and_grad(batch_obj)

    @jax.jit
    def train_step(carry, k):
        params, opt_state = carry
        bound, grads = grad_fn(params, k)
        # ascend: negate grads for the minimizing optimizer
        updates, opt_state = opt.update(
            jax.tree_util.tree_map(jnp.negative, grads), opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), bound

    keys = jax.random.split(key, num_steps)
    (params, _), bounds = jax.lax.scan(
        train_step, (params0, opt.init(params0)), keys)
    return params, bounds
