"""Metropolis-adjusted Langevin algorithm (MALA) with dual-averaging
step-size adaptation.

The lightest member of the gradient-inference family (extension beyond the
reference, which implements no gradient methods — README.md:44): one
gradient per proposal instead of HMC's leapfrog trajectory, with the
asymmetric-drift MH correction. Shares the unconstrained-space machinery
(:func:`modppl_tpu.inference.hmc.make_unconstrained_logprob`) and the
compiled shape — ``lax.scan`` over iterations, ``vmap`` over chains — so
10^4 chains run as one XLA program with the chain axis sharded over the
mesh.

Proposal: u' = u + (eps^2 / 2) grad(u) + eps * xi,  xi ~ N(0, I)
Accept:   log u01 < logp(u') - logp(u) + log q(u | u') - log q(u' | u)
"""

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from modppl_tpu.inference.hmc import da_init, da_update, make_unconstrained_logprob


def mala_transition(key, u, logp_val, grad_val, logp_fn, grad_fn, eps):
    """One MALA transition on flat coordinates.

    Carries (logp, grad) of the current point so each transition costs one
    fresh gradient, not two. Returns (u', logp', grad', accept_prob).
    """
    k_noise, k_acc = jax.random.split(key)
    noise = jax.random.normal(k_noise, u.shape, u.dtype)
    drift = 0.5 * eps * eps * grad_val
    u_new = u + drift + eps * noise
    logp_new = logp_fn(u_new)
    grad_new = grad_fn(u_new)
    # log q(u | u') - log q(u' | u), Gaussians with drifted means
    fwd = u_new - u - drift
    bwd = u - u_new - 0.5 * eps * eps * grad_new
    log_q_diff = (jnp.sum(fwd * fwd) - jnp.sum(bwd * bwd)) / (2.0 * eps * eps)
    log_alpha = logp_new - logp_val + log_q_diff
    accept_prob = jnp.minimum(1.0, jnp.exp(jnp.minimum(log_alpha, 0.0)))
    accept = (jnp.log(jax.random.uniform(k_acc, ())) < log_alpha) & \
        jnp.isfinite(logp_new)
    u = jnp.where(accept, u_new, u)
    logp_val = jnp.where(accept, logp_new, logp_val)
    grad_val = jnp.where(accept, grad_new, grad_val)
    return u, logp_val, grad_val, accept_prob


def _single_chain(key, logprob, u0, num_warmup, num_samples, eps0,
                  target_accept):
    grad = jax.grad(logprob)

    def warm_body(carry, k):
        u, logp_v, grad_v, da = carry
        eps = jnp.exp(da["log_eps"])
        u, logp_v, grad_v, aprob = mala_transition(
            k, u, logp_v, grad_v, logprob, grad, eps)
        return (u, logp_v, grad_v, da_update(da, aprob, target=target_accept)), None

    carry0 = (u0, logprob(u0), grad(u0), da_init(eps0))
    keys_w = jax.random.split(jax.random.fold_in(key, 0), num_warmup)
    (u, logp_v, grad_v, da), _ = jax.lax.scan(warm_body, carry0, keys_w)
    eps = jnp.exp(da["log_eps_bar"])

    def sample_body(carry, k):
        u, logp_v, grad_v = carry
        u, logp_v, grad_v, aprob = mala_transition(
            k, u, logp_v, grad_v, logprob, grad, eps)
        return (u, logp_v, grad_v), (u, logp_v, aprob)

    keys_s = jax.random.split(jax.random.fold_in(key, 1), num_samples)
    _, (us, logps, aprobs) = jax.lax.scan(
        sample_body, (u, logp_v, grad_v), keys_s)
    return us, logps, aprobs, eps


def mala(key, model, args, observed, *, num_samples=1000, num_warmup=500,
         num_chains=1, step_size=0.1, target_accept=0.574, selection=None,
         init_trace=None):
    """Run adaptive MALA; returns samples in constrained space + diagnostics.

    Same interface/returns as :func:`modppl_tpu.inference.hmc.hmc` (0.574 is
    the optimal-scaling acceptance target for Langevin proposals, Roberts &
    Rosenthal 1998).
    """
    k_init, k_run = jax.random.split(key)
    if init_trace is None:
        init_trace, _ = model.generate(k_init, args, observed)
    logprob, u0, bijectors, constrain = make_unconstrained_logprob(
        model, args, init_trace, observed, selection)
    u0_flat, unravel = ravel_pytree(u0)

    def logprob_flat(u_flat):
        return logprob(unravel(u_flat))

    chain_keys = jax.random.split(k_run, num_chains)
    jitter = jax.vmap(lambda k: 0.5 * jax.random.normal(
        k, u0_flat.shape, u0_flat.dtype))(chain_keys)
    u0s = u0_flat[None, :] + jitter

    us, logps, aprobs, eps = jax.vmap(
        lambda k, u: _single_chain(k, logprob_flat, u, num_warmup,
                                   num_samples, step_size, target_accept)
    )(chain_keys, u0s)

    def constrain_flat(u_flat):
        return constrain(unravel(u_flat))

    samples = jax.vmap(jax.vmap(constrain_flat))(us)
    return {
        "samples": samples,
        "logp": logps,
        "accept_prob": aprobs,
        "step_size": eps,
        "unconstrained": us,
    }
