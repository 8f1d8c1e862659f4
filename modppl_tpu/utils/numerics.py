"""Numerically-stable reductions used across the inference library.

Reference parity: ``logsumexp`` (modppl/src/lib.rs:34-45) — max-shifted
log-sum-exp over a vector, returning -inf on an all(-inf) input. Here it is a
single fused XLA reduction instead of a scalar loop, and works on any axis so
it can run per-shard and be combined with ``psum`` collectives.
"""

import jax.numpy as jnp
from jax.scipy.special import logsumexp as _jsp_logsumexp


def logsumexp(xs, axis=None):
    """log(sum(exp(xs))) with max-shift stability; -inf on all(-inf) input.

    Unlike naive max-shifting, handles the all(-inf) case without NaN
    (reference handles this explicitly at lib.rs:38-39; jax.scipy does too).
    """
    xs = jnp.asarray(xs)
    return _jsp_logsumexp(xs, axis=axis)


def effective_sample_size_from_log_weights(log_normalized_weights):
    """ESS = 1 / sum(w_i^2) computed in log space.

    Reference parity: ``ParticleSystem::effective_sample_size``
    (modppl/src/inference/particle_filter.rs:98-100):
    exp(-logsumexp(2 * log_normalized_weights)).
    """
    lw = jnp.asarray(log_normalized_weights)
    return jnp.exp(-logsumexp(2.0 * lw))
