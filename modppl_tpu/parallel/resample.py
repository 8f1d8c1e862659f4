"""Vectorized resampling kernels.

TPU-native replacement for the reference's scalar multinomial resampling loop
(modppl/src/inference/particle_filter.rs:37-41 driving the inverse-CDF scan
at categorical.rs:24-31): ancestor indices are computed with one
cumulative-sum + vectorized searchsorted, and the "clone the selected traces"
loop (particle_filter.rs:109-114) becomes a single index-gather over the
batched trace pytree's leaves.

Systematic resampling (sorted stratified uniforms) is the default for the
compiled tier: lower variance than multinomial and — because it consumes a
single uniform — the natural basis for bitwise-deterministic distributed
resampling (see parallel/distributed.py).
"""

import jax
import jax.numpy as jnp


def multinomial_parents(key, log_normalized_weights, num=None):
    """IID categorical ancestors (reference semantics, particle_filter.rs:37-41)."""
    n = num if num is not None else log_normalized_weights.shape[0]
    return jax.random.categorical(key, log_normalized_weights, shape=(n,))


def systematic_parents(key, log_normalized_weights, num=None):
    """Systematic (stratified, single-uniform) ancestors.

    positions_i = (u + i)/n against the weight CDF; deterministic given
    (key, weights) and invariant to particle-axis sharding layout.
    """
    n_in = log_normalized_weights.shape[0]
    n = num if num is not None else n_in
    u = jax.random.uniform(key, ())
    positions = (u + jnp.arange(n, dtype=log_normalized_weights.dtype)) / n
    cdf = jnp.cumsum(jnp.exp(log_normalized_weights))
    cdf = cdf / cdf[-1]
    return jnp.clip(jnp.searchsorted(cdf, positions), 0, n_in - 1)


RESAMPLERS = {
    "multinomial": multinomial_parents,
    "systematic": systematic_parents,
}


def gather_particles(tree, parents):
    """traces[i] = traces[parents[i]] as one XLA gather over every leaf.

    Replaces the O(N·T) per-particle trace clone at particle_filter.rs:109-114.
    """
    return jax.tree_util.tree_map(lambda x: jnp.take(x, parents, axis=0), tree)
