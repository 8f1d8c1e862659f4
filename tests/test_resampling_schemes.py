"""Resampling scheme properties: unbiasedness and count bounds.

Each scheme must be unbiased (E[#offspring of j] = N w_j) and respect its
variance-reduction structure (systematic/stratified/residual counts within
floor/ceil bounds of N w_j).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from modppl_tpu.parallel.resample import RESAMPLERS

N = 64


def _weights(seed, scale=1.5):
    lw = jax.random.normal(jax.random.PRNGKey(seed), (N,)) * scale
    return lw - jax.scipy.special.logsumexp(lw)


@pytest.mark.parametrize("name", ["multinomial", "systematic", "stratified",
                                  "residual"])
def test_unbiased_offspring_counts(name):
    lw = _weights(0)
    w = np.asarray(jnp.exp(lw), dtype=np.float64)
    w = w / w.sum()
    fn = jax.jit(lambda k: RESAMPLERS[name](k, lw))
    reps = 3000
    counts = np.zeros(N)
    for r in range(reps):
        parents = np.asarray(fn(jax.random.PRNGKey(r + 1)))
        assert parents.shape == (N,)
        assert parents.min() >= 0 and parents.max() < N
        counts += np.bincount(parents, minlength=N)
    mean_counts = counts / reps
    # E[count_j] = N * w_j within Monte Carlo error (~4 sigma)
    se = np.sqrt(N * w * (1 - w) / reps) + 1e-3
    np.testing.assert_array_less(np.abs(mean_counts - N * w), 5 * se + 0.05)


@pytest.mark.parametrize("name", ["systematic", "stratified", "residual"])
def test_low_variance_count_bounds(name):
    lw = _weights(1)
    w = np.asarray(jnp.exp(lw), dtype=np.float64)
    w = w / w.sum()
    fn = jax.jit(lambda k: RESAMPLERS[name](k, lw))
    for r in range(50):
        parents = np.asarray(fn(jax.random.PRNGKey(r + 100)))
        counts = np.bincount(parents, minlength=N)
        lo = np.floor(N * w) - 1e-9
        hi = np.ceil(N * w) + 1e-9
        if name == "residual":
            # deterministic floor copies guaranteed; remainder adds <= a few
            assert np.all(counts >= np.floor(N * w) - 1e-9)
        elif name == "systematic":
            # systematic offspring in {floor, ceil} (single coupled uniform)
            assert np.all(counts >= lo) and np.all(counts <= hi + 1)
        else:
            # stratified: per-stratum uniforms allow one extra +-1 slack
            assert np.all(counts >= lo - 1) and np.all(counts <= hi + 2)


def test_degenerate_weight_single_parent():
    lw = jnp.full((N,), -jnp.inf).at[17].set(0.0)
    for name, fn in RESAMPLERS.items():
        parents = np.asarray(fn(jax.random.PRNGKey(0), lw))
        assert np.all(parents == 17), name
