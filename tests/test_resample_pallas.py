"""Pallas grid-rank resampling kernel: interpret-mode bitwise parity.

The kernel (ops/resample_pallas.py) replaces the XLA scatter+cumsum rank
computation on TPU; here it runs in interpret mode on CPU and must match
the XLA formulation bit-for-bit, including degenerate weight vectors.
"""

import jax
import jax.numpy as jnp
import numpy as np

from modppl_tpu.ops.resample_pallas import systematic_parents_pallas
from modppl_tpu.parallel import resample as R


def xla_systematic(key, lnw):
    u = jax.random.uniform(key, (), lnw.dtype)
    return R._grid_parents(R._normalized_cdf(lnw), u, lnw.shape[0])


def test_pallas_grid_rank_bitwise_parity():
    n = 4096
    cases = {
        "normal": jax.random.normal(jax.random.PRNGKey(0), (n,)),
        "peaked": jax.random.normal(jax.random.PRNGKey(1), (n,)) * 5.0,
        "uniform": jnp.zeros((n,)),
        "degenerate": jnp.full((n,), -1e9).at[1234].set(0.0),
        "two-spikes": jnp.full((n,), -1e9).at[0].set(0.0).at[n - 1].set(0.0),
    }
    for name, lw in cases.items():
        lw = lw - jax.scipy.special.logsumexp(lw)
        key = jax.random.PRNGKey(hash(name) % 2**31)
        ref = np.asarray(xla_systematic(key, lw))
        got = np.asarray(systematic_parents_pallas(key, lw, interpret=True))
        np.testing.assert_array_equal(got, ref, err_msg=name)


def test_pallas_parents_are_valid_ancestors():
    n = 2048
    lw = jax.random.normal(jax.random.PRNGKey(7), (n,))
    lw = lw - jax.scipy.special.logsumexp(lw)
    parents = np.asarray(systematic_parents_pallas(
        jax.random.PRNGKey(8), lw, interpret=True))
    assert parents.min() >= 0 and parents.max() < n
    assert np.all(np.diff(parents) >= 0)  # systematic ancestors are sorted
    # offspring counts match expectation N*w within +-1 (systematic property)
    counts = np.bincount(parents, minlength=n)
    expect = n * np.exp(np.asarray(lw))
    assert np.all(np.abs(counts - expect) <= 1.0 + 1e-6)
