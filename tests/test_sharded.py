"""Multi-device sharding tests on the virtual 8-device CPU mesh.

What the reference cannot test (it has no distributed machinery): sharded
SMC/HMC correctness, psum-based distributed logsumexp, and the BASELINE.json
determinism requirement — cross-shard systematic resampling bitwise-identical
between a 1-shard and an 8-shard mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from modppl_tpu import Trie
from modppl_tpu.models import HMMParams, hmm_forward_alg
from modppl_tpu.models.hmm import hmm_scan_kernel
from modppl_tpu.parallel.distributed import (
    distributed_logsumexp_fn,
    sharded_particle_filter,
    shardmap_resample_fn,
)
from modppl_tpu.parallel.mesh import make_mesh
from modppl_tpu.utils import logsumexp


def stack_tries(tries):
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *tries)


def hmm_setup():
    prior = jnp.array([0.2, 0.3, 0.5])
    emission = jnp.array([
        [0.1, 0.2, 0.7], [0.2, 0.7, 0.1], [0.7, 0.2, 0.1]]).T
    transition = jnp.array([
        [0.4, 0.4, 0.2], [0.2, 0.3, 0.5], [0.9, 0.05, 0.05]]).T
    params = HMMParams(prior, emission, transition)
    data = [0, 0, 1, 2]
    exact = float(jnp.log(hmm_forward_alg(prior, emission, transition, data)))
    init_c = Trie.from_dict({"obs": jnp.asarray(data[0])})
    step_c = stack_tries(
        [Trie.from_dict({"obs": jnp.asarray(o)}) for o in data[1:]])
    return hmm_scan_kernel(params), init_c, step_c, exact


def test_mesh_shapes():
    mesh = make_mesh()
    assert mesh.devices.size == 8
    mesh2 = make_mesh(dp=4, sp=2)
    assert mesh2.shape == {"dp": 4, "sp": 2}


def test_sharded_particle_filter_accuracy():
    kernel, init_c, step_c, exact = hmm_setup()
    mesh = make_mesh()  # 8-way dp
    out = sharded_particle_filter(
        mesh, jax.random.PRNGKey(0), kernel, jnp.zeros(()), init_c, step_c,
        16_000)
    assert float(out["log_ml"]) == pytest.approx(exact, abs=0.03)


def test_sharded_matches_unsharded_bitwise():
    # the SPMD-partitioned filter must produce the SAME numbers as the
    # single-device program — partitioning is layout, not semantics.
    from modppl_tpu.inference.vsmc import particle_filter

    kernel, init_c, step_c, exact = hmm_setup()
    ref = particle_filter(jax.random.PRNGKey(1), kernel, jnp.zeros(()),
                          init_c, step_c, 8000)
    mesh = make_mesh()
    out = sharded_particle_filter(
        mesh, jax.random.PRNGKey(1), kernel, jnp.zeros(()), init_c, step_c,
        8000)
    assert float(out["log_ml"]) == pytest.approx(float(ref["log_ml"]),
                                                 abs=1e-9)
    np.testing.assert_array_equal(np.asarray(out["ancestors"]),
                                  np.asarray(ref["ancestors"]))


def test_distributed_logsumexp():
    mesh = make_mesh()
    f = jax.jit(distributed_logsumexp_fn(mesh))
    lw = jax.random.normal(jax.random.PRNGKey(2), (4096,)) * 3.0
    with mesh:
        got = float(f(lw))
    assert got == pytest.approx(float(logsumexp(lw)), abs=1e-10)


def test_shardmap_resample_deterministic_across_shard_counts():
    # BASELINE.json: bitwise-deterministic resampling independent of shard
    # count, with a fixed reduction order.
    n = 1024
    key = jax.random.PRNGKey(3)
    lw = jax.random.normal(jax.random.PRNGKey(4), (n,))
    state = jax.random.normal(jax.random.PRNGKey(5), (n, 3))

    results = []
    for dp in (1, 2, 8):
        mesh = make_mesh(dp=dp, sp=8 // dp) if dp != 8 else make_mesh(dp=8)
        resample = jax.jit(shardmap_resample_fn(mesh))
        with mesh:
            new_state, parents, log_total = resample(key, lw, state)
        results.append((np.asarray(new_state), np.asarray(parents),
                        float(log_total)))

    for got in results[1:]:
        np.testing.assert_array_equal(got[0], results[0][0])
        np.testing.assert_array_equal(got[1], results[0][1])
        assert got[2] == results[0][2]  # bitwise

    # sanity: parents concentrate on high-weight particles
    parents = results[0][1]
    top = np.argsort(np.asarray(lw))[-n // 8:]
    frac = np.isin(parents, top).mean()
    assert frac > 0.35


def test_sharded_hmc_runs():
    from modppl_tpu import Trie, gen, normal
    from modppl_tpu.parallel.distributed import sharded_hmc

    @gen
    def conjugate(h):
        mu = h.sample(normal, (0.0, 1.0), "mu")
        h.sample(normal, (mu, 1.0), "x")

    mesh = make_mesh()
    obs = Trie.from_dict({"x": 1.0})
    out = sharded_hmc(mesh, jax.random.PRNGKey(6), conjugate, (), obs,
                      num_samples=200, num_warmup=200, num_chains=64)
    mus = np.asarray(out["samples"]["mu"]).ravel()
    assert mus.mean() == pytest.approx(0.5, abs=0.08)
