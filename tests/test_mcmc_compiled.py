"""Compiled MCMC tests: scan over iterations, vmap over chains.

The reference's 25k-iteration single-chain MH workload (modppl/tests/mh.rs:25)
as one XLA program, with posterior-moment oracles.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from modppl_tpu import Trie, gen, normal, select
from modppl_tpu.inference.mcmc import (
    mcmc_chain,
    mcmc_chains,
    mh_kernel,
    regen_mh_kernel,
)


@gen
def conjugate(h):
    mu = h.sample(normal, (0.0, 1.0), "mu")
    h.sample(normal, (mu, 1.0), "x")
    return mu


@gen
def drift_proposal(h, trace, drift):
    h.sample(normal, (trace.data.read("mu"), drift), "mu")


def test_compiled_mh_single_chain():
    obs = Trie.from_dict({"x": 1.0})
    trace0, _ = conjugate.generate(jax.random.PRNGKey(0), (), obs)
    kernel = mh_kernel(conjugate, drift_proposal, (0.8,))
    run = jax.jit(lambda k, tr: mcmc_chain(
        k, kernel, tr, 5000, extract=lambda t: t.data.read("mu")))
    final, mus, accepts = run(jax.random.PRNGKey(1), trace0)
    mus = np.asarray(mus)[1000:]
    assert mus.mean() == pytest.approx(0.5, abs=0.06)
    assert mus.std() == pytest.approx(np.sqrt(0.5), abs=0.06)
    assert 0.2 < float(jnp.mean(accepts)) < 0.95


def test_compiled_mh_many_chains():
    # chain data-parallelism: 64 chains x 400 iters in one program.
    obs = Trie.from_dict({"x": 1.0})
    num_chains = 64
    keys = jax.random.split(jax.random.PRNGKey(2), num_chains)
    traces0, _ = jax.vmap(lambda k: conjugate.generate(k, (), obs))(keys)
    kernel = mh_kernel(conjugate, drift_proposal, (0.8,))
    run = jax.jit(lambda k, trs: mcmc_chains(
        k, kernel, trs, 400, num_chains, extract=lambda t: t.data.read("mu")))
    final, mus, accepts = run(jax.random.PRNGKey(3), traces0)
    assert mus.shape == (num_chains, 400)
    pooled = np.asarray(mus[:, 100:]).ravel()
    assert pooled.mean() == pytest.approx(0.5, abs=0.03)
    assert pooled.std() == pytest.approx(np.sqrt(0.5), abs=0.03)


def test_compiled_regen_mh():
    obs = Trie.from_dict({"x": 1.0})
    trace0, _ = conjugate.generate(jax.random.PRNGKey(4), (), obs)
    kernel = regen_mh_kernel(conjugate, select("mu"))
    run = jax.jit(lambda k, tr: mcmc_chain(
        k, kernel, tr, 8000, extract=lambda t: t.data.read("mu")))
    _, mus, _ = run(jax.random.PRNGKey(5), trace0)
    mus = np.asarray(mus)[1000:]
    assert mus.mean() == pytest.approx(0.5, abs=0.06)
    assert mus.std() == pytest.approx(np.sqrt(0.5), abs=0.06)


def test_compiled_matches_eager_distribution():
    # compiled and eager kernels target the same posterior
    from modppl_tpu.inference import mh as eager_mh

    obs = Trie.from_dict({"x": 1.0})
    trace, _ = conjugate.generate(jax.random.PRNGKey(6), (), obs)
    key = jax.random.PRNGKey(7)
    eager_samples = []
    for _ in range(1500):
        key, k = jax.random.split(key)
        trace, _ = eager_mh(k, conjugate, trace, drift_proposal, (0.8,))
        eager_samples.append(float(trace.data.read("mu")))
    eager_samples = np.array(eager_samples[300:])

    trace0, _ = conjugate.generate(jax.random.PRNGKey(8), (), obs)
    kernel = mh_kernel(conjugate, drift_proposal, (0.8,))
    _, mus, _ = mcmc_chain(jax.random.PRNGKey(9), kernel, trace0, 1500,
                           extract=lambda t: t.data.read("mu"))
    compiled_samples = np.asarray(mus)[300:]
    assert eager_samples.mean() == pytest.approx(
        compiled_samples.mean(), abs=0.15)
    assert eager_samples.std() == pytest.approx(
        compiled_samples.std(), abs=0.15)
