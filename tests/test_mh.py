"""Metropolis-Hastings tests.

Replaces the reference's visual-only MH tests (modppl/tests/mh.rs) with
posterior-moment assertions on a conjugate model, plus interface-genericity
runs on the hand-coded tuple-Data model and the trans-dimensional
hierarchical model (mh.rs:76-110).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from modppl_tpu import Trie, gen, normal, select
from modppl_tpu.inference import mh, regen_mh
from modppl_tpu.models import (
    Bounds,
    DriftProposal,
    PointedModel,
    add_or_remove_param_proposal,
    hierarchical_drift_proposal,
    hierarchical_model,
    read_coeffs,
)


@gen
def conjugate(h):
    mu = h.sample(normal, (0.0, 1.0), "mu")
    h.sample(normal, (mu, 1.0), "x")
    return mu


@gen
def drift_proposal(h, trace, drift):
    h.sample(normal, (trace.data.read("mu"), drift), "mu")


def test_mh_conjugate_posterior():
    # posterior mu | x=1 is N(0.5, 1/sqrt(2))
    obs = Trie.from_dict({"x": 1.0})
    trace, _ = conjugate.generate(jax.random.PRNGKey(0), (), obs)
    key = jax.random.PRNGKey(1)
    samples = []
    n_accept = 0
    for i in range(3000):
        key, k = jax.random.split(key)
        trace, accepted = mh(k, conjugate, trace, drift_proposal, (0.8,))
        n_accept += int(accepted)
        samples.append(float(trace.data.read("mu")))
    samples = np.array(samples[500:])
    assert 0.15 < n_accept / 3000 < 0.95
    assert samples.mean() == pytest.approx(0.5, abs=0.08)
    assert samples.std() == pytest.approx(np.sqrt(0.5), abs=0.08)


def test_regen_mh_conjugate_posterior():
    obs = Trie.from_dict({"x": 1.0})
    trace, _ = conjugate.generate(jax.random.PRNGKey(2), (), obs)
    key = jax.random.PRNGKey(3)
    samples = []
    for i in range(4000):
        key, k = jax.random.split(key)
        trace, _ = regen_mh(k, conjugate, trace, select("mu"))
        samples.append(float(trace.data.read("mu")))
    samples = np.array(samples[500:])
    assert samples.mean() == pytest.approx(0.5, abs=0.08)
    assert samples.std() == pytest.approx(np.sqrt(0.5), abs=0.08)


def test_mh_handcoded_pointed():
    # mh.rs:22-46: hand-coded model + proposal over tuple-buffer Data run
    # under the same mh() unchanged.
    model = PointedModel(jnp.array([[1.0, -0.6], [-0.6, 2.0]]))
    proposal = DriftProposal(jnp.array([[0.25, 0.0], [0.0, 0.25]]))
    bounds = Bounds(-5.0, 5.0, -5.0, 5.0)
    trace, _ = model.generate(
        jax.random.PRNGKey(4), bounds, (None, jnp.array([0.0, 0.0])))
    key = jax.random.PRNGKey(5)
    n_accept = 0
    for _ in range(200):
        key, k = jax.random.split(key)
        trace, accepted = mh(k, model, trace, proposal)
        n_accept += int(accepted)
    assert n_accept > 10
    assert np.all(np.isfinite(np.asarray(trace.data[0])))


def test_mh_hierarchical_transdimensional():
    # mh.rs:76-110: alternating trans-dimensional and drift proposals.
    xs = [-2.0, -1.0, 0.0, 1.0, 2.0]
    a, b, c = 0.3, 0.4, 0.5
    obs = Trie()
    for i, x in enumerate(xs):
        obs.observe(f"(y, {i})", a + b * x + c * x * x)
    trace, _ = hierarchical_model.generate(jax.random.PRNGKey(6), (xs,), obs)
    key = jax.random.PRNGKey(7)
    all_coeffs = []
    for _ in range(30):
        key, k = jax.random.split(key)
        trace, _ = mh(k, hierarchical_model, trace, add_or_remove_param_proposal)
        all_coeffs.append(read_coeffs(trace))
        for _ in range(3):
            key, k = jax.random.split(key)
            trace, _ = mh(k, hierarchical_model, trace,
                          hierarchical_drift_proposal, (0.05,))
            all_coeffs.append(read_coeffs(trace))
    assert all(np.isfinite([float(v) for v in cs]) .all() for cs in all_coeffs)
    # with strongly quadratic data the chain should end in the quadratic model
    assert len(read_coeffs(trace)) == 3
