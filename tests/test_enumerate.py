"""Exact enumerative inference vs hand-computed posteriors."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from modppl_tpu import Trie, bernoulli, categorical, gen, normal
from modppl_tpu.inference.enumerate import auto_supports, enumerate_posterior


@gen
def mixture(h):
    # two-component Gaussian mixture with a bernoulli gate
    z = h.sample(bernoulli, 0.3, "z")
    mu = jnp.where(z, 2.0, -1.0)
    h.sample(normal, (mu, 1.0), "x")
    return z


def test_bernoulli_gate_exact_posterior():
    x = 1.0
    obs = Trie.from_dict({"x": x})
    out = enumerate_posterior(mixture, (), obs, {"z": jnp.array([False, True])})
    # hand computation
    import scipy.stats as st
    j0 = np.log(0.7) + st.norm(-1, 1).logpdf(x)
    j1 = np.log(0.3) + st.norm(2, 1).logpdf(x)
    log_ml = np.logaddexp(j0, j1)
    np.testing.assert_allclose(np.asarray(out["log_joint"]),
                               [j0, j1], rtol=1e-9)
    assert float(out["log_ml"]) == pytest.approx(log_ml, abs=1e-9)
    assert float(out["marginals"]["z"][1]) == pytest.approx(
        np.exp(j1 - log_ml), abs=1e-9)


@gen
def two_discrete(h):
    z = h.sample(categorical, (jnp.array([0.2, 0.5, 0.3]),), "z")
    w = h.sample(bernoulli, 0.6, "w")
    rate = jnp.asarray(z, jnp.float64) + jnp.where(w, 2.0, 0.5)
    h.sample(normal, (rate, 1.0), "y")
    return rate


def test_joint_enumeration_two_addresses():
    obs = Trie.from_dict({"y": 2.5})
    out = enumerate_posterior(
        two_discrete, (), obs,
        {"z": jnp.arange(3), "w": jnp.array([False, True])})
    assert out["log_joint"].shape == (6,)
    # posterior sums to 1; marginals consistent
    assert float(jnp.sum(jnp.exp(out["log_posterior"]))) == pytest.approx(1.0, abs=1e-9)
    assert float(jnp.sum(out["marginals"]["z"])) == pytest.approx(1.0, abs=1e-9)
    assert float(jnp.sum(out["marginals"]["w"])) == pytest.approx(1.0, abs=1e-9)
    # against brute force
    import scipy.stats as st
    pz = [0.2, 0.5, 0.3]
    best = None
    total = -np.inf
    for z in range(3):
        for wv in [0, 1]:
            rate = z + (2.0 if wv else 0.5)
            lj = np.log(pz[z]) + np.log(0.6 if wv else 0.4) \
                + st.norm(rate, 1).logpdf(2.5)
            total = np.logaddexp(total, lj)
    assert float(out["log_ml"]) == pytest.approx(total, abs=1e-9)


def test_auto_supports_bernoulli_only():
    obs = Trie.from_dict({"x": 0.5})
    sup = auto_supports(mixture, (), obs)
    assert set(sup) == {"z"}
    out = enumerate_posterior(mixture, (), obs, sup)
    assert float(jnp.sum(jnp.exp(out["log_posterior"]))) == pytest.approx(1.0, abs=1e-9)


def test_enumeration_matches_importance_sampling():
    # cross-validate the two inference engines on the mixture model
    from modppl_tpu.inference import importance_sampling
    obs = Trie.from_dict({"x": 1.0})
    exact = enumerate_posterior(mixture, (), obs,
                                {"z": jnp.array([False, True])})
    _, _, log_ml = importance_sampling(
        jax.random.PRNGKey(0), mixture, (), obs, num_samples=200_000)
    assert float(log_ml) == pytest.approx(float(exact["log_ml"]), abs=0.02)
