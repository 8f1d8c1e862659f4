"""NUTS tests against analytic posteriors."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from modppl_tpu import Trie, gen, normal
from modppl_tpu.dists.iid import iid
from modppl_tpu.inference.nuts import nuts


@gen
def conjugate(h):
    mu = h.sample(normal, (0.0, 1.0), "mu")
    h.sample(normal, (mu, 1.0), "x")


def test_nuts_conjugate_posterior():
    obs = Trie.from_dict({"x": 1.0})
    out = nuts(jax.random.PRNGKey(0), conjugate, (), obs,
               num_samples=800, num_warmup=400, num_chains=4, max_depth=6)
    mus = np.asarray(out["samples"]["mu"]).ravel()
    assert mus.mean() == pytest.approx(0.5, abs=0.05)
    assert mus.std() == pytest.approx(np.sqrt(0.5), abs=0.05)
    assert float(jnp.mean(out["divergences"])) < 0.01
    # trees should expand beyond a single doubling on a smooth target
    assert float(jnp.mean(out["tree_depth"])) > 1.0


ys11 = iid(normal, 11)


@gen
def linreg(h, xs):
    slope = h.sample(normal, (0.0, 1.0), "slope")
    intercept = h.sample(normal, (0.0, 2.0), "intercept")
    h.sample(ys11, (slope * xs + intercept, 0.1), "ys")


def test_nuts_linreg_posterior():
    # exact Gaussian posterior oracle, correlated scales -> exercises the
    # mass adaptation + dynamic trajectory length
    xs = jnp.linspace(-5.0, 5.0, 11)
    ys = 0.5 * xs - 1.0
    obs = Trie.from_dict({"ys": ys})
    out = nuts(jax.random.PRNGKey(1), linreg, (xs,), obs,
               num_samples=1000, num_warmup=500, num_chains=4, max_depth=8)
    s = np.asarray(out["samples"]["slope"]).ravel()
    i = np.asarray(out["samples"]["intercept"]).ravel()

    X = np.stack([np.asarray(xs), np.ones(11)], 1)
    post_cov = np.linalg.inv(np.diag([1.0, 0.25]) + 100.0 * X.T @ X)
    post_mean = post_cov @ (100.0 * X.T @ np.asarray(ys))
    assert s.mean() == pytest.approx(post_mean[0], abs=0.005)
    assert i.mean() == pytest.approx(post_mean[1], abs=0.02)
    assert s.std() == pytest.approx(np.sqrt(post_cov[0, 0]), rel=0.15)
    assert i.std() == pytest.approx(np.sqrt(post_cov[1, 1]), rel=0.15)
