"""MALA tests against analytic posteriors (same oracles as the HMC suite)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from modppl_tpu import Trie, gamma, gen, normal
from modppl_tpu.dists.iid import iid
from modppl_tpu.inference.mala import mala


@gen
def conjugate(h):
    mu = h.sample(normal, (0.0, 1.0), "mu")
    h.sample(normal, (mu, 1.0), "x")
    return mu


ys5 = iid(normal, 5)


@gen
def scale_model(h):
    scale = h.sample(gamma, (2.0, 1.0), "scale")
    h.sample(ys5, (0.0, scale), "ys")


def test_mala_conjugate_posterior():
    obs = Trie.from_dict({"x": 1.0})
    out = mala(jax.random.PRNGKey(0), conjugate, (), obs,
               num_samples=4000, num_warmup=1000, num_chains=4)
    mus = np.asarray(out["samples"]["mu"]).ravel()
    assert mus.mean() == pytest.approx(0.5, abs=0.05)
    assert mus.std() == pytest.approx(np.sqrt(0.5), abs=0.05)
    # dual averaging should land near the Langevin optimal-scaling target
    assert 0.35 < float(jnp.mean(out["accept_prob"])) < 0.8


def test_mala_positive_support_bijector():
    data = jnp.array([0.3, -0.5, 0.8, 0.1, -0.2])
    obs = Trie.from_dict({"ys": data})
    out = mala(jax.random.PRNGKey(1), scale_model, (), obs,
               num_samples=3000, num_warmup=1000, num_chains=4)
    scales = np.asarray(out["samples"]["scale"]).ravel()
    assert bool(np.all(scales > 0.0))
    # quadrature oracle for E[scale | ys]
    grid = jnp.linspace(1e-3, 6.0, 4001)

    def logpost(s):
        lp = gamma.logpdf(s, (2.0, 1.0))
        return lp + jnp.sum(jax.vmap(
            lambda y: normal.logpdf(y, (0.0, s)))(data))

    lps = jax.vmap(logpost)(grid)
    w = jnp.exp(lps - jnp.max(lps))
    exact_mean = float(jnp.sum(grid * w) / jnp.sum(w))
    assert scales.mean() == pytest.approx(exact_mean, abs=0.08)
