"""Extension distributions (dists/extra.py): logpdf oracles via scipy and
law-of-large-numbers sampler checks, mirroring the reference's test style
(modppl/tests/dists.rs — constants + 50k-draw moments)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats as st

from modppl_tpu.dists import (
    binomial,
    dirichlet,
    exponential,
    laplace,
    negative_binomial,
    student_t,
)

KEY = jax.random.PRNGKey(0)
N = 50_000


def test_exponential():
    assert float(exponential.logpdf(0.7, 2.0)) == pytest.approx(
        st.expon.logpdf(0.7, scale=0.5), abs=1e-9)
    assert float(exponential.logpdf(-0.1, 2.0)) == -np.inf
    xs = np.asarray(exponential.sample_batch(KEY, (N,), 2.0))
    assert xs.mean() == pytest.approx(0.5, abs=0.02)
    assert xs.min() >= 0.0


def test_laplace():
    assert float(laplace.logpdf(0.3, (1.0, 2.0))) == pytest.approx(
        st.laplace.logpdf(0.3, loc=1.0, scale=2.0), abs=1e-9)
    xs = np.asarray(laplace.sample_batch(KEY, (N,), (1.0, 2.0)))
    assert xs.mean() == pytest.approx(1.0, abs=0.05)
    assert xs.std() == pytest.approx(np.sqrt(2) * 2.0, abs=0.1)


def test_student_t():
    assert float(student_t.logpdf(0.8, (5.0, 0.5, 1.5))) == pytest.approx(
        st.t.logpdf(0.8, df=5.0, loc=0.5, scale=1.5), abs=1e-9)
    xs = np.asarray(student_t.sample_batch(KEY, (N,), (7.0, 0.5, 1.5)))
    assert xs.mean() == pytest.approx(0.5, abs=0.05)
    # var = scale^2 * df/(df-2)
    assert xs.var() == pytest.approx(1.5 ** 2 * 7.0 / 5.0, rel=0.1)


def test_binomial():
    assert float(binomial.logpdf(3, (10, 0.4))) == pytest.approx(
        st.binom.logpmf(3, 10, 0.4), abs=1e-9)
    assert float(binomial.logpdf(11, (10, 0.4))) == -np.inf
    ks = np.asarray(binomial.sample_batch(KEY, (N,), (10, 0.4)))
    assert ks.mean() == pytest.approx(4.0, abs=0.05)
    assert ks.min() >= 0 and ks.max() <= 10


def test_dirichlet():
    alpha = jnp.array([2.0, 3.0, 5.0])
    x = jnp.array([0.2, 0.3, 0.5])
    assert float(dirichlet.logpdf(x, (alpha,))) == pytest.approx(
        st.dirichlet.logpdf(np.asarray(x), np.asarray(alpha)), abs=1e-8)
    xs = np.asarray(dirichlet.sample_batch(KEY, (N,), (alpha,)))
    assert xs.shape == (N, 3)
    np.testing.assert_allclose(xs.sum(axis=1), 1.0, atol=1e-5)
    np.testing.assert_allclose(xs.mean(axis=0), [0.2, 0.3, 0.5], atol=0.01)


def test_negative_binomial():
    assert float(negative_binomial.logpdf(4, (3.0, 0.6))) == pytest.approx(
        st.nbinom.logpmf(4, 3, 0.6), abs=1e-9)
    # r = 1 reduces to the reference's geometric convention
    from modppl_tpu.dists import geometric
    assert float(negative_binomial.logpdf(2, (1.0, 0.3))) == pytest.approx(
        float(geometric.logpdf(2, 0.3)), abs=1e-9)
    ks = np.asarray(negative_binomial.sample_batch(KEY, (N,), (3.0, 0.6)))
    assert ks.mean() == pytest.approx(3.0 * 0.4 / 0.6, abs=0.05)


def test_extra_dists_in_gen_models():
    """The extensions compose with the DSL and gradient inference."""
    from modppl_tpu import Trie, gen
    from modppl_tpu.inference.hmc import latent_bijectors

    @gen
    def model(h):
        rate = h.sample(exponential, (1.0,), "rate")
        h.sample(laplace, (0.0, 1.0 / rate), "x")

    tr = model.simulate(jax.random.PRNGKey(1), ())
    assert float(tr.data.read("rate")) > 0.0
    obs = Trie.from_dict({"x": 0.5})
    tr2, w = model.generate(jax.random.PRNGKey(2), (), obs)
    assert np.isfinite(float(w))
    # support metadata drives the Exp bijector for HMC
    bij = latent_bijectors(tr2, obs)
    assert set(bij) == {"rate"}


def test_binomial_negbinomial_boundary_p():
    """xlogy edge guards: exact 0-weight outcomes at p in {0, 1} must score
    0.0/-inf, never NaN (matching Bernoulli's edge convention)."""
    from modppl_tpu.dists.extra import binomial, negative_binomial

    assert float(binomial.logpdf(0, (5, 0.0))) == 0.0
    assert float(binomial.logpdf(5, (5, 1.0))) == 0.0
    assert float(binomial.logpdf(3, (5, 0.0))) == -jnp.inf
    assert float(negative_binomial.logpdf(0, (3, 1.0))) == 0.0
    assert not np.isnan(float(negative_binomial.logpdf(2, (3, 1.0))))
