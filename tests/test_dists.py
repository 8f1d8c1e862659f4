"""Distribution tests, ported from modppl/tests/dists.rs.

logpdf values vs the reference's hard-coded constants at f32-epsilon
tolerance (dists.rs:8,124-136,169-183,188-211); sampler moments with 50k
draws — here drawn as one vmapped batch instead of a scalar loop.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from modppl_tpu.dists import (
    bernoulli, beta, categorical, gamma, geometric, mvnormal, normal,
    poisson, uniform, uniform_discrete,
)

LOGPDF_EPSILON = float(np.finfo(np.float32).eps)


def batch_sample(dist, params, n, seed=0):
    keys = jax.random.split(jax.random.PRNGKey(seed), n)
    return jax.vmap(lambda k: dist.sample(k, params))(keys)


def test_bernoulli():
    true_p = 0.11
    assert float(bernoulli.logpdf(True, true_p)) == pytest.approx(np.log(true_p))
    assert float(bernoulli.logpdf(False, true_p)) == pytest.approx(np.log(1 - true_p))
    samples = batch_sample(bernoulli, true_p, 50000)
    freq = float(jnp.sum(samples)) / float(jnp.sum(~samples))
    assert freq == pytest.approx(true_p, abs=0.02)


def test_uniform():
    params = (0.5, 3.14)
    a, b = params
    true_p = 1.0 / (b - a)
    assert float(uniform.logpdf(0.9, params)) == pytest.approx(np.log(true_p))
    assert float(uniform.logpdf(2.1, params)) == pytest.approx(np.log(true_p))
    assert float(uniform.logpdf(0.4, params)) == -np.inf
    with pytest.raises(ValueError):
        uniform.logpdf(0.5, (2.0, 1.0))  # a >= b panics (uniform.rs:6-10)
    samples = np.asarray(batch_sample(uniform, params, 50000))
    hist, _ = np.histogram(samples, bins=100, range=(a, b))
    assert np.all(np.abs(hist - 500) <= 150)

    params = (8, 130)
    a, b = params
    true_p = 1.0 / (b - a + 1)
    assert float(uniform_discrete.logpdf(9, params)) == pytest.approx(np.log(true_p))
    assert float(uniform_discrete.logpdf(130, params)) == pytest.approx(np.log(true_p))
    assert float(uniform_discrete.logpdf(140, params)) == -np.inf
    samples = np.asarray(batch_sample(uniform_discrete, params, 50000))
    assert samples.min() >= a and samples.max() <= b
    hist, _ = np.histogram(samples, bins=5, range=(a - 0.5, b + 0.5))
    assert np.all(np.abs(hist - 10000) <= 750)


def test_categorical():
    probs = jnp.array([0.1, 0.3, 0.2, 0.1, 0.05, 0.25])
    for i, p in enumerate(np.asarray(probs)):
        assert float(categorical.logpdf(i, (probs,))) == pytest.approx(np.log(p))
    assert float(categorical.logpdf(6, (probs,))) == -np.inf
    samples = np.asarray(batch_sample(categorical, (probs,), 50000))
    for i, p in enumerate(np.asarray(probs)):
        freq = np.mean(samples == i)
        assert freq == pytest.approx(p, abs=0.01)


def test_normal():
    true_mu, true_std = 1.64, 0.025
    samples = np.asarray(batch_sample(normal, (true_mu, true_std), 50000))
    assert samples.mean() == pytest.approx(true_mu, abs=0.001)
    assert samples.std(ddof=1) == pytest.approx(true_std, abs=0.001)

    # reference constants (dists.rs:121-136)
    assert float(normal.logpdf(1.4, (0.9, 0.5))) == pytest.approx(
        -0.7257913526447272, abs=LOGPDF_EPSILON)
    assert float(normal.logpdf(2.8, (1.8, 1.0))) == pytest.approx(
        -1.4189385332046727, abs=LOGPDF_EPSILON)
    assert float(normal.logpdf(-3.14, (8.0, 20.0))) == pytest.approx(
        -4.069795306758664, abs=LOGPDF_EPSILON)


def test_mvnormal():
    true_mu = jnp.array([-1.5, 3.2])
    true_cov = jnp.array([[1.0, -3.0 / 5.0], [-3.0 / 5.0, 2.0]])
    samples = np.asarray(batch_sample(mvnormal, (true_mu, true_cov), 50000))
    assert np.allclose(samples.mean(axis=0), np.asarray(true_mu), atol=0.05)
    assert np.allclose(np.cov(samples.T), np.asarray(true_cov), atol=0.05)

    # reference constants (dists.rs:166-183)
    x = jnp.array([1.1, 5.8])
    mu = jnp.array([1.3, 5.6])
    cov = jnp.array([[1.0, -0.81], [-0.81, 2.5]])
    assert float(mvnormal.logpdf(x, (mu, cov))) == pytest.approx(
        -2.1642100746383357, abs=LOGPDF_EPSILON)

    x = jnp.array([30.1, -46.8])
    mu = jnp.array([0.0, 6.0])
    cov = jnp.array([[496.0, 0.13], [0.13, 500.0]])
    assert float(mvnormal.logpdf(x, (mu, cov))) == pytest.approx(
        -11.750458919763666, abs=LOGPDF_EPSILON)

    x = jnp.array([1.2, 5.1, -7.8])
    mu = jnp.array([1.4, 5.0, -7.4])
    cov = jnp.array([[1.0, 0.1, 0.9], [0.1, 1.3, 0.4], [0.9, 0.4, 1.75]])
    assert float(mvnormal.logpdf(x, (mu, cov))) == pytest.approx(
        -2.873267436425841, abs=LOGPDF_EPSILON)


def test_geometric():
    # reference constants (dists.rs:188-190)
    assert float(geometric.logpdf(1, 0.5)) == pytest.approx(
        -1.3862943611198906, abs=LOGPDF_EPSILON)
    assert float(geometric.logpdf(5, 0.98)) == pytest.approx(
        -19.580317734458244, abs=LOGPDF_EPSILON)
    assert float(geometric.logpdf(101, 0.01)) == pytest.approx(
        -5.6202541071917365, abs=LOGPDF_EPSILON)
    samples = np.asarray(batch_sample(geometric, 0.25, 50000))
    # mean of k-failures geometric = (1-p)/p = 3
    assert samples.mean() == pytest.approx(3.0, abs=0.1)


def test_poisson():
    # reference constants (dists.rs:194-197)
    assert float(poisson.logpdf(3, 4.0)) == pytest.approx(
        -1.6328763858683835, abs=LOGPDF_EPSILON)
    assert float(poisson.logpdf(5, 1.5)) == pytest.approx(
        -4.2601662022412240, abs=LOGPDF_EPSILON)
    assert float(poisson.logpdf(52, 36.11)) == pytest.approx(
        -5.969204868031767, abs=LOGPDF_EPSILON)
    samples = np.asarray(batch_sample(poisson, 4.0, 50000))
    assert samples.mean() == pytest.approx(4.0, abs=0.05)


def test_beta():
    # reference constants (dists.rs:202-204)
    assert float(beta.logpdf(0.3, (0.5, 0.5))) == pytest.approx(
        -0.364406011717066, abs=LOGPDF_EPSILON)
    assert float(beta.logpdf(0.7, (1.5, 2.0))) == pytest.approx(
        -0.06055443631298263, abs=LOGPDF_EPSILON)
    samples = np.asarray(batch_sample(beta, (2.0, 5.0), 50000))
    assert samples.mean() == pytest.approx(2.0 / 7.0, abs=0.01)


def test_gamma():
    # reference constants (dists.rs:209-211)
    assert float(gamma.logpdf(1.7, (1.23, 1.46))) == pytest.approx(
        -1.414334369005868, abs=LOGPDF_EPSILON)
    assert float(gamma.logpdf(8.4, (4.5, 1.0))) == pytest.approx(
        -3.4049256003700052, abs=LOGPDF_EPSILON)
    assert float(gamma.logpdf(0.03, (50.0, 70.0))) == pytest.approx(
        -528.8122715889206, abs=LOGPDF_EPSILON)
    samples = np.asarray(batch_sample(gamma, (4.5, 2.0), 50000))
    assert samples.mean() == pytest.approx(9.0, abs=0.1)
