"""HMC and ADVI tests against analytic posteriors.

No reference counterpart (gradient inference is an extension target,
BASELINE.json north star); oracles are exact conjugate posteriors.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from modppl_tpu import Trie, gamma, gen, normal
from modppl_tpu.dists.iid import iid
from modppl_tpu.inference.hmc import hmc, make_unconstrained_logprob
from modppl_tpu.inference.vi import advi


@gen
def conjugate(h):
    mu = h.sample(normal, (0.0, 1.0), "mu")
    h.sample(normal, (mu, 1.0), "x")
    return mu


ys5 = iid(normal, 5)


@gen
def normal_scale_model(h):
    # sigma^2-ish model with a positive-support latent: tests the Exp bijector
    scale = h.sample(gamma, (2.0, 1.0), "scale")
    h.sample(ys5, (0.0, scale), "ys")


def test_unconstrained_logprob_matches_logjp():
    obs = Trie.from_dict({"x": 1.0})
    trace, _ = conjugate.generate(jax.random.PRNGKey(0), (), obs)
    logprob, u0, bijectors, constrain = make_unconstrained_logprob(
        conjugate, (), trace, obs)
    assert set(bijectors) == {"mu"}
    # identity bijector: logprob(u0) == logjp of the trace
    assert float(logprob(u0)) == pytest.approx(float(trace.logjp), abs=1e-9)
    # differentiable
    g = jax.grad(lambda u: logprob(u))(u0)
    mu = float(trace.data.read("mu"))
    # d/dmu [ -mu^2/2 - (1-mu)^2/2 ] = -mu + (1 - mu)
    assert float(g["mu"]) == pytest.approx(-mu + (1.0 - mu), abs=1e-9)


def test_hmc_conjugate_posterior():
    obs = Trie.from_dict({"x": 1.0})
    out = hmc(jax.random.PRNGKey(1), conjugate, (), obs,
              num_samples=800, num_warmup=400, num_chains=4)
    mus = np.asarray(out["samples"]["mu"]).ravel()
    assert mus.mean() == pytest.approx(0.5, abs=0.05)
    assert mus.std() == pytest.approx(np.sqrt(0.5), abs=0.05)
    assert float(jnp.mean(out["accept_prob"])) > 0.6
    assert float(jnp.mean(out["divergences"])) < 0.01


def test_hmc_positive_support():
    ys = jnp.array([0.5, -1.2, 0.8, 2.0, -0.3])
    obs = Trie.from_dict({"ys": ys})
    out = hmc(jax.random.PRNGKey(2), normal_scale_model, (), obs,
              num_samples=1500, num_warmup=500, num_chains=4)
    scales = np.asarray(out["samples"]["scale"]).ravel()
    assert np.all(scales > 0)  # bijector keeps support
    # oracle: quadrature over the 1-D posterior
    grid = np.linspace(1e-3, 10.0, 4000)
    logp = (np.log(grid) * (2.0 - 1.0) - grid  # gamma(2,1) prior
            + sum(-0.5 * ((float(y) / grid) ** 2) - np.log(grid)
                  for y in ys) - 2.5 * np.log(2 * np.pi))
    w = np.exp(logp - logp.max())
    w /= w.sum()
    post_mean = float((grid * w).sum())
    assert scales.mean() == pytest.approx(post_mean, abs=0.08)


def test_hmc_rejects_discrete_latents():
    from modppl_tpu import bernoulli

    @gen
    def m(h):
        b = h.sample(bernoulli, 0.5, "b")
        h.sample(normal, (jnp.where(b, 1.0, -1.0), 1.0), "x")

    obs = Trie.from_dict({"x": 0.3})
    with pytest.raises(ValueError, match="discrete latent"):
        hmc(jax.random.PRNGKey(3), m, (), obs, num_samples=10, num_warmup=10)


def test_advi_conjugate_posterior():
    obs = Trie.from_dict({"x": 1.0})
    out = advi(jax.random.PRNGKey(4), conjugate, (), obs,
               num_steps=1500, num_mc=16, learning_rate=0.05)
    # q approximates N(0.5, sqrt(0.5)); mean-field is exact in 1-D Gaussian
    assert float(out["mu"][0]) == pytest.approx(0.5, abs=0.05)
    assert float(jnp.exp(out["log_sigma"][0])) == pytest.approx(
        np.sqrt(0.5), abs=0.05)
    # ELBO should approach the exact log evidence
    exact = float(normal.logpdf(1.0, (0.0, np.sqrt(2.0))))
    assert float(jnp.mean(out["elbo"][-100:])) == pytest.approx(exact, abs=0.05)
    samples = out["sample"](jax.random.PRNGKey(5), 4000)
    assert float(jnp.mean(samples["mu"])) == pytest.approx(0.5, abs=0.05)


def test_advi_fullrank_captures_correlation():
    """Correlated 2-D Gaussian posterior: mean-field cannot represent the
    off-diagonal; full-rank must recover it."""
    from modppl_tpu.inference.vi import advi_fullrank

    @gen
    def corr_model(h):
        a = h.sample(normal, (0.0, 1.0), "a")
        b = h.sample(normal, (a, 0.5), "b")
        h.sample(normal, (a + b, 0.3), "y")

    obs = Trie.from_dict({"y": 1.0})
    out = advi_fullrank(jax.random.PRNGKey(0), corr_model, (), obs,
                        num_steps=4000, num_mc=16, learning_rate=2e-2)
    cov_q = np.asarray(out["chol"] @ out["chol"].T)

    # exact posterior precision of (a, b): prior + likelihood quadratics
    # logp = -a^2/2 - (b-a)^2/(2*.25) - (1-a-b)^2/(2*.09)
    prec = np.array([[1 + 4 + 1 / 0.09, -4 + 1 / 0.09],
                     [-4 + 1 / 0.09, 4 + 1 / 0.09]])
    cov_exact = np.linalg.inv(prec)
    np.testing.assert_allclose(cov_q, cov_exact, atol=0.05)
    # and the posterior mean
    mean_exact = cov_exact @ np.array([1 / 0.09, 1 / 0.09])
    np.testing.assert_allclose(np.asarray(out["mu"]), mean_exact, atol=0.05)


def test_hmc_runner_reuse():
    """hmc_runner compiles once and serves repeated keys; results differ
    by key but agree on the posterior."""
    from modppl_tpu.inference.hmc import hmc_runner

    obs = Trie.from_dict({"x": 1.0})
    run = hmc_runner(conjugate, (), obs, num_samples=400, num_warmup=200,
                     num_chains=8)
    out1 = run(jax.random.PRNGKey(0))
    out2 = run(jax.random.PRNGKey(1))
    m1 = np.asarray(out1["samples"]["mu"]).ravel()
    m2 = np.asarray(out2["samples"]["mu"]).ravel()
    assert not np.array_equal(m1, m2)
    assert m1.mean() == pytest.approx(0.5, abs=0.06)
    assert m2.mean() == pytest.approx(0.5, abs=0.06)
