"""MAP estimation + Laplace approximation vs exact conjugate oracles."""

import jax
import jax.numpy as jnp
import numpy as np

from modppl_tpu import Trie, gen, normal
from modppl_tpu.dists import gamma, poisson
from modppl_tpu.inference import laplace_approximation, map_optimize


@gen
def conjugate(h):
    mu = h.sample(normal, (0.0, 1.0), "mu")
    h.sample(normal, (mu, 0.5), "x")
    return mu


OBS = Trie.from_dict({"x": 1.0})


def test_map_conjugate_normal_mode():
    # posterior: N(0.8, 0.2) — unconstrained == constrained (no bijector)
    out = map_optimize(jax.random.PRNGKey(0), conjugate, (), OBS,
                       num_steps=400)
    assert abs(float(out["params"]["mu"]) - 0.8) < 1e-3
    # all restarts converge to the same (unique) mode
    lps = np.asarray(out["restart_logps"])
    np.testing.assert_allclose(lps, lps[0], atol=1e-5)


def test_laplace_conjugate_normal_exact():
    """Laplace is EXACT for a Gaussian posterior: mean, covariance and the
    log marginal likelihood all match analytic values."""
    out = laplace_approximation(jax.random.PRNGKey(0), conjugate, (), OBS,
                                num_steps=400)
    assert abs(float(out["mean"][0]) - 0.8) < 1e-3
    assert abs(float(out["cov"][0, 0]) - 0.2) < 1e-3
    # marginal: x ~ N(0, 1 + 0.25)
    log_ml_exact = float(-0.5 * np.log(2 * np.pi * 1.25) - 0.5 / 1.25)
    assert abs(float(out["log_ml"]) - log_ml_exact) < 1e-3
    draws = out["sample"](jax.random.PRNGKey(1), 4000)["mu"]
    assert abs(float(jnp.mean(draws)) - 0.8) < 0.03
    assert abs(float(jnp.std(draws)) - np.sqrt(0.2)) < 0.03


@gen
def poisson_gamma(h):
    lam = h.sample(gamma, (2.0, 1.0), "lam")
    h.sample(poisson, (lam,), "k")
    return lam


POBS = Trie.from_dict({"k": 3})


def test_map_constrained_space_mode():
    """MAP with jacobian=False is the CONSTRAINED-space posterior mode
    (Stan `optimize` convention): gamma(2,1) prior + Poisson(3) likelihood
    -> posterior gamma(shape 5, scale 1/2), mode (5-1)/2 = 2."""
    out = map_optimize(jax.random.PRNGKey(0), poisson_gamma, (), POBS,
                       num_steps=600, learning_rate=0.03)
    assert abs(float(out["params"]["lam"]) - 2.0) < 5e-3
    # jacobian=True gives the unconstrained-density mode instead:
    # v = log(lam) has density gamma(5, 1/2) times lam, mode at
    # lam = shape * scale = 2.5
    out_j = map_optimize(jax.random.PRNGKey(0), poisson_gamma, (), POBS,
                         num_steps=600, learning_rate=0.03, jacobian=True)
    assert abs(float(out_j["params"]["lam"]) - 2.5) < 5e-3


def test_laplace_log_ml_poisson_gamma():
    """Laplace log-ML vs the exact negative-binomial marginal:
    p(k=3) = C(4,3) (1/2)^3 (1/2)^2 = 1/8. Laplace in log-lambda
    coordinates has only the Stirling-series error of Gamma(5) (~0.017)."""
    out = laplace_approximation(jax.random.PRNGKey(0), poisson_gamma, (),
                                POBS, num_steps=600, learning_rate=0.03)
    log_ml_exact = float(np.log(0.125))
    assert abs(float(out["log_ml"]) - log_ml_exact) < 0.05
    # samples respect the positivity constraint
    draws = out["sample"](jax.random.PRNGKey(1), 2000)["lam"]
    assert float(jnp.min(draws)) > 0.0
    # the Gaussian-in-log approximation is lognormal(log 2.5, 1/5):
    # its own mean is 2.5 * exp(0.1) ~= 2.763 (the +10% is the exact
    # lognormal mean shift, not sampler error)
    assert abs(float(jnp.mean(draws)) - 2.5 * np.exp(0.1)) < 0.15
