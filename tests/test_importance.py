"""Importance sampling tests.

Replaces the reference's visual-only IS tests (modppl/tests/importance.rs)
with quantitative posterior-moment and log-ML assertions vs conjugate
analytic oracles (the gap SURVEY.md §4 says to close).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from modppl_tpu import Trie, gen, normal
from modppl_tpu.inference import importance_resampling, importance_sampling, tree_index
from modppl_tpu.models import line_model, hierarchical_model, PointedModel, Bounds


@gen
def conjugate(h):
    mu = h.sample(normal, (0.0, 1.0), "mu")
    h.sample(normal, (mu, 1.0), "x")
    return mu


def test_is_log_ml_exact_conjugate():
    # mu ~ N(0,1); x ~ N(mu,1); x = 1 observed.
    # Exact evidence: N(1; 0, sqrt(2)).
    obs = Trie.from_dict({"x": 1.0})
    traces, lnw, log_ml = importance_sampling(
        jax.random.PRNGKey(0), conjugate, (), obs, 50_000)
    exact = float(normal.logpdf(1.0, (0.0, np.sqrt(2.0))))
    assert float(log_ml) == pytest.approx(exact, abs=0.01)

    # posterior mean mu | x=1 is 0.5, std 1/sqrt(2)
    mus = traces.data.read("mu")
    w = jnp.exp(lnw)
    post_mean = float(jnp.sum(w * mus))
    post_var = float(jnp.sum(w * (mus - post_mean) ** 2))
    assert post_mean == pytest.approx(0.5, abs=0.02)
    assert post_var == pytest.approx(0.5, abs=0.02)


def test_is_line_model_posterior():
    # importance.rs:56-85 made quantitative: conjugate Bayesian linear
    # regression posterior.
    xs = [-5.0, -4.0, -3.0, -2.0, -1.0, 0.0, 1.0, 2.0, 3.0, 4.0, 5.0]
    true_slope, true_intercept = 0.5, -1.0
    obs = Trie()
    for i, x in enumerate(xs):
        obs.observe(f"ys / {i}", true_slope * x + true_intercept)

    traces, lnw, _ = importance_sampling(
        jax.random.PRNGKey(1), line_model, (xs,), obs, 200_000)
    w = jnp.exp(lnw)
    post_slope = float(jnp.sum(w * traces.data.read("slope")))
    post_intercept = float(jnp.sum(w * traces.data.read("intercept")))

    X = np.stack([np.asarray(xs), np.ones(len(xs))], 1)
    prior_prec = np.diag([1.0, 1.0 / 4.0])
    noise_prec = 1.0 / 0.01
    y = true_slope * np.asarray(xs) + true_intercept
    post_cov = np.linalg.inv(prior_prec + noise_prec * X.T @ X)
    post_mean = post_cov @ (noise_prec * X.T @ y)
    assert post_slope == pytest.approx(post_mean[0], abs=0.02)
    assert post_intercept == pytest.approx(post_mean[1], abs=0.1)


def test_is_resampling_indices():
    obs = Trie.from_dict({"x": 1.0})
    traces, idx, _ = importance_resampling(
        jax.random.PRNGKey(2), conjugate, (), obs, 5000, 500)
    assert idx.shape == (500,)
    assert int(idx.min()) >= 0 and int(idx.max()) < 5000
    one = tree_index(traces, int(idx[0]))
    assert np.isfinite(float(one.logjp))


def test_is_handcoded_model_loop_mode():
    # importance.rs:18-52 with the hand-coded tuple-Data model: the same
    # inference function runs a non-trie GenFn via the eager path.
    model = PointedModel(jnp.array([[1.0, -0.6], [-0.6, 2.0]]))
    bounds = Bounds(-5.0, 5.0, -5.0, 5.0)
    constraints = (None, jnp.array([0.0, 0.0]))
    traces, lnw, log_ml = importance_sampling(
        jax.random.PRNGKey(3), model, bounds, constraints, 200,
        vectorized=False)
    assert len(traces) == 200
    assert np.isfinite(float(log_ml))
    assert lnw.shape == (200,)
    assert float(jnp.exp(lnw).sum()) == pytest.approx(1.0, abs=1e-6)


def test_is_handcoded_model_vectorized():
    # the tuple-Data model is also traceable -> vmapped generate works.
    model = PointedModel(jnp.array([[1.0, -0.6], [-0.6, 2.0]]))
    bounds = Bounds(-5.0, 5.0, -5.0, 5.0)
    constraints = (None, jnp.array([0.0, 0.0]))
    traces, lnw, log_ml = importance_sampling(
        jax.random.PRNGKey(3), model, bounds, constraints, 20_000)
    # exact evidence: ∫ U(latent) N(obs; latent, cov) dlatent over the box;
    # with a wide box this is ≈ (1/100) * P(obs-latent in box) ≈ 1/100.
    assert float(log_ml) == pytest.approx(np.log(1.0 / 100.0), abs=0.05)


def test_is_hierarchical_eager():
    # importance.rs:89-139: the branchy model runs through the eager path.
    xs = [-2.0, -1.0, 0.0, 1.0, 2.0]
    a, b, c = 0.3, 0.4, 0.5
    obs = Trie()
    for i, x in enumerate(xs):
        obs.observe(f"(y, {i})", a + b * x + c * x * x)
    traces, lnw, log_ml = importance_sampling(
        jax.random.PRNGKey(4), hierarchical_model, (xs,), obs, 300,
        vectorized=False)
    assert np.isfinite(float(log_ml))
    # every trace has coefficients; quadratic traces have "coeffs/c"
    n_quad = sum(1 for t in traces if t.data.search("coeffs/c") is not None)
    assert 0 <= n_quad <= 300
    for t in traces[:10]:
        assert np.isfinite(float(t.data.read("coeffs/a")))
