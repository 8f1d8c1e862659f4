"""IID plate, Cond/Switch combinators, and the saturated hierarchical model.

The compiled flagship gate: vmapped IS on the saturated hierarchical model
vs the exact conjugate mixture posterior (model probability, coefficient
moments, and log-evidence) — the quantitative version of the reference's
importance.rs:89-139 workload.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from modppl_tpu import Trie, bernoulli, gen, normal, select, ArgDiff
from modppl_tpu.dists.iid import iid
from modppl_tpu.inference import importance_sampling
from modppl_tpu.modeling.combinators import Cond, Switch, tree_select
from modppl_tpu.models.hierarchical_static import (
    exact_hierarchical_posterior,
    make_hierarchical_static,
)


def test_iid_plate_logpdf_matches_sum():
    d = iid(normal, 4)
    x = jnp.array([0.1, -0.5, 2.0, 0.3])
    means = jnp.array([0.0, 1.0, -1.0, 0.5])
    lp = float(d.logpdf(x, (means, 0.7)))
    expected = sum(float(normal.logpdf(x[i], (means[i], 0.7))) for i in range(4))
    assert lp == pytest.approx(expected)
    # scalar params broadcast
    lp2 = float(d.logpdf(x, (0.0, 1.0)))
    expected2 = sum(float(normal.logpdf(x[i], (0.0, 1.0))) for i in range(4))
    assert lp2 == pytest.approx(expected2)


def test_iid_plate_in_model():
    ys_dist = iid(normal, 3)

    @gen
    def m(h):
        mu = h.sample(normal, (0.0, 1.0), "mu")
        return h.sample(ys_dist, (mu, 1.0), "ys")

    obs = Trie.from_dict({"ys": jnp.array([1.0, 1.0, 1.0])})
    tr, w = m.generate(jax.random.PRNGKey(0), (), obs)
    mu = float(tr.data.read("mu"))
    expected_w = sum(float(normal.logpdf(1.0, (mu, 1.0))) for _ in range(3))
    assert float(w) == pytest.approx(expected_w)
    # posterior check: mu | three obs of 1.0 -> N(3/4, 1/4)
    traces, lnw, _ = importance_sampling(jax.random.PRNGKey(1), m, (), obs, 50_000)
    post_mean = float(jnp.sum(jnp.exp(lnw) * traces.data.read("mu")))
    assert post_mean == pytest.approx(0.75, abs=0.02)


def test_cond_combinator():
    @gen
    def t_branch(h):
        return h.sample(normal, (2.0, 0.1), "v")

    @gen
    def f_branch(h):
        return h.sample(normal, (-2.0, 0.1), "v")

    branch = Cond(t_branch, f_branch)

    @gen
    def m(h):
        p = h.sample(bernoulli, 0.5, "p")
        return h.trace(branch, (p,), "br")

    # compiled simulate: both branches traced, retv selected by p
    tr = jax.jit(lambda k: m.simulate(k, ()))(jax.random.PRNGKey(0))
    p = bool(tr.data.read("p"))
    vt = float(tr.data.read("br/true/v"))
    vf = float(tr.data.read("br/false/v"))
    assert float(tr.retv) == (vt if p else vf)
    assert vt == pytest.approx(2.0, abs=0.5)
    assert vf == pytest.approx(-2.0, abs=0.5)

    # generate with a constraint inside one branch namespace
    obs = Trie.from_dict({"p": True, "br": {"true": {"v": 2.2}}})
    tr2, w = m.generate(jax.random.PRNGKey(1), (), obs)
    expected = float(bernoulli.logpdf(True, 0.5)) + \
        float(normal.logpdf(2.2, (2.0, 0.1)))
    assert float(w) == pytest.approx(expected)

    # regenerate the inactive branch leaves the retv unchanged
    tr3, _ = m.regenerate(jax.random.PRNGKey(2), tr2, (), ArgDiff.NO_CHANGE,
                          select("br/false/v"))
    assert float(tr3.retv) == pytest.approx(2.2)


def test_switch_combinator():
    def const_branch(mu):
        @gen
        def b(h):
            return h.sample(normal, (mu, 0.01), "v")
        return b

    sw = Switch(const_branch(-1.0), const_branch(0.0), const_branch(1.0))

    @gen
    def m(h, idx):
        return h.trace(sw, (idx,), "s")

    out = jax.jit(lambda k, i: m.simulate(k, (i,)).retv)(
        jax.random.PRNGKey(0), jnp.asarray(2))
    assert float(out) == pytest.approx(1.0, abs=0.1)
    out = jax.jit(lambda k, i: m.simulate(k, (i,)).retv)(
        jax.random.PRNGKey(0), jnp.asarray(0))
    assert float(out) == pytest.approx(-1.0, abs=0.1)


def test_saturated_hierarchical_vs_exact_posterior():
    xs = jnp.array([-2.0, -1.0, 0.0, 1.0, 2.0])
    # weakly-quadratic data so both models keep posterior mass
    a, b, c = 0.2, 0.5, 0.08
    ys = a + b * xs + c * xs * xs

    model = make_hierarchical_static(len(xs))
    obs = Trie.from_dict({"ys": ys})

    p_lin_exact, m_lin, _, m_quad, _, log_z = exact_hierarchical_posterior(
        np.asarray(xs), np.asarray(ys))

    n = 400_000
    traces, lnw, log_ml = importance_sampling(
        jax.random.PRNGKey(0), model, (xs,), obs, n)
    w = jnp.exp(lnw)
    is_lin = traces.data.read("is_linear")
    p_lin_est = float(jnp.sum(w * is_lin))
    assert p_lin_est == pytest.approx(float(p_lin_exact), abs=0.03)
    # prior-proposal IS log-ML has ~0.05 MC std here at 400k particles
    assert float(log_ml) == pytest.approx(float(log_z), abs=0.15)

    # quadratic-branch coefficient posterior (condition on is_linear = False)
    wq = w * (1.0 - is_lin)
    wq = wq / jnp.sum(wq)
    a_est = float(jnp.sum(wq * traces.data.read("coeffs/a")))
    b_est = float(jnp.sum(wq * traces.data.read("coeffs/b")))
    c_est = float(jnp.sum(wq * traces.data.read("coeffs/c")))
    assert a_est == pytest.approx(m_quad[0], abs=0.05)
    assert b_est == pytest.approx(m_quad[1], abs=0.05)
    assert c_est == pytest.approx(m_quad[2], abs=0.05)
