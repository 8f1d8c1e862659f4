"""The factor primitive and the marginalized hierarchical model.

factor() has no reference counterpart; the quantitative gate is HMC/NUTS on
the gate-marginalized hierarchical model vs the exact conjugate mixture
posterior — the BASELINE.json "HMC on the hierarchical model" configuration.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from modppl_tpu import ArgDiff, Trie, gen, normal
from modppl_tpu.inference.hmc import hmc
from modppl_tpu.inference.nuts import nuts
from modppl_tpu.models.hierarchical_static import (
    exact_hierarchical_posterior,
    make_hierarchical_marginalized,
)


@gen
def factor_model(h):
    mu = h.sample(normal, (0.0, 1.0), "mu")
    h.factor(-0.5 * (mu - 1.0) ** 2, "soft")   # unnormalized N(1,1) evidence
    return mu


def test_factor_semantics():
    tr = factor_model.simulate(jax.random.PRNGKey(0), ())
    mu = float(tr.data.read("mu"))
    expected = float(normal.logpdf(mu, (0.0, 1.0))) - 0.5 * (mu - 1.0) ** 2
    assert float(tr.logjp) == pytest.approx(expected)

    # generate: factor always contributes to the weight
    tr2, w = factor_model.generate(jax.random.PRNGKey(1), (),
                                   Trie.from_dict({"mu": 0.3}))
    assert float(w) == pytest.approx(
        float(normal.logpdf(0.3, (0.0, 1.0))) - 0.5 * (0.3 - 1.0) ** 2)

    # update: weight carries the delta of the factor
    tr3, discard, uw = factor_model.update(
        jax.random.PRNGKey(2), tr2, (), ArgDiff.UNKNOWN,
        Trie.from_dict({"mu": 0.9}))
    expected_uw = (float(normal.logpdf(0.9, (0.0, 1.0)))
                   - float(normal.logpdf(0.3, (0.0, 1.0)))
                   - 0.5 * (0.9 - 1.0) ** 2 + 0.5 * (0.3 - 1.0) ** 2)
    assert float(uw) == pytest.approx(expected_uw)
    assert float(tr3.data.read("mu")) == pytest.approx(0.9)


def test_factor_posterior():
    # posterior of mu under prior N(0,1) and soft factor N(1,1): N(0.5, 1/2)
    from modppl_tpu.inference import importance_sampling

    traces, lnw, _ = importance_sampling(
        jax.random.PRNGKey(3), factor_model, (), Trie(), 100_000)
    w = jnp.exp(lnw)
    mus = traces.data.read("mu")
    assert float(jnp.sum(w * mus)) == pytest.approx(0.5, abs=0.02)


def test_hmc_marginalized_hierarchical():
    # moderately quadratic data: the gate posterior is decisive, so the
    # marginalized target is unimodal (the weakly-quadratic broad/narrow c
    # mixture is a slow-mixing target for fixed-trajectory HMC; NUTS covers
    # the strongly-quadratic case below).
    xs = jnp.array([-2.0, -1.0, 0.0, 1.0, 2.0])
    a, b, c = 0.2, 0.5, 0.3
    ys = a + b * xs + c * xs * xs
    p_lin, m_lin, c_lin, m_quad, c_quad, _ = exact_hierarchical_posterior(
        np.asarray(xs), np.asarray(ys))

    model = make_hierarchical_marginalized(len(xs))
    out = hmc(jax.random.PRNGKey(4), model, (xs, ys), Trie(),
              num_samples=1500, num_warmup=800, num_chains=4,
              num_leapfrog=24)
    sa = np.asarray(out["samples"]["coeffs / a"]).ravel()
    sb = np.asarray(out["samples"]["coeffs / b"]).ravel()
    sc = np.asarray(out["samples"]["coeffs / c"]).ravel()

    # exact mixture moments: linear branch leaves c at its N(0,1) prior
    ea = p_lin * m_lin[0] + (1 - p_lin) * m_quad[0]
    eb = p_lin * m_lin[1] + (1 - p_lin) * m_quad[1]
    ec = (1 - p_lin) * m_quad[2]
    assert sa.mean() == pytest.approx(ea, abs=0.05)
    assert sb.mean() == pytest.approx(eb, abs=0.05)
    assert sc.mean() == pytest.approx(ec, abs=0.08)


def test_nuts_marginalized_hierarchical():
    xs = jnp.array([-2.0, -1.0, 0.0, 1.0, 2.0])
    ys = 0.3 + 0.4 * xs + 0.5 * xs * xs   # strongly quadratic: p_lin ~ 0
    _, _, _, m_quad, c_quad, _ = exact_hierarchical_posterior(
        np.asarray(xs), np.asarray(ys))
    model = make_hierarchical_marginalized(len(xs))
    out = nuts(jax.random.PRNGKey(5), model, (xs, ys), Trie(),
               num_samples=1000, num_warmup=600, num_chains=4)
    for addr, exact, sd in [("coeffs / a", m_quad[0], c_quad[0, 0] ** 0.5),
                            ("coeffs / b", m_quad[1], c_quad[1, 1] ** 0.5),
                            ("coeffs / c", m_quad[2], c_quad[2, 2] ** 0.5)]:
        s = np.asarray(out["samples"][addr]).ravel()
        assert s.mean() == pytest.approx(exact, abs=0.03), addr
        assert s.std() == pytest.approx(sd, rel=0.3), addr
