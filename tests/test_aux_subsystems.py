"""Auxiliary subsystems: diagnostics, checkpoint/resume, metrics, prelude."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from modppl_tpu import Trie, gen, normal
from modppl_tpu.inference.hmc import hmc
from modppl_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint
from modppl_tpu.utils.diagnostics import (
    MetricsLogger,
    ess_autocorr,
    split_rhat,
    summarize_mcmc,
)


@gen
def conjugate(h):
    mu = h.sample(normal, (0.0, 1.0), "mu")
    h.sample(normal, (mu, 1.0), "x")


def test_rhat_and_ess():
    key = jax.random.PRNGKey(0)
    iid_chains = jax.random.normal(key, (4, 1000))
    assert float(split_rhat(iid_chains)) == pytest.approx(1.0, abs=0.02)
    ess = ess_autocorr(iid_chains)
    assert 2000 < ess < 6000  # iid: ESS ~ n

    # AR(1) with rho=0.9 -> ESS much smaller than n
    rho = 0.9
    e = np.asarray(jax.random.normal(jax.random.PRNGKey(1), (4, 2000)))
    x = np.zeros_like(e)
    for t in range(1, e.shape[1]):
        x[:, t] = rho * x[:, t - 1] + e[:, t]
    assert ess_autocorr(x) < 1500

    # diverged chains -> rhat >> 1
    div = np.concatenate([np.random.randn(2, 500), 5 + np.random.randn(2, 500)])
    assert float(split_rhat(div)) > 1.5


def test_summarize_mcmc():
    obs = Trie.from_dict({"x": 1.0})
    out = hmc(jax.random.PRNGKey(2), conjugate, (), obs,
              num_samples=400, num_warmup=200, num_chains=4)
    s = summarize_mcmc(out)
    assert s["mu"]["r_hat"] == pytest.approx(1.0, abs=0.05)
    assert s["mu"]["mean"] == pytest.approx(0.5, abs=0.1)
    assert s["mu"]["ess"] > 100
    assert 0.0 < s["__accept_rate__"] <= 1.0
    assert s["__num_divergent__"] == 0


def test_checkpoint_roundtrip(tmp_path):
    # checkpoint an inference-state pytree including a Trace with a Trie
    trace = conjugate.simulate(jax.random.PRNGKey(3), ())
    state = {"trace": trace, "log_weights": jnp.arange(8.0), "step": jnp.asarray(17)}
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, state, step=17, metadata={"phase": "warmup"})

    example = {"trace": conjugate.simulate(jax.random.PRNGKey(4), ()),
               "log_weights": jnp.zeros(8), "step": jnp.asarray(0)}
    restored, meta = restore_checkpoint(path, example)
    assert meta["step"] == 17 and meta["phase"] == "warmup"
    assert float(restored["trace"].data.read("mu")) == pytest.approx(
        float(trace.data.read("mu")))
    assert float(restored["trace"].logjp) == pytest.approx(float(trace.logjp))
    np.testing.assert_allclose(np.asarray(restored["log_weights"]),
                               np.arange(8.0))


def test_metrics_logger(tmp_path):
    path = str(tmp_path / "metrics.jsonl")
    with MetricsLogger(path) as ml:
        ml.log(0, ess=123.4, log_ml=-5.6)
        ml.log(1, ess=120.0, log_ml=-5.5)
    import json
    lines = [json.loads(l) for l in open(path)]
    assert lines[0]["ess"] == pytest.approx(123.4)
    assert lines[1]["step"] == 1


def test_prelude_imports():
    import modppl_tpu.prelude as p

    assert callable(p.mh) and callable(p.nuts) and callable(p.particle_filter)
    assert p.normal is not None and p.Trie is not None


def test_profiling_utils(tmp_path):
    from modppl_tpu.utils.profiling import (
        annotate, capture_trace, compiled_cost, device_time, hlo_text)

    f = jax.jit(lambda x: jnp.sum(x * x))
    x = jnp.arange(64.0)
    with annotate("test.phase"):
        r, secs = device_time(f, x)
    assert float(r) == pytest.approx(float(jnp.sum(x * x)))
    assert secs > 0.0
    cost = compiled_cost(lambda x: x @ x, jnp.ones((16, 16)))
    assert isinstance(cost, dict) and cost  # flops / bytes accessed entries
    assert "HloModule" in hlo_text(lambda x: x + 1.0, x)
    with capture_trace(str(tmp_path / "trace")):
        jax.block_until_ready(f(x))
    assert any((tmp_path / "trace").rglob("*"))
