"""Tempered SMC sampler and parallel tempering vs analytic oracles.

No reference counterpart (the reference has only the state-space particle
filter); oracles are exact conjugate normal-normal posteriors and the
closed-form marginal likelihood.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from modppl_tpu import Trie, gen, normal
from modppl_tpu.dists.iid import iid
from modppl_tpu.inference.smc_sampler import smc_sampler
from modppl_tpu.inference.tempering import parallel_tempering

ys3 = iid(normal, 3)
YS = np.array([0.8, 1.2, 1.0])

# conjugate normal-normal: mu ~ N(0, 1), y_i ~ N(mu, 0.5), i=1..3
# posterior: precision 1 + 3/0.25 = 13, mean = (sum y / 0.25) / 13
_PREC = 1.0 + 3.0 / 0.25
_POST_MEAN = (YS.sum() / 0.25) / _PREC
_POST_STD = 1.0 / np.sqrt(_PREC)


def _exact_log_ml():
    # y ~ N(0, 0.25 I + 1 * 11^T): evaluate the 3-d Gaussian at YS
    cov = 0.25 * np.eye(3) + np.ones((3, 3))
    sign, logdet = np.linalg.slogdet(2 * np.pi * cov)
    return float(-0.5 * (logdet + YS @ np.linalg.solve(cov, YS)))


@gen
def nn_model(h):
    mu = h.sample(normal, (0.0, 1.0), "mu")
    h.sample(ys3, (mu, 0.5), "ys")
    return mu


OBS = Trie.from_dict({"ys": jnp.asarray(YS)})


def test_smc_sampler_posterior_and_log_ml():
    out = smc_sampler(jax.random.PRNGKey(0), nn_model, (), OBS,
                      num_particles=2048, num_temps=16, num_moves=2,
                      move="hmc", step_size=0.3, num_leapfrog=8)
    mus = np.asarray(out["particles"]["mu"])
    w = np.exp(np.asarray(out["log_weights"]))
    mean = float((w * mus).sum())
    var = float((w * (mus - mean) ** 2).sum())
    assert mean == pytest.approx(_POST_MEAN, abs=0.05)
    assert np.sqrt(var) == pytest.approx(_POST_STD, abs=0.06)
    assert float(out["log_ml"]) == pytest.approx(_exact_log_ml(), abs=0.15)
    # rejuvenation should be accepting at a healthy rate
    assert float(np.mean(np.asarray(out["accept_rate"]))) > 0.4


def test_smc_sampler_mala_move():
    out = smc_sampler(jax.random.PRNGKey(1), nn_model, (), OBS,
                      num_particles=2048, num_temps=16, num_moves=3,
                      move="mala", step_size=0.3)
    mus = np.asarray(out["particles"]["mu"])
    w = np.exp(np.asarray(out["log_weights"]))
    assert float((w * mus).sum()) == pytest.approx(_POST_MEAN, abs=0.07)
    assert float(out["log_ml"]) == pytest.approx(_exact_log_ml(), abs=0.2)


def test_smc_sampler_jits_whole_program():
    f = jax.jit(lambda k: smc_sampler(
        k, nn_model, (), OBS, num_particles=256, num_temps=8,
        num_moves=1, step_size=0.3)["log_ml"])
    a = f(jax.random.PRNGKey(2))
    assert jnp.isfinite(a)


def test_parallel_tempering_cold_chain_posterior():
    out = parallel_tempering(
        jax.random.PRNGKey(3), nn_model, (), OBS,
        num_replicas=6, num_chains=4, num_rounds=400,
        move="hmc", step_size=0.3, num_leapfrog=8)
    # discard burn-in rounds
    mus = np.asarray(out["samples"]["mu"])[:, 100:].ravel()
    assert mus.mean() == pytest.approx(_POST_MEAN, abs=0.06)
    assert mus.std() == pytest.approx(_POST_STD, abs=0.06)
    # swaps must actually occur for tempering to mix
    assert float(np.mean(np.asarray(out["swap_accept"]))) > 0.1


def test_adaptive_smc_sampler():
    from modppl_tpu.inference.smc_sampler import adaptive_smc_sampler
    out = adaptive_smc_sampler(
        jax.random.PRNGKey(4), nn_model, (), OBS, num_particles=2048,
        target_ess=0.9, num_moves=2, move="hmc", step_size=0.3)
    nt = int(out["num_temps"])
    assert 1 < nt < 100
    betas = np.asarray(out["betas"])[:nt]
    assert np.all(np.diff(betas) > 0) and betas[-1] == pytest.approx(1.0)
    mus = np.asarray(out["particles"]["mu"])
    w = np.exp(np.asarray(out["log_weights"]))
    assert float((w * mus).sum()) == pytest.approx(_POST_MEAN, abs=0.05)
    assert float(out["log_ml"]) == pytest.approx(_exact_log_ml(), abs=0.15)
