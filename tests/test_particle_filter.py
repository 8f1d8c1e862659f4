"""Particle filter tests with the exact HMM forward-algorithm oracle.

Port of modppl/tests/particle_filter.rs: forward-algorithm self-check vs
brute-force enumeration at 1e-16 (particle_filter.rs:11-33) and the
particle-filter LML accuracy gate (particle_filter.rs:36-78).

The eager ParticleSystem (reference parity, generic over any GenFn) is
checked at reduced particle count; the 10k-particle |err| <= 0.03 gate runs
on the compiled vectorized SMC (see test_vsmc.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from modppl_tpu.inference import ParticleSystem
from modppl_tpu.models import HMM, HMMParams, hmm_forward_alg


def test_hmm_forward_algorithm():
    # particle_filter.rs:11-33: exact vs brute-force enumeration.
    prior = np.array([0.4, 0.6])
    emission = np.array([[0.1, 0.9], [0.7, 0.3]]).T
    transition = np.array([[0.5, 0.5], [0.2, 0.8]]).T
    obs = [1, 0]

    true_ml = 0.0
    for z0 in range(2):
        for z1 in range(2):
            true_ml += (prior[z0] * emission[obs[0], z0]
                        * transition[z1, z0] * emission[obs[1], z1])

    empirical = float(hmm_forward_alg(prior, emission, transition, obs))
    assert empirical == pytest.approx(true_ml, abs=1e-15)


def test_particle_filter_lml_vs_forward():
    # particle_filter.rs:36-78 at reduced N for the eager engine (the full
    # 10k-particle 0.03 gate runs compiled in test_vsmc.py).
    num_particles = 300
    prior = np.array([0.2, 0.3, 0.5])
    emission = np.array([
        [0.1, 0.2, 0.7],
        [0.2, 0.7, 0.1],
        [0.7, 0.2, 0.1],
    ]).T
    transition = np.array([
        [0.4, 0.4, 0.2],
        [0.2, 0.3, 0.5],
        [0.9, 0.05, 0.05],
    ]).T
    params = HMMParams(prior, emission, transition)
    model = HMM(params)

    data = [0, 0, 1, 2]
    expected = float(jnp.log(hmm_forward_alg(prior, emission, transition, data)))

    pf = ParticleSystem(model, num_particles, jax.random.PRNGKey(0))
    pf.init_step(None, ([None], [data[0]]))
    for obs in data[1:]:
        pf.step(([None], [obs]))
        ess = float(pf.effective_sample_size())
        assert 0.0 < ess <= num_particles
        pf.resample()
    lml = float(pf.log_marginal_likelihood_estimate())
    assert lml == pytest.approx(expected, abs=0.25)


def test_forward_log_ml_compiled_and_parallel():
    """Compiled (lax.scan) and time-parallel (associative_scan) forward
    algorithms agree with the eager oracle (hmm/forward.rs:3-23) exactly."""
    from modppl_tpu.models.hmm import (
        hmm_forward_log_ml, hmm_forward_log_ml_parallel)

    prior = np.array([0.2, 0.3, 0.5])
    emission = np.array([
        [0.1, 0.2, 0.7],
        [0.2, 0.7, 0.1],
        [0.7, 0.2, 0.1],
    ]).T
    transition = np.array([
        [0.4, 0.4, 0.2],
        [0.2, 0.3, 0.5],
        [0.9, 0.05, 0.05],
    ]).T
    data = [0, 0, 1, 2, 1, 0, 2, 2]

    exact = float(jnp.log(hmm_forward_alg(prior, emission, transition, data)))
    seq = float(hmm_forward_log_ml(
        prior, emission, transition, jnp.asarray(data)))
    par = float(hmm_forward_log_ml_parallel(
        prior, emission, transition, jnp.asarray(data)))
    assert abs(seq - exact) < 1e-12
    assert abs(par - exact) < 1e-12
