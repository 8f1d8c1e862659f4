"""Compiled vectorized SMC tests.

The reference's quantitative SMC gate at full scale: particle-filter LML vs
the exact HMM forward algorithm, |err| <= 0.03 @ 10,000 particles
(modppl/tests/particle_filter.rs:38,76) — run here as one jitted XLA program
(vmap particles x lax.scan time), plus spiral tracking (tests/smc.rs) at
2000 particles.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from modppl_tpu import Trie
from modppl_tpu.inference.vsmc import particle_filter
from modppl_tpu.models import HMMParams, hmm_forward_alg
from modppl_tpu.models.hmm import hmm_scan_kernel
from modppl_tpu.models.spiral import polar_to_cartesian, spiral_scan_kernel


def stack_tries(tries):
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *tries)


def test_vsmc_hmm_lml_gate():
    # particle_filter.rs:36-78 at the full reference scale (10k particles).
    num_particles = 10_000
    prior = jnp.array([0.2, 0.3, 0.5])
    emission = jnp.array([
        [0.1, 0.2, 0.7],
        [0.2, 0.7, 0.1],
        [0.7, 0.2, 0.1],
    ]).T
    transition = jnp.array([
        [0.4, 0.4, 0.2],
        [0.2, 0.3, 0.5],
        [0.9, 0.05, 0.05],
    ]).T
    params = HMMParams(prior, emission, transition)
    kernel = hmm_scan_kernel(params)

    data = [0, 0, 1, 2]
    expected = float(jnp.log(hmm_forward_alg(prior, emission, transition, data)))

    init_c = Trie.from_dict({"obs": jnp.asarray(data[0])})
    step_c = stack_tries(
        [Trie.from_dict({"obs": jnp.asarray(o)}) for o in data[1:]])

    out = particle_filter(
        jax.random.PRNGKey(0), kernel, jnp.zeros(()), init_c, step_c,
        num_particles, resampling="multinomial", ess_threshold=1.0)
    assert float(out["log_ml"]) == pytest.approx(expected, abs=0.03)

    # systematic resampling must hit the same gate (lower variance)
    out2 = particle_filter(
        jax.random.PRNGKey(1), kernel, jnp.zeros(()), init_c, step_c,
        num_particles, resampling="systematic", ess_threshold=1.0)
    assert float(out2["log_ml"]) == pytest.approx(expected, abs=0.03)


def test_vsmc_hmm_adaptive_resampling():
    prior = jnp.array([0.5, 0.5])
    emission = jnp.array([[0.9, 0.1], [0.1, 0.9]])
    transition = jnp.array([[0.8, 0.2], [0.2, 0.8]])
    params = HMMParams(prior, emission, transition)
    kernel = hmm_scan_kernel(params)
    data = [0, 0, 1, 1, 0]
    expected = float(jnp.log(hmm_forward_alg(prior, emission, transition, data)))

    init_c = Trie.from_dict({"obs": jnp.asarray(data[0])})
    step_c = stack_tries(
        [Trie.from_dict({"obs": jnp.asarray(o)}) for o in data[1:]])
    out = particle_filter(
        jax.random.PRNGKey(2), kernel, jnp.zeros(()), init_c, step_c,
        5000, resampling="systematic", ess_threshold=0.5)
    assert float(out["log_ml"]) == pytest.approx(expected, abs=0.05)
    # with threshold 0.5 at least one step should skip resampling
    assert not bool(jnp.all(out["resampled"]))


def test_vsmc_spiral_tracking():
    # tests/smc.rs:49-92, compiled, 2000 particles.
    kernel = spiral_scan_kernel()
    T = 12
    obs = []
    for t in range(T):
        ang = 2 * np.pi * t / T
        obs.append(jnp.array([0.4 * np.cos(ang), 0.4 * np.sin(ang)]))
    init_c = Trie.from_dict({"obs": obs[0]})
    step_c = stack_tries([Trie.from_dict({"obs": o}) for o in obs[1:]])

    out = particle_filter(
        jax.random.PRNGKey(3), kernel, jnp.zeros(2), init_c, step_c,
        2000, resampling="systematic", ess_threshold=1.0)
    final_pos = jax.vmap(polar_to_cartesian)(out["state"])
    lw = out["log_weights"] - jax.scipy.special.logsumexp(out["log_weights"])
    mean_pos = jnp.sum(jnp.exp(lw)[:, None] * final_pos, axis=0)
    assert float(jnp.linalg.norm(mean_pos - obs[-1])) < 0.1
    assert np.isfinite(float(out["log_ml"]))
    assert out["ancestors"].shape == (T - 1, 2000)


def test_vsmc_matches_eager_reference_engine():
    # cross-check: compiled filter vs the eager ParticleSystem on the same
    # HMM posterior (statistical agreement of LML estimates).
    from modppl_tpu.inference import ParticleSystem
    from modppl_tpu.models import HMM

    prior = jnp.array([0.3, 0.7])
    emission = jnp.array([[0.6, 0.4], [0.2, 0.8]]).T
    transition = jnp.array([[0.7, 0.3], [0.4, 0.6]]).T
    params = HMMParams(prior, emission, transition)
    data = [1, 0, 1]
    exact = float(jnp.log(hmm_forward_alg(prior, emission, transition, data)))

    kernel = hmm_scan_kernel(params)
    init_c = Trie.from_dict({"obs": jnp.asarray(data[0])})
    step_c = stack_tries(
        [Trie.from_dict({"obs": jnp.asarray(o)}) for o in data[1:]])
    out = particle_filter(
        jax.random.PRNGKey(4), kernel, jnp.zeros(()), init_c, step_c, 4000)
    assert float(out["log_ml"]) == pytest.approx(exact, abs=0.05)

    pf = ParticleSystem(HMM(params), 300, jax.random.PRNGKey(5))
    pf.init_step(None, ([None], [data[0]]))
    for o in data[1:]:
        pf.step(([None], [o]))
        pf.resample()
    assert float(pf.log_marginal_likelihood_estimate()) == pytest.approx(
        exact, abs=0.3)


def test_vsmc_rejuvenation_preserves_target():
    # resample-move rejuvenation must leave the LML estimate unbiased:
    # the HMM forward gate still holds with moves on the latent state.
    from modppl_tpu import select

    prior = jnp.array([0.2, 0.3, 0.5])
    emission = jnp.array([
        [0.1, 0.2, 0.7], [0.2, 0.7, 0.1], [0.7, 0.2, 0.1]]).T
    transition = jnp.array([
        [0.4, 0.4, 0.2], [0.2, 0.3, 0.5], [0.9, 0.05, 0.05]]).T
    params = HMMParams(prior, emission, transition)
    kernel = hmm_scan_kernel(params)
    data = [0, 0, 1, 2]
    expected = float(jnp.log(hmm_forward_alg(prior, emission, transition, data)))
    init_c = Trie.from_dict({"obs": jnp.asarray(data[0])})
    step_c = stack_tries(
        [Trie.from_dict({"obs": jnp.asarray(o)}) for o in data[1:]])
    out = particle_filter(
        jax.random.PRNGKey(11), kernel, jnp.zeros(()), init_c, step_c,
        10_000, rejuvenation=(select("z"), 2))
    assert float(out["log_ml"]) == pytest.approx(expected, abs=0.03)


def test_vsmc_rejuvenation_improves_spiral_ess():
    kernel = spiral_scan_kernel()
    T = 10
    obs = [jnp.array([0.4 * np.cos(2 * np.pi * t / 16),
                      0.4 * np.sin(2 * np.pi * t / 16)]) for t in range(T)]
    init_c = Trie.from_dict({"obs": obs[0]})
    step_c = stack_tries([Trie.from_dict({"obs": o}) for o in obs[1:]])
    from modppl_tpu import select

    base = particle_filter(jax.random.PRNGKey(12), kernel, jnp.zeros(2),
                           init_c, step_c, 1000)
    rej = particle_filter(jax.random.PRNGKey(12), kernel, jnp.zeros(2),
                          init_c, step_c, 1000,
                          rejuvenation=(select("dr", "dtheta"), 3))
    # both finite and tracking; rejuvenated min-ESS should not be worse
    assert np.isfinite(float(rej["log_ml"]))
    assert float(jnp.min(rej["ess"])) >= 0.5 * float(jnp.min(base["ess"]))
