"""Unfold combinator + SMC on the spiral-tracking model.

Port of modppl/tests/smc.rs (spiral tracking, eager reference-parity path)
with structural assertions replacing the reference's JSON dumps.
"""

import jax
import jax.numpy as jnp
import numpy as np

from modppl_tpu import ArgDiff, Trie
from modppl_tpu.inference import ParticleSystem
from modppl_tpu.models import spiral_model
from modppl_tpu.models.spiral import polar_to_cartesian


def simulate_loop(key, timesteps):
    """Deformed-circle observation simulator (smc.rs:17-46), simplified."""
    init_angle = float(jax.random.uniform(key, ())) * 2 * np.pi
    radius = 0.4
    obs = []
    for t in range(timesteps):
        ang = 2 * np.pi * t / timesteps + init_angle
        point = jnp.array([radius * np.cos(ang), radius * np.sin(ang)])
        c = Trie()
        c.observe("obs", point)
        obs.append(c)
    return obs


def test_unfold_simulate_generate_update():
    key = jax.random.PRNGKey(0)
    trace = spiral_model.simulate(key, (3, jnp.zeros(2)))
    assert len(trace.data) == 3 and len(trace.retv) == 3
    # t=0 step has r/theta; later steps have dr/dtheta (unfold.rs:18-28)
    assert trace.data[0].search("r") is not None
    assert trace.data[1].search("dr") is not None
    assert np.isfinite(float(trace.logjp))

    obs = simulate_loop(jax.random.PRNGKey(1), 3)
    gtrace, w = spiral_model.generate(key, (3, jnp.zeros(2)), obs)
    assert np.isfinite(float(w))
    for t in range(3):
        assert np.allclose(np.asarray(gtrace.data[t].read("obs")),
                           np.asarray(obs[t].read("obs")))

    # EXTEND update appends one step (dynunfold.rs:66-100)
    more = simulate_loop(jax.random.PRNGKey(2), 4)[3:]
    ntrace, discard, uw = spiral_model.update(
        jax.random.PRNGKey(3), gtrace, (4, jnp.zeros(2)), ArgDiff.EXTEND, more)
    assert len(ntrace.data) == 4
    assert ntrace.args[0] == 4
    assert len(discard) == 1 and discard[0].is_empty()
    assert np.isfinite(float(uw))
    # previous steps untouched
    assert np.allclose(np.asarray(ntrace.data[0].read("obs")),
                       np.asarray(gtrace.data[0].read("obs")))


def test_smc_spiral_tracking():
    # smc.rs:49-92 at reduced scale for the eager engine. 12 steps around
    # the circle gives ~0.52 rad/step, within the kernel's dtheta ~ N(0.4, 0.2)
    # prior.
    num_timesteps, num_particles = 12, 100
    data = simulate_loop(jax.random.PRNGKey(4), num_timesteps)

    pf = ParticleSystem(spiral_model, num_particles, jax.random.PRNGKey(5))
    pf.init_step(jnp.zeros(2), [data[0]])
    pf.resample()
    for t, constraints in enumerate(data[1:]):
        pf.step([constraints])
        pf.resample()

    # particles should track the observations: final cartesian positions
    # close to the final observed point
    final_obs = np.asarray(data[-1].read("obs"))
    positions = np.stack([
        np.asarray(polar_to_cartesian(tr.retv[-1])) for tr in pf.traces])
    mean_pos = positions.mean(axis=0)
    assert np.linalg.norm(mean_pos - final_obs) < 0.2
    assert np.isfinite(float(pf.log_marginal_likelihood_estimate()))
