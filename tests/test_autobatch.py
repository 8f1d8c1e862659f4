"""Auto-derived batched-particle execution (modeling/autobatch.py).

The batched tier used to require hand-written batch-aware model variants
(round 2's ``spiral_*_batched`` with ``plate()`` addresses and reshaped
math). ``auto_batch_scan_kernel`` / ``batched_particle_filter(...,
auto_batch=True)`` derive that execution from the ordinary per-particle
kernel. The parity fixture below is the (now deleted) hand-written batched
spiral, kept here as the oracle: the auto-batched run must reproduce its
plate streams — identical ancestors and log-ML bit-for-bit, states to the
last couple of ulps (the only residue is FMA fusion context inside the
deterministic per-lane math; every sampled value and every resampling
decision is identical).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from modppl_tpu import Trie, gen, normal
from modppl_tpu.dists import mvnormal, uniform
from modppl_tpu.dists.plate import plate
from modppl_tpu.inference.vsmc import ScanKernel, batched_particle_filter
from modppl_tpu.modeling.autobatch import auto_batch_scan_kernel
from modppl_tpu.models.spiral import OBS_COV, spiral_scan_kernel


# ---- parity oracle: round-2's hand-written batch-aware spiral kernel ------

@gen
def spiral_init_handbatched(h, _state0, n):
    r = h.sample(plate(uniform, n), (0.0, 1.0), "r")
    theta = h.sample(plate(uniform, n), (0.0, 2.0 * jnp.pi), "theta")
    pol = jnp.stack([r, theta], axis=-1)
    pos = jnp.stack([pol[:, 0] * jnp.cos(pol[:, 1]),
                     pol[:, 0] * jnp.sin(pol[:, 1])], axis=-1)
    h.sample(mvnormal, (pos, OBS_COV), "obs")
    return pol


@gen
def spiral_step_handbatched(h, t, prev_pol):
    n = prev_pol.shape[0]
    dr = h.sample(plate(normal, n), (0.0, 0.1), "dr")
    dtheta = h.sample(plate(normal, n), (0.4, 0.2), "dtheta")
    pol = jnp.stack([prev_pol[:, 0] + dr, prev_pol[:, 1] + dtheta], axis=-1)
    pos = jnp.stack([pol[:, 0] * jnp.cos(pol[:, 1]),
                     pol[:, 0] * jnp.sin(pol[:, 1])], axis=-1)
    h.sample(mvnormal, (pos, OBS_COV), "obs")
    return pol


def _spiral_constraints(num_steps):
    obs = [jnp.array([0.4 * np.cos(2 * np.pi * t / 16),
                      0.4 * np.sin(2 * np.pi * t / 16)])
           for t in range(num_steps)]
    init_c = Trie.from_dict({"obs": obs[0]})
    step_c = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs),
        *[Trie.from_dict({"obs": o}) for o in obs[1:]])
    return init_c, step_c


def test_auto_batch_matches_handwritten_plate_kernel():
    n, T = 512, 6
    init_c, step_c = _spiral_constraints(T)
    hand = batched_particle_filter(
        jax.random.PRNGKey(5),
        ScanKernel(spiral_init_handbatched, spiral_step_handbatched),
        jnp.zeros(2), init_c, step_c, n, ess_threshold=1.0)
    auto = batched_particle_filter(
        jax.random.PRNGKey(5), spiral_scan_kernel(), jnp.zeros(2),
        init_c, step_c, n, ess_threshold=1.0, auto_batch=True)
    # identical plate streams -> identical resampling decisions and log-ML
    np.testing.assert_array_equal(np.asarray(hand["ancestors"]),
                                  np.asarray(auto["ancestors"]))
    np.testing.assert_array_equal(np.asarray(hand["log_ml"]),
                                  np.asarray(auto["log_ml"]))
    np.testing.assert_allclose(np.asarray(hand["state"]),
                               np.asarray(auto["state"]), rtol=0, atol=1e-14)
    np.testing.assert_allclose(np.asarray(hand["log_weights"]),
                               np.asarray(auto["log_weights"]),
                               rtol=0, atol=1e-12)


def test_auto_batch_matches_vmapped_tier_statistically():
    """Auto-batched and per-particle-vmapped tiers estimate the same
    log-ML (different RNG streams; agreement within Monte-Carlo error)."""
    from modppl_tpu.inference.vsmc import particle_filter

    n, T = 4096, 8
    init_c, step_c = _spiral_constraints(T)
    auto = batched_particle_filter(
        jax.random.PRNGKey(0), spiral_scan_kernel(), jnp.zeros(2),
        init_c, step_c, n, ess_threshold=1.0, auto_batch=True)
    vmapped = particle_filter(
        jax.random.PRNGKey(1), spiral_scan_kernel(), jnp.zeros(2),
        init_c, step_c, n, ess_threshold=1.0, store_traces=False)
    assert float(auto["log_ml"]) == pytest.approx(
        float(vmapped["log_ml"]), abs=1.0)


def test_auto_batch_state_dependent_latents():
    """Latents whose params depend on the particle state fall back to
    per-lane streams (no (n, n) blowup) and stay correct: scalar
    linear-Gaussian vs the exact Kalman evidence."""
    A, Q, R = 0.9, 0.5, 0.3

    @gen
    def lg_init(h, _s0):
        x = h.sample(normal, (0.0, 1.0), "x")
        h.sample(normal, (x, R), "y")
        return x

    @gen
    def lg_step(h, t, prev):
        x = h.sample(normal, (A * prev, Q), "x")
        h.sample(normal, (x, R), "y")
        return x

    # data simulated FROM the model (out-of-model data makes the bootstrap
    # log-ML estimator heavy-tailed and the MC tolerance meaningless)
    rng = np.random.default_rng(3)
    T = 10
    x = rng.normal(0.0, 1.0)
    ys_list = []
    for t in range(T):
        if t > 0:
            x = A * x + rng.normal(0.0, Q)
        ys_list.append(x + rng.normal(0.0, R))
    ys = jnp.asarray(ys_list)
    init_c = Trie.from_dict({"y": ys[0]})
    step_c = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs),
        *[Trie.from_dict({"y": y}) for y in ys[1:]])

    out = batched_particle_filter(
        jax.random.PRNGKey(2), ScanKernel(lg_init, lg_step), jnp.zeros(()),
        init_c, step_c, 8192, ess_threshold=1.0, auto_batch=True)

    # exact evidence by Kalman recursion
    mu, var, total = 0.0, 1.0, 0.0
    for t, y in enumerate(np.asarray(ys)):
        if t > 0:
            mu, var = A * mu, A * A * var + Q * Q
        s = var + R * R
        total += -0.5 * (np.log(2 * np.pi * s) + (y - mu) ** 2 / s)
        k = var / s
        mu, var = mu + k * (y - mu), (1 - k) * var
    assert float(out["log_ml"]) == pytest.approx(total, abs=0.05)


def test_auto_batch_subtrace_calls_get_distinct_lane_streams():
    """Kernels with nested h.trace sub-calls run under auto_batch: each
    lane's sub-call folds its lane index into the key (distinct streams),
    and the filter still matches the exact evidence."""

    @gen
    def noise_source(h, scale):
        return h.sample(normal, (0.0, scale), "eps")

    @gen
    def lg2_init(h, _s0):
        x = h.trace(noise_source, (1.0,), "xsub")
        h.sample(normal, (x, 0.3), "y")
        return x

    @gen
    def lg2_step(h, t, prev):
        eps = h.trace(noise_source, (0.5,), "xsub")
        x = 0.9 * prev + eps
        h.sample(normal, (x, 0.3), "y")
        return x

    A, Q, R = 0.9, 0.5, 0.3
    rng = np.random.default_rng(5)
    T = 8
    x = rng.normal(0.0, 1.0)
    ys_list = []
    for t in range(T):
        if t > 0:
            x = A * x + rng.normal(0.0, Q)
        ys_list.append(x + rng.normal(0.0, R))
    ys = jnp.asarray(ys_list)
    init_c = Trie.from_dict({"y": ys[0]})
    step_c = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs),
        *[Trie.from_dict({"y": y}) for y in ys[1:]])

    out = batched_particle_filter(
        jax.random.PRNGKey(6), ScanKernel(lg2_init, lg2_step), jnp.zeros(()),
        init_c, step_c, 8192, ess_threshold=1.0, auto_batch=True)

    # distinct streams across lanes: the step states must not collapse
    assert float(jnp.std(out["state"])) > 0.05

    mu, var, total = 0.0, 1.0, 0.0
    for t, y in enumerate(np.asarray(ys)):
        if t > 0:
            mu, var = A * mu, A * A * var + Q * Q
        s = var + R * R
        total += -0.5 * (np.log(2 * np.pi * s) + (y - mu) ** 2 / s)
        k = var / s
        mu, var = mu + k * (y - mu), (1 - k) * var
    assert float(out["log_ml"]) == pytest.approx(total, abs=0.12)
