"""Checkpoint/resume wired into the runners (VERDICT r3 #8).

The round-trip gate: interrupt a run at a checkpoint, restore in a fresh
driver call, and the concatenated results must be BITWISE-identical to the
uninterrupted (equally chunked) run — for both the particle filter and the
pooled-adaptation HMC runner.
"""

import jax
import jax.numpy as jnp
import numpy as np

from modppl_tpu import Trie
from modppl_tpu.inference.checkpointed import (
    checkpointed_hmc_runner,
    checkpointed_particle_filter,
)
from modppl_tpu.inference.vsmc import ScanKernel
from modppl_tpu.models.spiral import spiral_init, spiral_step

from tests.test_batched_filter import kalman_log_ml, lg_init, lg_step


def _spiral_data(T=9):
    obs = [jnp.array([0.4 * np.cos(2 * np.pi * t / 16),
                      0.4 * np.sin(2 * np.pi * t / 16)], dtype=jnp.float32)
           for t in range(T)]
    init_c = Trie.from_dict({"obs": obs[0]})
    step_c = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs),
        *[Trie.from_dict({"obs": o}) for o in obs[1:]])
    return init_c, step_c


def test_particle_filter_checkpoint_resume_bitwise(tmp_path):
    kernel = ScanKernel(spiral_init, spiral_step)
    init_c, step_c = _spiral_data()
    key = jax.random.PRNGKey(5)
    path_a = str(tmp_path / "ckpt_full")
    path_b = str(tmp_path / "ckpt_cut")

    full = checkpointed_particle_filter(
        key, kernel, jnp.zeros(2, jnp.float32), init_c, step_c, 512,
        checkpoint_path=path_a, checkpoint_every=3)

    # "interrupted" run: process only the first 3 steps by slicing the
    # constraints, checkpointing at step 3...
    step_c_head = jax.tree_util.tree_map(lambda x: x[:3], step_c)
    checkpointed_particle_filter(
        key, kernel, jnp.zeros(2, jnp.float32), init_c, step_c_head, 512,
        checkpoint_path=path_b, checkpoint_every=3)
    # ...then resume from that checkpoint with the FULL constraints
    resumed = checkpointed_particle_filter(
        key, kernel, jnp.zeros(2, jnp.float32), init_c, step_c, 512,
        checkpoint_path=path_b, checkpoint_every=3, resume_from=path_b)

    np.testing.assert_array_equal(np.asarray(full["state"]),
                                  np.asarray(resumed["state"]))
    np.testing.assert_array_equal(np.asarray(full["log_weights"]),
                                  np.asarray(resumed["log_weights"]))
    np.testing.assert_array_equal(np.asarray(full["log_ml"]),
                                  np.asarray(resumed["log_ml"]))


def test_particle_filter_checkpointed_matches_oracle(tmp_path):
    """The chunked filter still passes the quantitative Kalman gate."""
    from tests.test_batched_filter import YS, _constraints

    init_c, step_c = _constraints()
    out = checkpointed_particle_filter(
        jax.random.PRNGKey(0), ScanKernel(lg_init, lg_step),
        jnp.zeros(()), init_c, step_c, 4096,
        checkpoint_path=str(tmp_path / "k"), checkpoint_every=2)
    assert abs(float(out["log_ml"]) - kalman_log_ml(YS)) < 0.08


def test_hmc_checkpoint_resume_bitwise(tmp_path):
    from modppl_tpu import gen, normal

    @gen
    def conjugate(h):
        mu = h.sample(normal, (0.0, 1.0), "mu")
        h.sample(normal, (mu, 1.0), "x")

    obs = Trie.from_dict({"x": 1.0})
    run_a = checkpointed_hmc_runner(
        conjugate, (), obs, checkpoint_path=str(tmp_path / "full"),
        checkpoint_every=4, num_samples=10, num_warmup=25, num_chains=4,
        num_leapfrog=3, setup_key=jax.random.PRNGKey(1))
    full = run_a(jax.random.PRNGKey(2))

    # interrupted: run only 4 samples' worth by... running the same runner
    # but stopping after the first chunk — emulate by a runner whose
    # num_samples is 4 (same chunking/keys), then resume to 10
    run_head = checkpointed_hmc_runner(
        conjugate, (), obs, checkpoint_path=str(tmp_path / "cut"),
        checkpoint_every=4, num_samples=4, num_warmup=25, num_chains=4,
        num_leapfrog=3, setup_key=jax.random.PRNGKey(1))
    head = run_head(jax.random.PRNGKey(2))

    run_b = checkpointed_hmc_runner(
        conjugate, (), obs, checkpoint_path=str(tmp_path / "cut"),
        checkpoint_every=4, num_samples=10, num_warmup=25, num_chains=4,
        num_leapfrog=3, setup_key=jax.random.PRNGKey(1))
    tail = run_b(jax.random.PRNGKey(2), resume_from=str(tmp_path / "cut"))

    # head chunk + resumed tail == uninterrupted run, bitwise
    got_us = np.concatenate([np.asarray(head["unconstrained"]),
                             np.asarray(tail["unconstrained"])], axis=1)
    np.testing.assert_array_equal(got_us,
                                  np.asarray(full["unconstrained"]))
    np.testing.assert_array_equal(np.asarray(tail["step_size"]),
                                  np.asarray(full["step_size"]))
    got_ap = np.concatenate([np.asarray(head["accept_prob"]),
                             np.asarray(tail["accept_prob"])], axis=1)
    np.testing.assert_array_equal(got_ap, np.asarray(full["accept_prob"]))


def test_sharded_filter_checkpoint_resume_bitwise(tmp_path):
    """VERDICT r4 #3: the HEADLINE (sharded batched) filter can now
    checkpoint and resume — bitwise round-trip at dp=1 and dp=8."""
    from modppl_tpu.inference.checkpointed import (
        checkpointed_sharded_particle_filter,
    )
    from modppl_tpu.models.spiral import spiral_scan_kernel
    from modppl_tpu.parallel.mesh import make_mesh

    N, T = 1024, 9
    kernel = spiral_scan_kernel()
    init_c, step_c = _spiral_data(T)
    key = jax.random.PRNGKey(11)

    for mesh in (None, make_mesh(sp=1)):
        tag = "dp1" if mesh is None else "dp8"
        path_a = str(tmp_path / f"sh_full_{tag}")
        path_b = str(tmp_path / f"sh_cut_{tag}")
        kw = dict(num_particles=N, checkpoint_every=3, auto_batch=True)

        full = checkpointed_sharded_particle_filter(
            mesh, key, kernel, jnp.zeros(2, jnp.float32), init_c, step_c,
            checkpoint_path=path_a, **kw)
        # interrupted at step 3, then resumed with the full constraints
        step_c_head = jax.tree_util.tree_map(lambda x: x[:3], step_c)
        checkpointed_sharded_particle_filter(
            mesh, key, kernel, jnp.zeros(2, jnp.float32), init_c,
            step_c_head, checkpoint_path=path_b, **kw)
        resumed = checkpointed_sharded_particle_filter(
            mesh, key, kernel, jnp.zeros(2, jnp.float32), init_c, step_c,
            checkpoint_path=path_b, resume_from=path_b, **kw)

        np.testing.assert_array_equal(np.asarray(full["state"]),
                                      np.asarray(resumed["state"]))
        np.testing.assert_array_equal(np.asarray(full["log_weights"]),
                                      np.asarray(resumed["log_weights"]))
        np.testing.assert_array_equal(np.asarray(full["log_ml"]),
                                      np.asarray(resumed["log_ml"]))

    # and the dp=1 / dp=8 checkpointed runs agree with EACH OTHER (the
    # sharded filter's layout-invariance contract survives chunking)
    outs = {}
    for mesh, tag in ((None, "dp1"), (make_mesh(sp=1), "dp8")):
        outs[tag] = checkpointed_sharded_particle_filter(
            mesh, key, kernel, jnp.zeros(2, jnp.float32), init_c, step_c,
            num_particles=N, checkpoint_path=str(tmp_path / f"x_{tag}"),
            checkpoint_every=4, auto_batch=True)
    np.testing.assert_array_equal(np.asarray(outs["dp1"]["log_ml"]),
                                  np.asarray(outs["dp8"]["log_ml"]))
    np.testing.assert_array_equal(np.asarray(outs["dp1"]["state"]),
                                  np.asarray(outs["dp8"]["state"]))
