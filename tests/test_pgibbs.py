"""Particle Gibbs / conditional SMC against the exact Kalman smoother.

PG targets the exact smoothing posterior p(x_{0:T-1} | y_{0:T-1}); on a
linear-Gaussian SSM that posterior's marginals come from the RTS smoother
(inference/kalman.py), giving a sharp quantitative gate for the CSMC
pinning, ancestry, and backtracking logic.
"""

import jax
import jax.numpy as jnp
import numpy as np

from modppl_tpu import Trie
from modppl_tpu.inference.kalman import kalman_smoother
from modppl_tpu.inference.pgibbs import csmc_sweep, particle_gibbs
from modppl_tpu.models.lgssm import lgssm_scan_kernel, lgssm_simulate, make_lgssm

T = 6


def _setup():
    one = jnp.ones((1, 1))
    params = make_lgssm(0.8 * one, 0.3 * one, one, 0.4 * one,
                        jnp.zeros(1), one)
    _, ys = lgssm_simulate(jax.random.PRNGKey(0), params, T)
    kernel = lgssm_scan_kernel(params)
    init_c = Trie.from_dict({"obs": ys[0]})
    step_c = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs),
        *[Trie.from_dict({"obs": y}) for y in ys[1:]])
    return params, ys, kernel, init_c, step_c


def test_particle_gibbs_matches_kalman_smoother():
    params, ys, kernel, init_c, step_c = _setup()
    smth = kalman_smoother(params, ys)

    out = particle_gibbs(
        jax.random.PRNGKey(1), kernel, jnp.zeros(1), init_c, step_c,
        latent_init_addrs=("x",), latent_step_addrs=("x",),
        num_particles=32, num_sweeps=1500)

    # drop burn-in; trajectory samples: init (S, 1), steps (S, T-1, 1)
    xs0 = np.asarray(out["init"]["x"])[300:, 0]
    xs_rest = np.asarray(out["steps"]["x"])[300:, :, 0]
    traj = np.concatenate([xs0[:, None], xs_rest], axis=1)  # (S, T)

    exact_means = np.asarray(smth["means"])[:, 0]
    exact_sds = np.sqrt(np.asarray(smth["covs"])[:, 0, 0])
    np.testing.assert_allclose(traj.mean(axis=0), exact_means, atol=0.12)
    np.testing.assert_allclose(traj.std(axis=0), exact_sds, atol=0.12)


def test_csmc_sweep_log_ml_and_pinning():
    params, ys, kernel, init_c, step_c = _setup()

    # reference trajectory from the prior
    ref_init = {"x": jnp.zeros(1)}
    ref_steps = {"x": jnp.zeros((T - 1, 1))}
    out = csmc_sweep(jax.random.PRNGKey(2), kernel, jnp.zeros(1), init_c,
                     step_c, ref_init, ref_steps, num_particles=512)
    # CSMC's log-ML estimate is still consistent; compare loosely to exact
    from modppl_tpu.inference.kalman import kalman_filter
    exact = float(kalman_filter(params, ys)["log_ml"])
    assert abs(float(out["log_ml"]) - exact) < 1.0
    # output trajectory has the right shapes
    assert out["ref_init"]["x"].shape == (1,)
    assert out["ref_steps"]["x"].shape == (T - 1, 1)


def test_particle_gibbs_without_ancestor_sampling():
    params, ys, kernel, init_c, step_c = _setup()
    smth = kalman_smoother(params, ys)
    out = particle_gibbs(
        jax.random.PRNGKey(3), kernel, jnp.zeros(1), init_c, step_c,
        latent_init_addrs=("x",), latent_step_addrs=("x",),
        num_particles=64, num_sweeps=1500, ancestor_sampling=False)
    # final-step marginal is the easiest for plain PG (no path degeneracy)
    xT = np.asarray(out["steps"]["x"])[300:, -1, 0]
    assert abs(xT.mean() - float(smth["means"][-1, 0])) < 0.12
