"""Quantitative SMC state-moment gate: spiral dynamics vs the exact
time-parallel Kalman smoother.

The reference judges its spiral-tracking SMC demo visually (smc.gif,
modppl/tests/smc.rs:49-92). This makes it quantitative: the spiral's polar
random-walk dynamics (pol_t = pol_{t-1} + [dr, dtheta]; unfold.rs:24-28)
are linear-Gaussian when the observation is taken in polar coordinates, so
an augmented-state LGSSM (third component carries the constant drift)
gives EXACT filtered/smoothed posteriors via inference/kalman.py — the
associative-scan forms. The compiled particle filter on the same model
must reproduce:

- filtered moments at the final step (weighted particle mean/cov), and
- smoothed means at every step, estimated from the ancestral genealogy
  (each surviving particle's trajectory, weighted by final weights),

within Monte-Carlo error.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from modppl_tpu import Trie
from modppl_tpu.inference.kalman import (
    kalman_filter_parallel,
    kalman_smoother_parallel,
)
from modppl_tpu.inference.vsmc import particle_filter
from modppl_tpu.models.lgssm import lgssm_scan_kernel, lgssm_simulate, make_lgssm

DR_STD, DTH_STD, DRIFT = 0.1, 0.2, 0.4
OBS_STD = 0.15
EPS = 1e-10  # pseudo-variance of the constant drift component


def _spiral_lgssm():
    # state (r, theta, 1): drift enters theta through the constant component
    A = np.array([[1.0, 0.0, 0.0],
                  [0.0, 1.0, DRIFT],
                  [0.0, 0.0, 1.0]])
    Q = np.diag([DR_STD ** 2, DTH_STD ** 2, EPS])
    H = np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    R = OBS_STD ** 2 * np.eye(2)
    mu0 = np.array([0.5, 0.0, 1.0])
    P0 = np.diag([0.05, 0.3, EPS])
    return make_lgssm(A, Q, H, R, mu0, P0)


def test_spiral_smc_moments_match_parallel_kalman():
    params = _spiral_lgssm()
    T, N = 12, 32768
    _, ys = lgssm_simulate(jax.random.PRNGKey(0), params, T)

    exact_f = kalman_filter_parallel(params, ys)
    exact_s = kalman_smoother_parallel(params, ys)

    kernel = lgssm_scan_kernel(params)
    init_c = Trie.from_dict({"obs": ys[0]})
    step_c = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs),
        *[Trie.from_dict({"obs": y}) for y in ys[1:]])
    out = particle_filter(jax.random.PRNGKey(1), kernel, jnp.zeros(3),
                          init_c, step_c, N, ess_threshold=1.0,
                          store_traces=True)

    # log-ML cross-check against the associative-scan filter
    assert float(out["log_ml"]) == pytest.approx(
        float(exact_f["log_ml"]), abs=0.1)

    # filtered moments at T: weighted particle cloud vs exact filter
    w = np.exp(np.asarray(out["log_weights"])
               - np.max(np.asarray(out["log_weights"])))
    w = w / w.sum()
    xT = np.asarray(out["state"])                      # (N, 3)
    mean_T = w @ xT
    np.testing.assert_allclose(mean_T[:2],
                               np.asarray(exact_f["means"])[-1, :2],
                               atol=0.02)
    cov_T = (w[:, None] * (xT - mean_T)).T @ (xT - mean_T)
    np.testing.assert_allclose(
        cov_T[:2, :2], np.asarray(exact_f["covs"])[-1, :2, :2], atol=5e-4)

    # smoothed means at every t from the ancestral genealogy
    states = np.concatenate(
        [np.asarray(out["init_traces"].retv)[None],
         np.asarray(out["step_traces"].retv)], axis=0)  # (T, N, 3)
    ancestors = np.asarray(out["ancestors"])            # (T-1, N)
    traj = np.empty_like(states)
    idx = np.arange(N)
    for t in range(T - 1, -1, -1):
        traj[t] = states[t][idx]
        if t > 0:
            idx = ancestors[t - 1][idx]
    smoothed_means = np.einsum("n,tnd->td", w, traj)
    # genealogical degeneracy grows toward t=0: generous but meaningful tol
    np.testing.assert_allclose(smoothed_means[:, :2],
                               np.asarray(exact_s["means"])[:, :2],
                               atol=0.05)
