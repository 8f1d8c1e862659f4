"""Hand-coded sequential HMM GenFn + exact forward-algorithm oracle.

Reference parity: modppl/tests/hmm/ — a GenFn with
``Data = (list[state | None], list[obs | None])`` (vector buffers, no tries):
generate only at t=1 (model.rs:50-60), update only for EXTEND (model.rs:62-79).
The exact forward algorithm (forward.rs:3-23) is the quantitative oracle for
the particle filter's log-marginal-likelihood estimate
(tests/particle_filter.rs:76 gate: |err| <= 0.03 @ 10k particles).
"""

import jax
import jax.numpy as jnp

from modppl_tpu.core.gfi import ArgDiff, GenFn, Trace
from modppl_tpu.dists import categorical


def hmm_forward_alg(prior, emission_dists, transition_dists, observations):
    """Exact marginal likelihood of `observations` (hmm/forward.rs:3-23).

    Matrix conventions match the reference: emission_dists[obs, state],
    transition_dists[new_state, prev_state].
    """
    prior = jnp.asarray(prior)
    emission_dists = jnp.asarray(emission_dists)
    transition_dists = jnp.asarray(transition_dists)
    marginal_likelihood = 1.0
    alpha = prior
    for obs in observations:
        likelihoods = emission_dists[obs, :]
        prev_posterior = alpha * likelihoods
        evidence = jnp.sum(prev_posterior)
        prev_posterior = prev_posterior / evidence
        alpha = transition_dists @ prev_posterior
        marginal_likelihood = marginal_likelihood * evidence
    return marginal_likelihood


@jax.jit
def hmm_forward_log_ml(prior, emission_dists, transition_dists, observations):
    """Compiled log marginal likelihood: lax.scan over time in log space.

    Same recursion as :func:`hmm_forward_alg` but numerically stable for
    long sequences (log-space normalization) and jittable (observations as
    a traced int array).
    """
    log_prior = jnp.log(jnp.asarray(prior))
    log_e = jnp.log(jnp.asarray(emission_dists))
    log_t = jnp.log(jnp.asarray(transition_dists))

    def step(log_alpha, obs):
        scored = log_alpha + log_e[obs, :]
        evidence = jax.scipy.special.logsumexp(scored)
        post = scored - evidence
        log_alpha = jax.scipy.special.logsumexp(log_t + post[None, :], axis=1)
        return log_alpha, evidence

    _, evidences = jax.lax.scan(step, log_prior,
                                jnp.asarray(observations, jnp.int32))
    return jnp.sum(evidences)


@jax.jit
def hmm_forward_log_ml_parallel(prior, emission_dists, transition_dists,
                                observations):
    """Time-parallel forward algorithm via ``jax.lax.associative_scan``.

    The discrete analog of the parallel Kalman filter
    (inference/kalman.py): the forward recursion
    alpha_t = diag(e[obs_t]) @ T @ alpha_{t-1} is a chain of matrix
    products, which compose associatively — prefix products (each
    max-normalized, with the log scale carried separately to avoid
    underflow) run in O(log T) depth, and the log-ML is the accumulated
    scale plus the final reduction against alpha_0.
    """
    prior = jnp.asarray(prior)
    e = jnp.asarray(emission_dists)
    t_mat = jnp.asarray(transition_dists)
    obs = jnp.asarray(observations, jnp.int32)

    alpha0 = e[obs[0], :] * prior
    if obs.shape[0] == 1:
        return jnp.log(jnp.sum(alpha0))

    # M_t = diag(e[obs_t]) @ T for t = 1..T-1
    Ms = e[obs[1:]][:, :, None] * t_mat[None, :, :]
    norms = jnp.max(Ms, axis=(1, 2))
    mats = Ms / norms[:, None, None]
    scales = jnp.log(norms)

    def assoc(earlier, later):
        # composite of an earlier time range followed by a later one:
        # product applies the later matrices on the LEFT. The norm is
        # per-ELEMENT (associative_scan batches the combine over a leading
        # axis): a global jnp.max(m) would normalize every slice by the
        # batch max, forfeiting per-element underflow protection and tying
        # intermediate rounding to the scan-tree layout.
        se, me = earlier
        sl, ml = later
        m = ml @ me
        norm = jnp.max(m, axis=(-2, -1), keepdims=True)
        return se + sl + jnp.log(norm[..., 0, 0]), m / norm

    s_fin, m_fin = jax.lax.associative_scan(assoc, (scales, mats))
    return s_fin[-1] + jnp.log(jnp.sum(m_fin[-1] @ alpha0))


class HMMParams:
    """(hmm/model.rs:8-25)"""

    def __init__(self, prior, emission_matrix, transition_matrix):
        self.prior = jnp.asarray(prior)
        self.emission_matrix = jnp.asarray(emission_matrix)
        self.transition_matrix = jnp.asarray(transition_matrix)


class HMM(GenFn):
    """Sequential HMM over Data = (states list, observations list)."""

    def __init__(self, params):
        self.params = params

    def _kernel(self, key, data, state_probs, new_observation):
        # (model.rs:34-43): sample the new state, score the observation.
        new_state = categorical.sample(key, (state_probs,))
        obs_probs = self.params.emission_matrix[:, new_state]
        states, observations = data
        data = (states + [new_state], observations + [new_observation])
        weight = categorical.logpdf(new_observation, (obs_probs,))
        return data, weight

    def simulate(self, key, args):
        raise NotImplementedError("HMM: simulate not implemented (model.rs:49-51)")

    def generate(self, key, args, constraints):
        # (model.rs:53-63): only T=1 initialization.
        t, _ = args
        if t != 1:
            raise ValueError(
                "HMM.generate: only expect generate to initialize (T = 1)")
        new_observation = constraints[1][0]
        data, weight = self._kernel(
            key, ([], []), self.params.prior, new_observation)
        return Trace(args, data, list(data[1]), weight), weight

    def update(self, key, trace, args, argdiff, constraints):
        # (model.rs:65-83): EXTEND only.
        if argdiff is not ArgDiff.EXTEND:
            raise ValueError(f"HMM.update: can't handle ArgDiff {argdiff}")
        new_observation = constraints[1][-1]
        prev_state = trace.data[0][-1]
        state_probs = self.params.transition_matrix[:, prev_state]
        data, weight = self._kernel(key, trace.data, state_probs, new_observation)
        new_trace = Trace((trace.args[0] + 1, trace.args[1]), data,
                          list(data[1]), trace.logjp + weight)
        return new_trace, ([], []), weight


def hmm_scan_kernel(params):
    """Compiled-tier HMM as a ScanKernel of @gen functions over trie data.

    The same model as the hand-coded HMM class above, but expressed in the
    DSL with static structure so the vectorized filter compiles it
    (vmap particles x lax.scan time). Traced-index gathers replace the
    reference's per-sample matrix-column extraction (hmm/model.rs:36-37,73).
    """
    from modppl_tpu.modeling import gen
    from modppl_tpu.inference.vsmc import ScanKernel

    @gen
    def init(h, _state0):
        z = h.sample(categorical, (params.prior,), "z")
        h.sample(categorical, (params.emission_matrix[:, z],), "obs")
        return z

    @gen
    def step(h, t, z_prev):
        z = h.sample(categorical, (params.transition_matrix[:, z_prev],), "z")
        h.sample(categorical, (params.emission_matrix[:, z],), "obs")
        return z

    return ScanKernel(init, step)
