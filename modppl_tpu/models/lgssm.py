"""Linear-Gaussian state-space model (LGSSM) family.

The linear-Gaussian analog of the reference's HMM fixture
(modppl/tests/hmm/model.rs): a sequential latent chain with an exact
closed-form oracle. Where the HMM's oracle is the discrete forward
algorithm (hmm/forward.rs:3-23), the LGSSM's is the Kalman filter
(inference/kalman.py) — including a **time-parallel** associative-scan
form, this framework's long-context/sequence-parallel story.

Model:
    x_1 ~ N(mu0, P0)
    x_t = A x_{t-1} + w_t,   w_t ~ N(0, Q)     (t >= 2)
    y_t = H x_t + v_t,       v_t ~ N(0, R)
"""

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from modppl_tpu.dists import mvnormal
from modppl_tpu.modeling import gen


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class LGSSMParams:
    """Parameters of a linear-Gaussian SSM; a pytree (usable as a traced
    argument, e.g. as the target of particle-marginal MH)."""

    A: jnp.ndarray    # (D, D) transition matrix
    Q: jnp.ndarray    # (D, D) process-noise covariance
    H: jnp.ndarray    # (E, D) observation matrix
    R: jnp.ndarray    # (E, E) observation-noise covariance
    mu0: jnp.ndarray  # (D,)   initial mean
    P0: jnp.ndarray   # (D, D) initial covariance

    def tree_flatten(self):
        return (self.A, self.Q, self.H, self.R, self.mu0, self.P0), None

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves)

    @property
    def state_dim(self):
        return self.A.shape[-1]

    @property
    def obs_dim(self):
        return self.H.shape[-2]


def make_lgssm(A, Q, H, R, mu0, P0):
    f32 = lambda x: jnp.asarray(x, jnp.result_type(float))
    return LGSSMParams(f32(A), f32(Q), f32(H), f32(R), f32(mu0), f32(P0))


def lgssm_scan_kernel(params):
    """Bootstrap-SMC form: a ScanKernel of @gen functions.

    Same (init, step) split as hmm_scan_kernel (models/hmm.py): the latent
    transition is sampled from the prior, the observation is the
    constrained address — the reference particle filter's only mode
    (modppl/src/inference/particle_filter.rs:59-95).
    """
    from modppl_tpu.inference.vsmc import ScanKernel

    @gen
    def init(h, _state0):
        x = h.sample(mvnormal, (params.mu0, params.P0), "x")
        h.sample(mvnormal, (params.H @ x, params.R), "obs")
        return x

    @gen
    def step(h, t, x_prev):
        x = h.sample(mvnormal, (params.A @ x_prev, params.Q), "x")
        h.sample(mvnormal, (params.H @ x, params.R), "obs")
        return x

    return ScanKernel(init, step)


def lgssm_simulate(key, params, num_steps):
    """Draw (states (T, D), observations (T, E)) from the generative model."""
    k0, k_scan = jax.random.split(key)
    x0 = mvnormal.sample(k0, (params.mu0, params.P0))

    def body(x_prev, k):
        k_x, k_y = jax.random.split(k)
        x = mvnormal.sample(k_x, (params.A @ x_prev, params.Q))
        return x, x

    ks = jax.random.split(jax.random.fold_in(k_scan, 0), num_steps - 1)
    _, xs_rest = jax.lax.scan(body, x0, ks)
    xs = jnp.concatenate([x0[None], xs_rest], axis=0)
    yk = jax.random.split(jax.random.fold_in(key, 1), num_steps)
    ys = jax.vmap(lambda k, x: mvnormal.sample(k, (params.H @ x, params.R)))(
        yk, xs)
    return xs, ys
