"""Stochastic volatility state-space model (batched-particle form).

A standard SMC benchmark family (no reference counterpart — the reference's
only state-space fixtures are the spiral kernel and the 3-state HMM):

    h_0 ~ N(mu, sigma / sqrt(1 - phi^2))
    h_t = mu + phi (h_{t-1} - mu) + sigma eps_t
    y_t ~ N(0, beta exp(h_t / 2))

Latent log-volatility h drives the observation scale, so weights are
heavy-tailed and resampling fires often — a harder filtering workload than
the linear-Gaussian family. The kernel is an ordinary per-particle pair;
run it through ``vsmc.particle_filter`` directly or through the batched
tier with ``batched_particle_filter(..., auto_batch=True)``
(modeling/autobatch.py — round 3 removed the hand-written plate()
variant). Params default to daily-returns-like values.
"""

from dataclasses import dataclass

import jax.numpy as jnp

from modppl_tpu.dists import normal
from modppl_tpu.modeling import gen


@dataclass(frozen=True)
class SVParams:
    mu: float = -1.0      # long-run mean log-volatility
    phi: float = 0.97     # persistence
    sigma: float = 0.15   # vol-of-vol
    beta: float = 1.0     # scale


def sv_scan_kernel(params: SVParams = SVParams()):
    """Per-particle (init, step) pair (vmapped or auto-batched tiers)."""
    from modppl_tpu.inference.vsmc import ScanKernel

    mu, phi, sigma, beta = params.mu, params.phi, params.sigma, params.beta
    sd0 = sigma / jnp.sqrt(1.0 - phi * phi)

    @gen
    def sv_init(h, _state0):
        hv = h.sample(normal, (mu, sd0), "h")
        h.sample(normal, (0.0, beta * jnp.exp(hv / 2.0)), "y")
        return hv

    @gen
    def sv_step(h, t, prev):
        hv = h.sample(normal, (mu + phi * (prev - mu), sigma), "h")
        h.sample(normal, (0.0, beta * jnp.exp(hv / 2.0)), "y")
        return hv

    return ScanKernel(sv_init, sv_step)


def make_stochvol_joint(T, params: SVParams = SVParams()):
    """Joint (whole-path) form for gradient inference (round 5).

    NON-CENTERED parameterization: the latent address is the (T,) vector
    of standard-normal innovations ``z`` (one ``iid`` plate — identity
    bijector, unit prior scales, so the warmup metric starts
    well-conditioned); the log-volatility path is reconstructed with an
    in-model ``lax.scan`` and the observations enter through one
    ``factor``. A genuinely non-quadratic d=T target (the likelihood
    couples ``exp(h/2)`` scales) for HMC/ChEES/VI — the state-space
    member of the non-quadratic benchmark family next to
    models/logreg.py.
    """
    import jax

    mu, phi, sigma, beta = params.mu, params.phi, params.sigma, params.beta
    sd0 = sigma / jnp.sqrt(1.0 - phi * phi)
    from modppl_tpu.dists.iid import iid

    z_dist = iid(normal, T)

    @gen
    def sv_joint(h, ys):
        z = h.sample(z_dist, (0.0, 1.0), "z")
        h0 = mu + sd0 * z[0]

        def step(h_prev, z_t):
            h_t = mu + phi * (h_prev - mu) + sigma * z_t
            return h_t, h_t

        _, hs = jax.lax.scan(step, h0, z[1:])
        hv = jnp.concatenate([jnp.reshape(h0, (1,)), hs])
        ll = jnp.sum(normal.logpdf(ys, (0.0, beta * jnp.exp(hv / 2.0))))
        h.factor(ll, "lik")
        return hv

    return sv_joint


def volatility_path(z, params: SVParams = SVParams()):
    """Deterministic innovations -> log-volatility map (the same transform
    sv_joint applies), for turning posterior ``z`` draws into ``h`` paths."""
    import jax

    mu, phi, sigma = params.mu, params.phi, params.sigma
    sd0 = sigma / jnp.sqrt(1.0 - phi * phi)
    h0 = mu + sd0 * z[..., 0]

    def step(h_prev, z_t):
        h_t = mu + phi * (h_prev - mu) + sigma * z_t
        return h_t, h_t

    _, hs = jax.lax.scan(step, h0, jnp.moveaxis(z[..., 1:], -1, 0))
    return jnp.concatenate([h0[..., None], jnp.moveaxis(hs, 0, -1)],
                           axis=-1)


def simulate_sv(key, T, params: SVParams = SVParams()):
    """Ground-truth (h, y) path for tests/demos."""
    import jax

    mu, phi, sigma, beta = params.mu, params.phi, params.sigma, params.beta
    k1, k2 = jax.random.split(key)
    eps = jax.random.normal(k1, (T,))
    eta = jax.random.normal(k2, (T,))

    def body(h_prev, inp):
        e, n = inp
        h = mu + phi * (h_prev - mu) + sigma * e
        y = beta * jnp.exp(h / 2.0) * n
        return h, (h, y)

    h0 = mu + sigma / jnp.sqrt(1 - phi * phi) * eps[0]
    y0 = beta * jnp.exp(h0 / 2.0) * eta[0]
    _, (hs, ys) = jax.lax.scan(body, h0, (eps[1:], eta[1:]))
    return (jnp.concatenate([jnp.array([h0]), hs]),
            jnp.concatenate([jnp.array([y0]), ys]))
