"""Simple DSL models: Bayesian linear regression and the 2D pointed model.

Reference parity: modppl/tests/dyngenfns/simple.rs and the custom
``Uniform2D`` distribution (modppl/tests/pointed_model/types_2d.rs:11-31) —
demonstrates user-defined Distribution extension.
"""

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from modppl_tpu.dists import Distribution, mvnormal, normal
from modppl_tpu.modeling import gen


@dataclass(frozen=True)
class Bounds:
    """Rectangle bounds for Uniform2D (types_2d.rs:7-8).

    Registered as a static pytree node so it can ride through
    vmap/jit inside Trace.args.
    """

    xmin: float
    xmax: float
    ymin: float
    ymax: float


jax.tree_util.register_static(Bounds)


class Uniform2D(Distribution):
    """Uniform over a rectangle; a custom user distribution (types_2d.rs:11-31)."""

    def _logpdf(self, p, b):
        inside = ((b.xmin <= p[0]) & (p[0] <= b.xmax)
                  & (b.ymin <= p[1]) & (p[1] <= b.ymax))
        area = (b.xmax - b.xmin) * (b.ymax - b.ymin)
        return jnp.where(inside, -jnp.log(area), -jnp.inf)

    def _sample(self, key, b):
        u = jax.random.uniform(key, (2,))
        return jnp.array([
            u[0] * (b.xmax - b.xmin) + b.xmin,
            u[1] * (b.ymax - b.ymin) + b.ymin,
        ])


uniform_2d = Uniform2D()


@gen
def obs_model(h, slope, intercept, xs):
    """Observation model of Bayesian linear regression (simple.rs:11-17)."""
    return jnp.stack([
        h.sample(normal, (slope * x + intercept, 0.1), f"{i}")
        for i, x in enumerate(xs)
    ])


@gen
def line_model(h, xs):
    """Bayesian linear regression prior + likelihood (simple.rs:19-24)."""
    slope = h.sample(normal, (0.0, 1.0), "slope")
    intercept = h.sample(normal, (0.0, 2.0), "intercept")
    return h.trace(obs_model, (slope, intercept, xs), "ys")


@gen
def pointed_2d_model(h, bounds, cov):
    """Uniform latent + mvnormal observation (simple.rs:28-33)."""
    latent = h.sample(uniform_2d, bounds, "latent")
    return h.sample(mvnormal, (latent, cov), "obs")


@gen
def pointed_2d_drift_proposal(h, trace, noise):
    """Gaussian drift on the latent; proposal convention: trace is the
    first arg (simple.rs:36-41)."""
    prev_latent = trace.data.read("latent")
    h.sample(mvnormal, (prev_latent, noise), "latent")
