"""Unconstraining bijectors for gradient-based inference.

No reference counterpart (the reference implements no gradient inference —
README.md:44 explicitly excludes choice gradients). Here ``logjp`` is
differentiable by construction, and these bijectors map bounded supports to
R^n so HMC/NUTS/VI can run in unconstrained space with the standard
log-Jacobian correction.

The bijector for an address is derived from the ``Distribution.support``
metadata recorded on its trie leaf at trace time.
"""

import jax.numpy as jnp
from jax.nn import log_sigmoid, sigmoid


class Bijector:
    """x = forward(u) with u unconstrained; ldj = log|d forward / du|."""

    def forward(self, u):
        raise NotImplementedError

    def inverse(self, x):
        raise NotImplementedError

    def log_det_jacobian(self, u):
        raise NotImplementedError


class Identity(Bijector):
    def forward(self, u):
        return u

    def inverse(self, x):
        return x

    def log_det_jacobian(self, u):
        return jnp.zeros(())


class Exp(Bijector):
    """R -> (0, inf)."""

    def forward(self, u):
        return jnp.exp(u)

    def inverse(self, x):
        return jnp.log(x)

    def log_det_jacobian(self, u):
        return jnp.sum(u)


class Sigmoid(Bijector):
    """R -> (0, 1)."""

    def forward(self, u):
        return sigmoid(u)

    def inverse(self, x):
        return jnp.log(x) - jnp.log1p(-x)

    def log_det_jacobian(self, u):
        return jnp.sum(log_sigmoid(u) + log_sigmoid(-u))


class Interval(Bijector):
    """R -> (a, b) via scaled sigmoid (for static bounds)."""

    def __init__(self, a, b):
        self.a = a
        self.b = b

    def forward(self, u):
        return self.a + (self.b - self.a) * sigmoid(u)

    def inverse(self, x):
        z = (x - self.a) / (self.b - self.a)
        return jnp.log(z) - jnp.log1p(-z)

    def log_det_jacobian(self, u):
        return jnp.sum(log_sigmoid(u) + log_sigmoid(-u)
                       + jnp.log(self.b - self.a))


IDENTITY = Identity()
EXP = Exp()
SIGMOID = Sigmoid()

_BY_SUPPORT = {
    "real": IDENTITY,
    "positive": EXP,
    "unit_interval": SIGMOID,
}


def transform_for(dist):
    """Default bijector for a distribution, or None if unsupported."""
    if dist is None:
        return None
    return _BY_SUPPORT.get(dist.support)
