"""Plate wrapper with *elementwise* log-densities (batched-particle tier).

``plate(dist, n)`` draws ``n`` iid values from one key's counter stream and
scores them **elementwise** — unlike :mod:`modppl_tpu.dists.iid`, whose
``IID`` models one vector-valued random variable with a *summed* logpdf.

The elementwise form is what the batched-particle execution tier needs
(inference/vsmc.py batched filter): there the leading axis is the particle
axis, and each particle must keep its own per-address log-probability so
generate/regenerate weights come out per-particle ``(n,)`` instead of
collapsed to a scalar. Sampling uses ``Distribution.sample_batch`` — a
single threefry stream for the whole axis, ~3x fewer PRNG blocks than
per-particle ``split`` + ``fold_in`` at 10^6 particles.

Params may be scalars or arrays broadcasting against ``(n,)``.
"""

from modppl_tpu.dists.base import Distribution, as_param_tuple


class Plate(Distribution):
    """n iid draws along a leading axis, scored elementwise."""

    def __init__(self, base, n):
        self.base = base
        self.n = n
        self.is_discrete = base.is_discrete
        self.support = base.support

    def logpdf(self, x, params):
        # elementwise: base logpdfs broadcast over the leading axis
        return self.base._logpdf(x, *as_param_tuple(params))

    def sample(self, key, params):
        return self.base.sample_batch(key, (self.n,), params)

    def __repr__(self):
        return f"Plate({self.base!r}, n={self.n})"


def plate(base, n):
    """``plate(normal, n)``: n iid normals, one stream, elementwise logp."""
    return Plate(base, n)
