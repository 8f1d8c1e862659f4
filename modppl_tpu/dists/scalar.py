"""Scalar distributions (10 reference singletons).

Reference parity (modppl/src/modeling/dists/):

- bernoulli  (bernoulli.rs:11-18)  — Distribution<bool, p>
- uniform_continuous / uniform (uniform.rs:21-33) — inclusive bounds, -inf outside
- uniform_discrete (uniform.rs:40-53) — i64 on [a, b] inclusive
- categorical (categorical.rs:12-32) — integer index over a probs vector
- normal (normal.rs:12-28) — (mu, std-dev) parameterization
- geometric (geometric.rs:15-25) — k failures before first success
- poisson (poisson.rs:15-23)
- gamma (gamma.rs:16-26) — (shape a, scale b)
- beta (beta.rs:16-27)

logpdfs use log-space gammaln/betaln arithmetic (better conditioned than the
reference's linear-space Γ ratios at beta.rs:19-20 but identical values), and
samplers use jax.random (replacing rand/rand_distr): each is a pure function
of a threefry key, so particles/chains vectorize with vmap.
"""

import jax
import jax.numpy as jnp
from jax.scipy.special import gammaln, betaln, xlogy, xlog1py

from modppl_tpu.dists.base import Distribution, _f

_NEG_INF = -jnp.inf


class Bernoulli(Distribution):
    """Bernoulli over {True, False} with success probability p (bernoulli.rs:11-18)."""

    is_discrete = True
    support = "discrete"

    def _logpdf(self, x, p):
        p = _f(p)
        x = jnp.asarray(x)
        return jnp.log(jnp.where(x, p, 1.0 - p))

    def _sample(self, key, p):
        return jax.random.bernoulli(key, _f(p))

    def _sample_batch(self, key, shape, p):
        return jax.random.bernoulli(key, _f(p), shape=shape)


class UniformContinuous(Distribution):
    """Uniform on [a, b], inclusive bounds, -inf outside (uniform.rs:21-33)."""

    support = "other"  # interval with param-dependent bounds

    def _check(self, a, b):
        # reference panics when a >= b (uniform.rs:6-10); only checkable on
        # concrete params — under jit tracing the check is skipped.
        try:
            bad = float(a) >= float(b)
        except (TypeError, jax.errors.TracerArrayConversionError,
                jax.errors.ConcretizationTypeError):
            return
        if bad:
            raise ValueError(f"a >= b in [a, b] = [{a}, {b}]; b > a is required.")

    def _logpdf(self, x, a, b):
        self._check(a, b)
        a, b, x = _f(a), _f(b), _f(x)
        inside = (a <= x) & (x <= b)
        return jnp.where(inside, -jnp.log(b - a), _NEG_INF)

    def _sample(self, key, a, b):
        self._check(a, b)
        a, b = _f(a), _f(b)
        return jax.random.uniform(key, (), dtype=a.dtype) * (b - a) + a

    def _sample_batch(self, key, shape, a, b):
        self._check(a, b)
        a, b = _f(a), _f(b)
        return jax.random.uniform(key, shape, dtype=a.dtype) * (b - a) + a


class UniformDiscrete(Distribution):
    """Uniform integers on [a, b] inclusive (uniform.rs:40-53)."""

    is_discrete = True
    support = "discrete"

    def _logpdf(self, x, a, b):
        x = jnp.asarray(x)
        inside = (a <= x) & (x <= b)
        return jnp.where(inside, -jnp.log(_f(b - a + 1)), _NEG_INF)

    def _sample(self, key, a, b):
        return jax.random.randint(key, (), a, b + 1)

    def _sample_batch(self, key, shape, a, b):
        return jax.random.randint(key, shape, a, b + 1)


class Categorical(Distribution):
    """Integer index distributed by a probability vector (categorical.rs:12-32).

    The reference asserts probs sum to 1 within 1e-8 (categorical.rs:14,23);
    here out-of-support indices score -inf and sampling uses the Gumbel trick
    via jax.random.categorical (vectorized inverse-CDF equivalent).
    """

    is_discrete = True
    support = "discrete"

    def _logpdf(self, x, probs):
        probs = _f(probs)
        x = jnp.asarray(x)
        n = probs.shape[-1]
        inside = (0 <= x) & (x < n)
        safe = jnp.clip(x, 0, n - 1)
        return jnp.where(inside, jnp.log(jnp.take_along_axis(
            probs, safe[..., None], axis=-1)[..., 0]), _NEG_INF)

    def _sample(self, key, probs):
        return jax.random.categorical(key, jnp.log(_f(probs)), axis=-1)

    def _sample_batch(self, key, shape, probs):
        return jax.random.categorical(key, jnp.log(_f(probs)), axis=-1,
                                      shape=shape)


class Normal(Distribution):
    """Gaussian with (mu, std-dev) parameterization (normal.rs:12-28).

    logpdf formula matches normal.rs:13-17: -(z^2 + ln 2π)/2 - ln σ.
    Sampling replaces the Marsaglia polar rejection recursion (normal.rs:19-27)
    with jax.random.normal (Box-Muller in XLA, no data-dependent control flow).
    """

    def _logpdf(self, x, mu, std):
        x, mu, std = _f(x), _f(mu), _f(std)
        z = (x - mu) / std
        return -(z * z + jnp.log(2.0 * jnp.pi)) / 2.0 - jnp.log(std)

    def _sample(self, key, mu, std):
        mu, std = _f(mu), _f(std)
        return jax.random.normal(key, jnp.broadcast_shapes(mu.shape, std.shape),
                                 dtype=mu.dtype) * std + mu

    def _sample_batch(self, key, shape, mu, std):
        mu, std = _f(mu), _f(std)
        shape = jnp.broadcast_shapes(tuple(shape), mu.shape, std.shape)
        return jax.random.normal(key, shape, dtype=mu.dtype) * std + mu


class Geometric(Distribution):
    """Number of failures before the first success (geometric.rs:15-25)."""

    is_discrete = True
    support = "discrete"

    def _logpdf(self, k, p):
        p = _f(p)
        k = jnp.asarray(k)
        valid = k >= 0
        return jnp.where(valid, xlog1py(_f(k), -p) + jnp.log(p), _NEG_INF)

    def _sample(self, key, p):
        # inverse-CDF: floor(log(u) / log(1-p)) — exact, no rejection loop.
        return self._sample_batch(key, (), p)

    def _sample_batch(self, key, shape, p):
        u = jax.random.uniform(key, shape)
        return jnp.floor(jnp.log1p(-u) / jnp.log1p(-_f(p))).astype(jnp.int64
            if jax.config.jax_enable_x64 else jnp.int32)


class Poisson(Distribution):
    """Poisson with rate λ (poisson.rs:15-23): k lnλ - λ - ln k!."""

    is_discrete = True
    support = "discrete"

    def _logpdf(self, k, rate):
        rate = _f(rate)
        kf = _f(k)
        valid = jnp.asarray(k) >= 0
        return jnp.where(valid, xlogy(kf, rate) - rate - gammaln(kf + 1.0), _NEG_INF)

    def _sample(self, key, rate):
        return jax.random.poisson(key, _f(rate))

    def _sample_batch(self, key, shape, rate):
        return jax.random.poisson(key, _f(rate), shape=shape)


class Gamma(Distribution):
    """Gamma with (shape a, scale b) (gamma.rs:16-26):
    (a-1)ln x - x/b - lnΓ(a) - a ln b."""

    support = "positive"

    def _logpdf(self, x, a, b):
        x, a, b = _f(x), _f(a), _f(b)
        return (a - 1.0) * jnp.log(x) - x / b - gammaln(a) - a * jnp.log(b)

    def _sample(self, key, a, b):
        return jax.random.gamma(key, _f(a)) * _f(b)

    def _sample_batch(self, key, shape, a, b):
        return jax.random.gamma(key, _f(a), shape=shape) * _f(b)


class Beta(Distribution):
    """Beta(a, b) (beta.rs:16-27), computed in log space via betaln."""

    support = "unit_interval"

    def _logpdf(self, x, a, b):
        x, a, b = _f(x), _f(a), _f(b)
        return (a - 1.0) * jnp.log(x) + (b - 1.0) * jnp.log1p(-x) - betaln(a, b)

    def _sample(self, key, a, b):
        return jax.random.beta(key, _f(a), _f(b))

    def _sample_batch(self, key, shape, a, b):
        return jax.random.beta(key, _f(a), _f(b), shape=shape)


bernoulli = Bernoulli()
uniform_continuous = UniformContinuous()
uniform = uniform_continuous  # alias (uniform.rs:19)
uniform_discrete = UniformDiscrete()
categorical = Categorical()
normal = Normal()
geometric = Geometric()
poisson = Poisson()
gamma = Gamma()
beta = Beta()
