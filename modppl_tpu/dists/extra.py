"""Additional distributions beyond the reference's ten.

The reference library stops at the ten singletons of
modppl/src/modeling/dists/ (SURVEY.md §2); these extensions follow the
same ``Distribution`` protocol (logpdf + counter-based sampler + batched
fast path) and the same support-metadata convention so gradient inference
picks up the right unconstraining bijectors automatically.
"""

import jax
import jax.numpy as jnp
from jax.scipy.special import gammaln, xlogy

from modppl_tpu.dists.base import Distribution, _f


class Exponential(Distribution):
    """Exponential with *rate* parameterization: p(x) = lam * exp(-lam x)."""

    support = "positive"

    def _logpdf(self, x, lam):
        x, lam = _f(x), _f(lam)
        return jnp.where(x >= 0.0, jnp.log(lam) - lam * x, -jnp.inf)

    def _sample(self, key, lam):
        lam = _f(lam)
        return jax.random.exponential(key, lam.shape, lam.dtype) / lam

    def _sample_batch(self, key, shape, lam):
        lam = _f(lam)
        shape = jnp.broadcast_shapes(tuple(shape), lam.shape)
        return jax.random.exponential(key, shape, lam.dtype) / lam


class Laplace(Distribution):
    """Laplace with (loc, scale): p(x) = exp(-|x - mu| / b) / (2b)."""

    support = "real"

    def _logpdf(self, x, loc, scale):
        x, loc, scale = _f(x), _f(loc), _f(scale)
        return -jnp.abs(x - loc) / scale - jnp.log(2.0 * scale)

    def _sample(self, key, loc, scale):
        loc, scale = _f(loc), _f(scale)
        shape = jnp.broadcast_shapes(loc.shape, scale.shape)
        return loc + scale * jax.random.laplace(key, shape, loc.dtype)

    def _sample_batch(self, key, shape, loc, scale):
        loc, scale = _f(loc), _f(scale)
        shape = jnp.broadcast_shapes(tuple(shape), loc.shape, scale.shape)
        return loc + scale * jax.random.laplace(key, shape, loc.dtype)


class StudentT(Distribution):
    """Student's t with (df, loc, scale)."""

    support = "real"

    def _logpdf(self, x, df, loc, scale):
        x, df, loc, scale = _f(x), _f(df), _f(loc), _f(scale)
        z = (x - loc) / scale
        half = (df + 1.0) / 2.0
        return (gammaln(half) - gammaln(df / 2.0)
                - 0.5 * jnp.log(df * jnp.pi) - jnp.log(scale)
                - half * jnp.log1p(z * z / df))

    def _sample(self, key, df, loc, scale):
        df, loc, scale = _f(df), _f(loc), _f(scale)
        shape = jnp.broadcast_shapes(df.shape, loc.shape, scale.shape)
        return loc + scale * jax.random.t(key, df, shape, loc.dtype)

    def _sample_batch(self, key, shape, df, loc, scale):
        df, loc, scale = _f(df), _f(loc), _f(scale)
        shape = jnp.broadcast_shapes(tuple(shape), df.shape, loc.shape,
                                     scale.shape)
        return loc + scale * jax.random.t(key, df, shape, loc.dtype)


class Binomial(Distribution):
    """Binomial over successes k in {0..n}; params (n, p)."""

    is_discrete = True
    support = "discrete"

    def _logpdf(self, k, n, p):
        kf, nf, p = _f(k), _f(n), _f(p)
        # xlogy guards: at the boundaries p=0 (k=0) and p=1 (k=n) the
        # naive k*log(p) terms produce 0*(-inf) = NaN; xlogy returns the
        # exact 0.0, matching Bernoulli's edge behavior (dists/scalar.py)
        logp = (gammaln(nf + 1.0) - gammaln(kf + 1.0) - gammaln(nf - kf + 1.0)
                + xlogy(kf, p) + xlogy(nf - kf, 1.0 - p))
        valid = (kf >= 0) & (kf <= nf)
        return jnp.where(valid, logp, -jnp.inf)

    def _sample(self, key, n, p):
        return jax.random.binomial(key, n, p).astype(jnp.int32)

    def _sample_batch(self, key, shape, n, p):
        return jax.random.binomial(key, n, p, shape=tuple(shape)).astype(
            jnp.int32)


class Dirichlet(Distribution):
    """Dirichlet over the simplex; params: concentration vector alpha."""

    support = "other"  # simplex — no default scalar bijector

    def _logpdf(self, x, alpha):
        x, alpha = _f(x), _f(alpha)
        norm = gammaln(jnp.sum(alpha, -1)) - jnp.sum(gammaln(alpha), -1)
        return norm + jnp.sum((alpha - 1.0) * jnp.log(x), -1)

    def _sample(self, key, alpha):
        alpha = _f(alpha)
        return jax.random.dirichlet(key, alpha, dtype=alpha.dtype)

    def _sample_batch(self, key, shape, alpha):
        alpha = _f(alpha)
        return jax.random.dirichlet(key, alpha, shape=tuple(shape),
                                    dtype=alpha.dtype)


class NegativeBinomial(Distribution):
    """Negative binomial: k failures before the r-th success; params (r, p).

    Generalizes the reference's geometric (geometric.rs — the r = 1 case,
    same k-failures convention).
    """

    is_discrete = True
    support = "discrete"

    def _logpdf(self, k, r, p):
        kf, rf, p = _f(k), _f(r), _f(p)
        # xlogy guard: at p=1 (k=0) the naive k*log1p(-p) is 0*(-inf)=NaN
        logp = (gammaln(kf + rf) - gammaln(rf) - gammaln(kf + 1.0)
                + rf * jnp.log(p) + xlogy(kf, 1.0 - p))
        return jnp.where(kf >= 0, logp, -jnp.inf)

    def _sample(self, key, r, p):
        # gamma-Poisson mixture: lambda ~ Gamma(r, (1-p)/p), k ~ Poisson
        k_g, k_p = jax.random.split(key)
        rf, p = _f(r), _f(p)
        lam = jax.random.gamma(k_g, rf, dtype=rf.dtype) * (1.0 - p) / p
        return jax.random.poisson(k_p, lam).astype(jnp.int32)

    def _sample_batch(self, key, shape, r, p):
        k_g, k_p = jax.random.split(key)
        rf, p = _f(r), _f(p)
        lam = jax.random.gamma(k_g, rf, shape=tuple(shape),
                               dtype=rf.dtype) * (1.0 - p) / p
        return jax.random.poisson(k_p, lam).astype(jnp.int32)


exponential = Exponential()
laplace = Laplace()
student_t = StudentT()
binomial = Binomial()
dirichlet = Dirichlet()
negative_binomial = NegativeBinomial()
