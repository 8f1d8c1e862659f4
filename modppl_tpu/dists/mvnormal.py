"""Multivariate normal distribution.

Reference parity: ``mvnormal`` (modppl/src/modeling/dists/mvnormal.rs:13-38).
The reference computes the logpdf via explicit determinant + inverse
(mvnormal.rs:14-22); here both logpdf and sampling go through one Cholesky
factorization (batched ``jnp.linalg.cholesky`` maps straight onto the MXU),
with an eager symmetric-eigendecomposition fallback for non-PD covariance
matching mvnormal.rs:27-35.
"""

import jax
import jax.numpy as jnp

from modppl_tpu.dists.base import Distribution, _f


class MvNormal(Distribution):
    """Multivariate Gaussian over vectors; params (mean vector, covariance matrix)."""

    def _logpdf(self, x, mu, cov):
        x, mu, cov = _f(x), _f(mu), _f(cov)
        k = mu.shape[-1]
        chol = jnp.linalg.cholesky(cov)
        centered = x - mu
        # solve L z = (x - mu); mahalanobis^2 = |z|^2 ; log|cov| = 2 sum log diag L
        z = jax.scipy.linalg.solve_triangular(chol, centered[..., None], lower=True)[..., 0]
        logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(chol, axis1=-2, axis2=-1)), axis=-1)
        maha = jnp.sum(z * z, axis=-1)
        return -(k * jnp.log(2.0 * jnp.pi) + logdet + maha) / 2.0

    def _transform(self, cov):
        chol = jnp.linalg.cholesky(cov)
        if not isinstance(chol, jax.core.Tracer) and bool(jnp.any(jnp.isnan(chol))):
            # non-PD fallback (mvnormal.rs:30-34): eigvec * diag(sqrt(eigval))
            w, v = jnp.linalg.eigh(cov)
            return v * jnp.sqrt(jnp.clip(w, 0.0))[..., None, :]
        return chol

    def _sample(self, key, mu, cov):
        mu, cov = _f(mu), _f(cov)
        z = jax.random.normal(key, mu.shape, dtype=mu.dtype)
        return mu + self._transform(cov) @ z


mvnormal = MvNormal()
