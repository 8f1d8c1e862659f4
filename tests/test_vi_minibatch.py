"""Data-subsampled ELBO (VERDICT r4 #7): the minibatch gradient identity
and end-to-end subsampled ADVI convergence on a conjugate target."""

import jax
import jax.numpy as jnp
import numpy as np

from modppl_tpu import Trie, gen, normal
from modppl_tpu.dists.iid import iid
from modppl_tpu.inference.vi import advi

N_DATA = 12
YS = jnp.asarray(np.random.default_rng(3).standard_normal(N_DATA) + 1.5)


@gen
def conj_mb(h, idx):
    mu = h.sample(normal, (0.0, 1.0), "mu")
    yb = YS[idx]
    ll = jnp.sum(normal.logpdf(yb, (mu, 1.0))) * (N_DATA / idx.shape[0])
    h.factor(ll, "lik")
    return mu


ys_dist = iid(normal, N_DATA)


@gen
def conj_full(h):
    mu = h.sample(normal, (0.0, 1.0), "mu")
    h.sample(ys_dist, (mu, 1.0), "ys")
    return mu


def _elbo_grad(model, args, observed, idx, k, num_mc=4):
    """Gradient of the MC ELBO at fixed variational params and fixed MC
    noise — isolating the data-subsampling estimator."""
    from jax.flatten_util import ravel_pytree

    from modppl_tpu.inference.hmc import make_unconstrained_logprob

    full_args = args if idx is None else args + (idx,)
    tr, _ = model.generate(jax.random.PRNGKey(0), full_args, observed)
    logprob, u0, _, _ = make_unconstrained_logprob(
        model, full_args, tr, observed)
    u0f, unravel = ravel_pytree(u0)

    def elbo(params):
        mu, log_sigma = params
        eps = jax.random.normal(k, (num_mc, 1), mu.dtype)
        zs = mu[None, :] + jnp.exp(log_sigma)[None, :] * eps
        e_logp = jnp.mean(jax.vmap(lambda z: logprob(unravel(z)))(zs))
        return e_logp + jnp.sum(log_sigma)

    params = (jnp.array([0.3]), jnp.array([-1.0]))
    return jax.grad(elbo)(params)


def test_subsampled_elbo_gradient_is_unbiased():
    """E_idx[subsampled grad] == full-data grad, EXACTLY: with B=1 the
    expectation over the uniform index is the plain average over the N
    single-point batches (same fixed MC noise on both sides)."""
    k = jax.random.PRNGKey(7)
    g_full = _elbo_grad(conj_full, (), Trie.from_dict({"ys": YS}), None, k)
    gs = [_elbo_grad(conj_mb, (), Trie(), jnp.array([i]), k)
          for i in range(N_DATA)]
    g_avg = jax.tree_util.tree_map(
        lambda *a: sum(a) / len(a), *gs)
    for a, b in zip(g_full, g_avg):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-9)


def test_minibatch_advi_matches_conjugate_posterior():
    out = advi(jax.random.PRNGKey(1), conj_mb, (), Trie(),
               num_steps=1500, num_mc=8, minibatch=(N_DATA, 4))
    # conjugate: prec = 1 + 12, mean = sum(ys)/13
    want_mean = float(jnp.sum(YS)) / 13.0
    want_sd = 1.0 / np.sqrt(13.0)
    assert abs(float(out["mu"][0]) - want_mean) < 0.12
    assert abs(float(jnp.exp(out["log_sigma"][0])) - want_sd) < 0.1
    # the per-step minibatch ELBO is dominated by batch-selection noise
    # (swings of 3x between batches), so no trend assertion — the moment
    # checks above are the convergence gate; here only finiteness
    e = np.asarray(out["elbo"])
    assert np.isfinite(e).all()
