"""Fused leapfrog+logprob Pallas kernel (ops/leapfrog_pallas.py).

Interpret-mode on CPU: (1) trajectory parity vs the generic pure-JAX
leapfrog used by inference/hmc.py on the same quadratic target; (2) the
fused-kernel HMC recovers the moments of a correlated Gaussian.
"""

import jax
import jax.numpy as jnp
import numpy as np

from modppl_tpu.inference.hmc import _leapfrog
from modppl_tpu.ops.leapfrog_pallas import (
    fused_leapfrog,
    hmc_quadratic,
    hmc_transition_quadratic,
    quadratic_logp,
)


def _target(d, seed=0):
    a = jax.random.normal(jax.random.PRNGKey(seed), (d, d))
    lam = a @ a.T + d * jnp.eye(d)     # precision, well-conditioned
    mean = jnp.arange(1.0, d + 1.0) / d
    b = lam @ mean
    return lam, b, mean


def test_fused_leapfrog_matches_generic():
    d, n, steps = 5, 12, 7
    lam, b, _ = _target(d)
    inv_mass = jnp.linspace(0.5, 1.5, d)
    key = jax.random.PRNGKey(1)
    u0 = jax.random.normal(key, (n, d))
    p0 = jax.random.normal(jax.random.fold_in(key, 1), (n, d))
    eps = jnp.linspace(0.01, 0.03, n)

    grad = jax.grad(lambda u: quadratic_logp(u, lam, b))
    u_ref, p_ref = jax.vmap(
        lambda u, p, e: _leapfrog(grad, u, p, e, steps, inv_mass)
    )(u0, p0, eps)

    u_got, p_got = fused_leapfrog(u0, p0, eps, lam, b, inv_mass, steps,
                                  interpret=True)
    np.testing.assert_allclose(np.asarray(u_got), np.asarray(u_ref),
                               rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(np.asarray(p_got), np.asarray(p_ref),
                               rtol=1e-10, atol=1e-10)


def test_transition_detailed_balance_stationary():
    # from an exact posterior draw, one transition keeps finite logp and
    # reasonable acceptance
    d = 3
    lam, b, mean = _target(d, seed=2)
    cov = jnp.linalg.inv(lam)
    chol = jnp.linalg.cholesky(cov)
    n = 32
    z = jax.random.normal(jax.random.PRNGKey(3), (n, d))
    u = mean[None, :] + z @ chol.T
    u1, logp, aprob, div = hmc_transition_quadratic(
        jax.random.PRNGKey(4), u, jnp.full((n,), 0.2), lam, b,
        jnp.ones(d), num_leapfrog=8, interpret=True)
    assert np.isfinite(np.asarray(logp)).all()
    assert not np.asarray(div).any()
    assert np.asarray(aprob).mean() > 0.5


def test_hmc_quadratic_recovers_moments():
    d = 2
    lam, b, mean = _target(d, seed=5)
    cov = np.linalg.inv(np.asarray(lam))
    chains = 64
    u0 = jax.random.normal(jax.random.PRNGKey(6), (chains, d))
    out = hmc_quadratic(jax.random.PRNGKey(7), u0, lam, b, jnp.ones(d),
                        step_size=0.3, num_samples=300, num_leapfrog=8,
                        interpret=True)
    us = np.asarray(out["samples"][100:])        # drop burn-in
    flat = us.reshape(-1, d)
    np.testing.assert_allclose(flat.mean(0), np.asarray(mean), atol=0.05)
    np.testing.assert_allclose(np.cov(flat.T), cov, atol=0.08)
    assert not np.asarray(out["divergences"]).any()


def test_hmc_auto_dispatch_quadratic():
    """hmc(use_fused_quadratic=True) routes the conjugate model through the
    fused kernel (interpret mode on CPU) and still nails the posterior."""
    from modppl_tpu import Trie, gen, normal
    from modppl_tpu.inference.hmc import hmc

    @gen
    def conjugate(h):
        mu = h.sample(normal, (0.0, 1.0), "mu")
        h.sample(normal, (mu, 0.5), "x")
        return mu

    obs = Trie.from_dict({"x": 1.0})
    out = hmc(jax.random.PRNGKey(0), conjugate, (), obs, num_samples=500,
              num_warmup=300, num_chains=16, use_fused_quadratic=True)
    # posterior: precision 1 + 4 = 5 -> N(0.8, 0.2)
    mus = np.asarray(out["samples"]["mu"]).ravel()
    assert abs(mus.mean() - 0.8) < 0.05
    assert abs(mus.std() - np.sqrt(0.2)) < 0.05
    assert float(np.mean(np.asarray(out["accept_prob"]))) > 0.6


def test_detect_quadratic():
    from jax.flatten_util import ravel_pytree

    from modppl_tpu import Trie, gamma, gen, normal
    from modppl_tpu.dists.iid import iid
    from modppl_tpu.inference.hmc import (
        detect_quadratic_target,
        make_unconstrained_logprob,
    )

    @gen
    def gaussian2(h):
        mu = h.sample(normal, (0.0, 2.0), "mu")
        h.sample(normal, (3.0 * mu, 1.0), "x")

    obs = Trie.from_dict({"x": 1.0})
    tr, _ = gaussian2.generate(jax.random.PRNGKey(0), (), obs)
    logprob, u0, _, _ = make_unconstrained_logprob(gaussian2, (), tr, obs)
    u0f, unravel = ravel_pytree(u0)
    got = detect_quadratic_target(lambda u: logprob(unravel(u)), u0f.shape[0],
                                  u0f.dtype)
    assert got is not None
    lam, b = got
    # precision of mu | x: 1/4 + 9
    np.testing.assert_allclose(np.asarray(lam), [[0.25 + 9.0]], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(b), [3.0], rtol=1e-6)

    ys3 = iid(normal, 3)

    @gen
    def nonquad(h):
        scale = h.sample(gamma, (2.0, 1.0), "scale")
        h.sample(ys3, (0.0, scale), "ys")

    obs2 = Trie.from_dict({"ys": jnp.array([0.5, -0.2, 0.1])})
    tr2, _ = nonquad.generate(jax.random.PRNGKey(1), (), obs2)
    logprob2, u02, _, _ = make_unconstrained_logprob(nonquad, (), tr2, obs2)
    u0f2, unravel2 = ravel_pytree(u02)
    assert detect_quadratic_target(
        lambda u: logprob2(unravel2(u)), u0f2.shape[0], u0f2.dtype) is None

    # inside jit, detection must concretize-fail -> None (fallback)
    def traced_probe(x):
        return detect_quadratic_target(
            lambda u: logprob(unravel(u)) * x, u0f.shape[0], u0f.dtype)

    assert jax.jit(lambda x: jnp.float64(traced_probe(x) is None))(1.0) == 1.0


def test_vpu_small_kernel_matches_mxu_kernel():
    """The chains-on-lanes VPU kernel and the MXU-tiled kernel integrate
    identical trajectories (same leapfrog arithmetic, both interpret mode)
    and the VPU kernel's in-kernel Hamiltonians match the host formula."""
    from modppl_tpu.ops.leapfrog_vpu_pallas import fused_leapfrog_small

    d = 3
    lam, b, mean = _target(d, seed=9)
    n = 192  # not a lane multiple: exercises padding
    key = jax.random.PRNGKey(10)
    u = mean[None, :] + jax.random.normal(jax.random.fold_in(key, 0), (n, d))
    inv_mass = jnp.array([0.7, 1.3, 1.0])
    p = jax.random.normal(jax.random.fold_in(key, 1), (n, d)) / jnp.sqrt(
        inv_mass)
    eps = jnp.full((n,), 0.15)

    u_m, p_m = fused_leapfrog(u, p, eps, lam, b, inv_mass, 10,
                              interpret=True)
    u_v, p_v, h0, h1 = fused_leapfrog_small(u, p, eps, lam, b, inv_mass, 10,
                                            interpret=True)
    np.testing.assert_allclose(np.asarray(u_v), np.asarray(u_m),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(p_v), np.asarray(p_m),
                               rtol=1e-6, atol=1e-6)
    # Hamiltonians: -logp (up to const) + kinetic, vs host-side formula
    want_h0 = (0.5 * np.einsum("ni,ij,nj->n", np.asarray(u), np.asarray(lam),
                               np.asarray(u))
               - np.asarray(u) @ np.asarray(b)
               + 0.5 * np.sum(np.asarray(inv_mass) * np.asarray(p) ** 2, -1))
    np.testing.assert_allclose(np.asarray(h0), want_h0, rtol=1e-5, atol=1e-5)
    # energy drift over the trajectory is small at this step size
    assert np.abs(np.asarray(h1) - np.asarray(h0)).mean() < 0.5


def test_detect_quadratic_propagates_model_errors():
    """ADVICE r3 / VERDICT r3 #9: only jax concretization errors are
    swallowed by quadratic detection — a genuinely buggy log-density that
    raises ValueError must fail loudly, not silently fall back."""
    import pytest

    from modppl_tpu.inference.hmc import detect_quadratic_target

    def bad_logprob(u):
        raise ValueError("model bug")

    with pytest.raises(ValueError, match="model bug"):
        detect_quadratic_target(bad_logprob, 3)


def test_detect_quadratic_returns_none_under_trace():
    from modppl_tpu.inference.hmc import detect_quadratic_target

    lam = jnp.eye(3)

    @jax.jit
    def traced(b):
        # inside jit the logprob closes over a tracer -> concretization
        # error inside detection -> None -> generic fallback
        got = detect_quadratic_target(
            lambda u: -0.5 * u @ lam @ u + b @ u, 3)
        assert got is None
        return b

    traced(jnp.ones(3))


def test_fused_quadratic_rejects_axis_name():
    """ADVICE r3: the fused quadratic path has no cross-shard pooling, so
    combining it with axis_name must raise instead of silently producing
    shard-duplicated chains."""
    import pytest

    from modppl_tpu import Trie
    from modppl_tpu.inference.hmc import hmc_runner
    from modppl_tpu.models.illcond_gauss import make_illcond_gauss

    model = make_illcond_gauss(8)
    with pytest.raises(ValueError, match="axis_name"):
        hmc_runner(model, (), Trie(), num_chains=4,
                   use_fused_quadratic=True, axis_name="dp")


def test_sample_chunk_matches_single_transitions():
    """hmc_sample_chunk_small replays the SAME randoms through the
    single-transition kernel: trajectories and logps bitwise-equal
    (accept probs may drift 1 ulp across the two programs)."""
    from modppl_tpu.ops.leapfrog_vpu_pallas import (
        hmc_sample_chunk_small,
        hmc_transition_small,
    )

    d, n, T, L = 3, 256, 5, 4
    key = jax.random.PRNGKey(0)
    lam, b, _ = _target(d)
    im = jnp.linspace(0.5, 1.5, d)
    u0 = jax.random.normal(jax.random.fold_in(key, 1), (n, d))
    eps0 = jnp.asarray(0.05, u0.dtype)
    us, logps, aprobs, divs, uf = hmc_sample_chunk_small(
        jax.random.fold_in(key, 2), u0, eps0, lam, b, im,
        T, L, interpret=True)

    k_mom, k_jit, k_acc = jax.random.split(jax.random.fold_in(key, 2), 3)
    mom = jax.random.normal(k_mom, (T, n, d)) / jnp.sqrt(im)[None, None, :]
    epsj = eps0 * jax.random.uniform(k_jit, (T, n, 1),
                                     minval=0.5, maxval=1.5)
    u01 = jax.random.uniform(k_acc, (T, n, 1))
    u = u0
    for t in range(T):
        (u, _), logp, ap, dv, _, _ = hmc_transition_small(
            u, mom[t], epsj[t, :, 0], u01[t, :, 0], lam, b, im, L,
            interpret=True)
        np.testing.assert_array_equal(np.asarray(us[t]), np.asarray(u))
        np.testing.assert_array_equal(np.asarray(logps[t]),
                                      np.asarray(logp))
        np.testing.assert_allclose(np.asarray(aprobs[t]), np.asarray(ap),
                                   atol=1e-5)
    np.testing.assert_array_equal(np.asarray(uf), np.asarray(u))


def test_warmup_chunk_adapts_mass_and_step():
    """hmc_warmup_chunk_small (whole pooled warmup in one launch): the
    adapted inverse mass approaches the target's marginal precisions and
    the subsequent sampling chunk recovers the exact moments."""
    from modppl_tpu.ops.leapfrog_vpu_pallas import (
        hmc_sample_chunk_small,
        hmc_warmup_chunk_small,
    )

    cov = jnp.array([[1.0, 0.5, 0.2], [0.5, 2.0, 0.3], [0.2, 0.3, 0.5]])
    lam = jnp.linalg.inv(cov)
    mean = jnp.array([1.0, -0.5, 2.0])
    b = lam @ mean
    n = 512
    u0 = jax.random.normal(jax.random.PRNGKey(0), (n, 3))
    us, eps, im = hmc_warmup_chunk_small(
        jax.random.PRNGKey(1), u0, 0.1, lam, b, 200, 8, interpret=True)
    # round-5 mass-convention fix: im (= M^-1) is the VARIANCE estimate
    np.testing.assert_allclose(np.asarray(im), np.diag(cov), rtol=0.25)
    assert 0.05 < float(eps) < 5.0

    S, logps, aprobs, divs, _ = hmc_sample_chunk_small(
        jax.random.PRNGKey(2), us, eps, lam, b, im, 300, 8,
        interpret=True)
    samp = np.asarray(S).reshape(-1, 3)
    np.testing.assert_allclose(samp.mean(0), np.asarray(mean), atol=0.05)
    np.testing.assert_allclose(samp.var(0), np.diag(cov), rtol=0.1)
    assert 0.6 < float(np.asarray(aprobs).mean()) <= 1.0
    assert not bool(np.asarray(divs).any())


def test_mxu_chunked_hmc_recovers_moments():
    """hmc(use_fused_quadratic=True) at 7 <= d < 128 routes through the
    MXU whole-phase kernels (hmc_warmup_chunk + hmc_sample_chunk,
    interpret mode here): posterior moments of a correlated Gaussian are
    recovered and the adapted mass tracks the marginal precisions."""
    from modppl_tpu import Trie
    from modppl_tpu.inference.hmc import hmc
    from modppl_tpu.models.illcond_gauss import make_illcond_gauss, illcond_cov

    d = 8
    model = make_illcond_gauss(d, cond=50.0, seed=3)
    cov = np.asarray(illcond_cov(d, 50.0, 3), dtype=np.float64)
    out = hmc(jax.random.PRNGKey(0), model, (), Trie(),
              num_samples=400, num_warmup=150, num_chains=64,
              num_leapfrog=12, use_fused_quadratic=True)
    us = np.asarray(out["unconstrained"]).reshape(-1, d)
    np.testing.assert_allclose(us.mean(0), np.zeros(d), atol=0.05)
    np.testing.assert_allclose(us.var(0), np.diag(cov), rtol=0.15)
    assert 0.5 < float(np.asarray(out["accept_prob"]).mean()) <= 1.0


def test_fused_selfcheck_passes_on_true_quadratic():
    """The self-verification pass (VERDICT r4 #8): on a genuinely
    quadratic target the fused path's kernel log-densities agree with the
    generic log-joint up to a constant, so quad_check_ok is True."""
    from modppl_tpu import Trie, gen, normal
    from modppl_tpu.inference.hmc import hmc

    @gen
    def conjugate(h):
        mu = h.sample(normal, (0.0, 1.0), "mu")
        h.sample(normal, (mu, 0.5), "x")
        return mu

    obs = Trie.from_dict({"x": 1.0})
    out = hmc(jax.random.PRNGKey(0), conjugate, (), obs, num_samples=40,
              num_warmup=60, num_chains=8, use_fused_quadratic=True)
    assert bool(out["fused_quadratic"])
    assert bool(out["quad_check_ok"])
    assert float(out["quad_check_max_dev"]) < 1e-3


def test_fused_selfcheck_catches_wrong_dispatch(monkeypatch):
    """If detection hands the kernels a WRONG quadratic form (standing in
    for a target that is quadratic at the probes but not where the chains
    go), the run's re-scored draws disagree with the generic log-joint by
    a non-constant amount and the check flags it."""
    import importlib

    from modppl_tpu import Trie, gen, normal

    hmc_mod = importlib.import_module("modppl_tpu.inference.hmc")

    @gen
    def conjugate(h):
        mu = h.sample(normal, (0.0, 1.0), "mu")
        h.sample(normal, (mu, 0.5), "x")
        return mu

    real_detect = hmc_mod.detect_quadratic_target

    def wrong_detect(logprob_flat, dim, dtype=jnp.float32, **kw):
        quad = real_detect(logprob_flat, dim, dtype, **kw)
        assert quad is not None
        lam, b = quad
        return 2.5 * lam, b      # deliberately mismatched curvature

    monkeypatch.setattr(hmc_mod, "detect_quadratic_target", wrong_detect)
    obs = Trie.from_dict({"x": 1.0})
    out = hmc_mod.hmc(jax.random.PRNGKey(0), conjugate, (), obs,
                      num_samples=40, num_warmup=60, num_chains=8,
                      use_fused_quadratic=True)
    assert bool(out["fused_quadratic"])
    assert not bool(out["quad_check_ok"])
    assert float(out["quad_check_max_dev"]) > 1e-2


def test_zero_warmup_auto_dispatch_falls_back_to_generic():
    """ADVICE r4: auto-dispatch (use_fused_quadratic=None) with
    num_warmup=0 must transparently take the generic path (the warmup
    chunk kernel's grid cannot be zero-length) instead of raising — a
    pre-adapted zero-warmup run is valid."""
    from modppl_tpu import Trie, gen, normal
    from modppl_tpu.inference.hmc import hmc

    @gen
    def conjugate(h):
        mu = h.sample(normal, (0.0, 1.0), "mu")
        h.sample(normal, (mu, 0.5), "x")
        return mu

    obs = Trie.from_dict({"x": 1.0})
    out = hmc(jax.random.PRNGKey(0), conjugate, (), obs, num_samples=20,
              num_warmup=0, num_chains=4, step_size=0.3)
    assert not bool(out["fused_quadratic"])
    assert np.asarray(out["unconstrained"]).shape == (4, 20, 1)


def test_chunk_kernels_d10_extended_range():
    """Round-5 (VERDICT r4 #5): the packed chunk kernels now cover
    d in (7, MAX_DIM_VPU_CHUNK] via the generalized parameter tile —
    d=10 sampling matches an equivalent-randoms host replay and the
    whole-warmup kernel still adapts mass correctly."""
    from modppl_tpu.ops.leapfrog_vpu_pallas import (
        MAX_DIM_VPU_CHUNK,
        hmc_sample_chunk_small,
        hmc_warmup_chunk_small,
    )

    assert MAX_DIM_VPU_CHUNK >= 10
    d, n = 10, 256
    lam, b, mean = _target(d, seed=21)
    im = jnp.linspace(0.5, 1.5, d)
    key = jax.random.PRNGKey(3)
    u0 = jax.random.normal(jax.random.fold_in(key, 1), (n, d))

    # sampling chunk vs host replay of the same pre-drawn randoms
    T, L = 4, 3
    eps0 = jnp.asarray(0.05)
    us, logps, aprobs, divs, uf = hmc_sample_chunk_small(
        jax.random.fold_in(key, 2), u0, eps0, lam, b, im, T, L,
        interpret=True)
    k_mom, k_jit, k_acc = jax.random.split(jax.random.fold_in(key, 2), 3)
    mom = jax.random.normal(k_mom, (T, n, d)) / jnp.sqrt(im)[None, None, :]
    epsj = eps0 * jax.random.uniform(k_jit, (T, n, 1),
                                     minval=0.5, maxval=1.5)
    u01 = jax.random.uniform(k_acc, (T, n, 1))

    def host_transition(u, p, eps, u01v):
        logp0 = (u @ b - 0.5 * jnp.einsum("ni,ij,nj->n", u, lam, u))
        h0 = -logp0 + 0.5 * jnp.sum(im[None] * p * p, -1)
        g = b[None] - u @ lam.T
        uu, pp = u, p
        for _ in range(L):
            pp = pp + 0.5 * eps * g
            uu = uu + eps * im[None] * pp
            g = b[None] - uu @ lam.T
            pp = pp + 0.5 * eps * g
        logp1 = (uu @ b - 0.5 * jnp.einsum("ni,ij,nj->n", uu, lam, uu))
        h1 = -logp1 + 0.5 * jnp.sum(im[None] * pp * pp, -1)
        aprob = jnp.minimum(1.0, jnp.exp(jnp.minimum(h0 - h1, 0.0)))
        acc = u01v < aprob
        return jnp.where(acc[:, None], uu, u), jnp.where(acc, logp1, logp0)

    u = jnp.asarray(u0, jnp.float32)
    for t in range(T):
        u, logp = host_transition(u, mom[t].astype(jnp.float32),
                                  epsj[t].astype(jnp.float32),
                                  u01[t, :, 0].astype(jnp.float32))
        np.testing.assert_allclose(np.asarray(us[t]), np.asarray(u),
                                   rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(uf), np.asarray(u),
                               rtol=2e-4, atol=2e-4)

    # whole-warmup kernel at d=10: the metric approaches the marginal
    # VARIANCES (round-5 mass-convention fix)
    cov = jnp.linalg.inv(lam)
    us_w, eps, im_w = hmc_warmup_chunk_small(
        jax.random.PRNGKey(5), u0, 0.1, lam, b, 200, 6, interpret=True)
    np.testing.assert_allclose(np.asarray(im_w),
                               np.asarray(jnp.diagonal(cov)),
                               rtol=0.4)
    assert 0.01 < float(eps) < 5.0


def test_packed_mxu_chunk_matches_reference_replay():
    """Round-5 lane packing (G = 128//s chains per row, block-diagonal Λ —
    leapfrog_pallas._seg_width): hmc_sample_chunk replays the SAME
    pre-drawn randoms as a plain-JAX reference transition loop, so packed
    positions / logp / accept probabilities / divergences must agree
    elementwise across every group width s in {16, 32, 64, 128} and
    non-aligned chain counts."""
    from modppl_tpu.ops.leapfrog_pallas import hmc_sample_chunk

    rng = np.random.default_rng(0)

    def ref_sample_chunk(key, u, eps, lam, b, inv_mass, T, L):
        n, d = u.shape
        dt = u.dtype
        k_mom, k_jit, k_acc = jax.random.split(key, 3)
        mom = jax.random.normal(k_mom, (T, n, d), dt) \
            / jnp.sqrt(inv_mass.astype(dt))[None, None, :]
        epsj = eps * jax.random.uniform(k_jit, (T, n), dt,
                                        minval=0.5, maxval=1.5)
        u01 = jax.random.uniform(k_acc, (T, n), dt)

        def logp(u):
            return -0.5 * jnp.einsum('ni,ij,nj->n', u, lam, u) + u @ b

        us_all, lps, aps = [], [], []
        for t in range(T):
            p = mom[t]
            e = epsj[t][:, None]
            g = b - u @ lam
            h0 = -logp(u) + 0.5 * jnp.sum(inv_mass * p * p, -1)
            uu, pp, gg = u, p, g
            for _ in range(L):
                pp = pp + 0.5 * e * gg
                uu = uu + e * inv_mass * pp
                gg = b - uu @ lam
                pp = pp + 0.5 * e * gg
            h1 = -logp(uu) + 0.5 * jnp.sum(inv_mass * pp * pp, -1)
            dh = h0 - h1
            ap = jnp.minimum(1.0, jnp.exp(jnp.minimum(dh, 0.0)))
            acc = u01[t] < ap
            u = jnp.where(acc[:, None], uu, u)
            us_all.append(u)
            lps.append(logp(u))
            aps.append(ap)
        return jnp.stack(us_all), jnp.stack(lps), jnp.stack(aps)

    # (d, n) covering s = 16 / 32 / 64 / 128 with ragged chain counts
    for d, n in [(16, 24), (20, 10), (13, 37), (64, 9), (70, 5)]:
        A = rng.standard_normal((d, d)) * 0.3
        lam = jnp.asarray(A @ A.T + np.eye(d), jnp.float32)
        b = jnp.asarray(rng.standard_normal(d), jnp.float32)
        u0 = jnp.asarray(rng.standard_normal((n, d)) * 0.3, jnp.float32)
        im = jnp.asarray(1.0 + rng.random(d), jnp.float32)
        T, L = 4, 3
        key = jax.random.PRNGKey(42)
        us, lp, ap, dv = hmc_sample_chunk(key, u0, 0.1, lam, b, im, T, L,
                                          interpret=True)
        rus, rlp, rap = ref_sample_chunk(key, u0, 0.1, lam, b, im, T, L)
        np.testing.assert_allclose(np.asarray(us), np.asarray(rus),
                                   atol=2e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(lp), np.asarray(rlp),
                                   atol=2e-3, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(ap), np.asarray(rap),
                                   atol=2e-3)
        assert not np.asarray(dv).any()


def test_packed_mxu_warmup_adapts_metric():
    """Packed whole-warmup kernel (d = 24 -> s = 32, G = 4 chains/row):
    the cross-group-pooled Chan-Welford metric approaches the marginal
    VARIANCES (round-5 mass convention) and dual averaging settles eps in
    a healthy range."""
    from modppl_tpu.ops.leapfrog_pallas import hmc_warmup_chunk

    rng = np.random.default_rng(1)
    d, n = 24, 256
    var = np.geomspace(0.1, 10.0, d)
    lam = jnp.asarray(np.diag(1.0 / var), jnp.float32)
    b = jnp.zeros(d, jnp.float32)
    u0 = jnp.asarray(rng.standard_normal((n, d)) * np.sqrt(var),
                     jnp.float32)
    us, eps, im = hmc_warmup_chunk(jax.random.PRNGKey(7), u0, 0.5, lam, b,
                                   150, 8, interpret=True)
    assert us.shape == (n, d)
    assert 0.05 < float(eps) < 5.0
    ratio = np.asarray(im) / var
    assert 0.2 < ratio.min() and ratio.max() < 5.0


def test_packed_divergent_chain_does_not_poison_row():
    """Lane packing puts G chains in one matmul row; an overflowed (inf)
    chain must not nan-poison its co-packed neighbors (inf * 0 = nan
    against the block-diagonal zeros). The kernels sanitize matmul inputs
    and energy reductions, so every OTHER chain's trajectory is bitwise
    identical whether or not a neighbor diverges."""
    from modppl_tpu.ops.leapfrog_pallas import hmc_sample_chunk

    rng = np.random.default_rng(0)
    d, n = 20, 8  # s=32 -> G=4 chains per row; chains 0-3 share row 0
    A = rng.standard_normal((d, d)) * 0.2
    lam = jnp.asarray(A @ A.T + np.eye(d), jnp.float32)
    b = jnp.zeros(d, jnp.float32)
    im = jnp.ones(d, jnp.float32)
    u_ok = jnp.asarray(rng.standard_normal((n, d)) * 0.5, jnp.float32)
    u_bad = u_ok.at[0].set(1e20)  # chain 0's energy overflows f32
    key = jax.random.PRNGKey(3)
    T, L = 3, 4

    us_a, lp_a, ap_a, dv_a = hmc_sample_chunk(key, u_ok, 0.1, lam, b, im,
                                              T, L, interpret=True)
    us_b, lp_b, ap_b, dv_b = hmc_sample_chunk(key, u_bad, 0.1, lam, b, im,
                                              T, L, interpret=True)
    # the divergent chain is flagged and held at its (finite) start state
    assert bool(dv_b[:, 0].any())
    assert np.isfinite(np.asarray(us_b[:, 0])).all()
    # every other chain: bitwise identical to the all-healthy run
    np.testing.assert_array_equal(np.asarray(us_a[:, 1:]),
                                  np.asarray(us_b[:, 1:]))
    np.testing.assert_array_equal(np.asarray(lp_a[:, 1:]),
                                  np.asarray(lp_b[:, 1:]))
    np.testing.assert_array_equal(np.asarray(ap_a[:, 1:]),
                                  np.asarray(ap_b[:, 1:]))
    assert not np.asarray(dv_b[:, 1:]).any()
