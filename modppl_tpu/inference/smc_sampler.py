"""Tempered SMC sampler (annealed importance sampling with rejuvenation).

Extension beyond the reference (which implements only the state-space
particle filter, modppl/src/inference/particle_filter.rs): a Del
Moral-Doucet-Jasra SMC sampler over a *static* model, moving N particles
from the prior to the posterior through a likelihood-tempering ladder

    pi_beta(u)  propto  prior(u) * likelihood(u)^beta,   0 = b0 < ... < bK = 1

with importance reweighting between rungs, systematic resampling on ESS
decay, and HMC (or MALA) rejuvenation moves at each rung. Produces both
posterior samples and an unbiased log-marginal-likelihood estimate — the
static-model counterpart of ``ParticleSystem.log_marginal_likelihood``.

Everything is one XLA program: particles are a (N, D) array in
unconstrained space (bijectors from inference/transforms.py), the ladder is
a ``lax.scan``, resampling is the same systematic kernel as the particle
filter (parallel/resample.py), and moves are vmapped HMC transitions. The
particle axis shards over the device mesh like any other particle system.

GFI decomposition used (model-agnostic): with latent choices ``u`` and
observations ``obs``,

    logprior(u)  = generate(args, latents(u)).weight      (only latents
                   constrained — the weight is the prior density of u)
    logjoint(u)  = generate(args, latents(u) + obs).weight
    loglik(u)    = logjoint(u) - logprior(u)

both differentiable, so tempered gradients need no per-model code.
"""

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from modppl_tpu.inference.hmc import latent_bijectors
from modppl_tpu.parallel.resample import RESAMPLERS
from modppl_tpu.utils import effective_sample_size_from_log_weights, logsumexp


def make_tempered_logprobs(model, args, trace, observed, selection=None):
    """Build (logprior, loglik, u0_flat, unravel, constrain) over flat u."""
    bijectors = latent_bijectors(trace, observed, selection)
    u0 = {addr: bijectors[addr].inverse(trace.data.read(addr))
          for addr in bijectors}
    u0_flat, unravel = ravel_pytree(u0)

    def latent_constraints(u):
        from modppl_tpu.core.trie import Trie
        t = Trie()
        ldj = 0.0
        for addr, bij in bijectors.items():
            t.observe(addr, bij.forward(u[addr]))
            ldj = ldj + bij.log_det_jacobian(u[addr])
        return t, ldj

    def logprior_flat(u_flat):
        u = unravel(u_flat)
        t, ldj = latent_constraints(u)
        # placeholder key: assess on a FULLY-constrained trie consumes no
        # randomness (every address scores its given value), so any key
        # yields the same weight
        w = model.assess(jax.random.PRNGKey(0), args, t)
        return w + ldj

    def logjoint_flat(u_flat):
        u = unravel(u_flat)
        t, ldj = latent_constraints(u)
        t.merge(observed.copy())
        # placeholder key: fully constrained, no randomness consumed
        w = model.assess(jax.random.PRNGKey(0), args, t)
        return w + ldj

    def loglik_flat(u_flat):
        return logjoint_flat(u_flat) - logprior_flat(u_flat)

    def constrain(u_flat):
        u = unravel(u_flat)
        return {addr: bijectors[addr].forward(u[addr]) for addr in bijectors}

    return logprior_flat, loglik_flat, u0_flat, unravel, constrain


def _tempered_hmc_move(key, u, logdens, grad_logdens, eps, num_leapfrog):
    """One vmapped HMC transition targeting `logdens` (no adaptation)."""

    def one(k, ui):
        k_mom, k_acc = jax.random.split(k)
        p0 = jax.random.normal(k_mom, ui.shape, ui.dtype)

        def leap(carry, _):
            q, p, g = carry
            p = p + 0.5 * eps * g
            q = q + eps * p
            g = grad_logdens(q)
            p = p + 0.5 * eps * g
            return (q, p, g), None

        g0 = grad_logdens(ui)
        (q, p, _), _ = jax.lax.scan(leap, (ui, p0, g0), None,
                                    length=num_leapfrog)
        h0 = -logdens(ui) + 0.5 * jnp.sum(p0 * p0)
        h1 = -logdens(q) + 0.5 * jnp.sum(p * p)
        delta = h0 - h1
        accept = jnp.log(jax.random.uniform(k_acc, ())) < delta
        return jnp.where(accept, q, ui), accept

    keys = jax.random.split(key, u.shape[0])
    return jax.vmap(one)(keys, u)


def _tempered_mala_move(key, u, logdens, grad_logdens, eps):
    """One vmapped MALA (Langevin) transition targeting `logdens`."""

    def one(k, ui):
        k_noise, k_acc = jax.random.split(k)
        g = grad_logdens(ui)
        noise = jax.random.normal(k_noise, ui.shape, ui.dtype)
        prop = ui + 0.5 * eps * eps * g + eps * noise
        g_prop = grad_logdens(prop)
        # q(u | prop) / q(prop | u)
        fwd = -jnp.sum((prop - ui - 0.5 * eps * eps * g) ** 2) / (2 * eps * eps)
        bwd = -jnp.sum((ui - prop - 0.5 * eps * eps * g_prop) ** 2) / (2 * eps * eps)
        alpha = logdens(prop) - logdens(ui) + bwd - fwd
        accept = jnp.log(jax.random.uniform(k_acc, ())) < alpha
        return jnp.where(accept, prop, ui), accept

    keys = jax.random.split(key, u.shape[0])
    return jax.vmap(one)(keys, u)


def smc_sampler(key, model, args, observed, *, num_particles,
                num_temps=20, betas=None, num_moves=2, move="hmc",
                step_size=0.1, num_leapfrog=8, ess_threshold=0.5,
                resampling="systematic", selection=None):
    """Run the tempered SMC sampler; one compiled XLA program.

    Args:
      observed: constraint Trie of observations.
      num_temps: rungs in the (cosine-spaced) default ladder; ignored if
        `betas` (an increasing array ending at 1.0, starting > 0) is given.
      num_moves: rejuvenation transitions per rung.
      move: 'hmc' | 'mala'.
      ess_threshold: resample when ESS < threshold * N.

    Returns dict: particles {addr: (N, ...)} (posterior draws at beta=1),
    log_ml (log marginal likelihood estimate), ess (per rung), accept_rate
    (per rung), log_weights (final).
    """
    if betas is None:
        # cosine schedule: dense near 0 where the likelihood bites hardest
        ts = jnp.linspace(0.0, 1.0, num_temps + 1)[1:]
        betas = (1.0 - jnp.cos(ts * jnp.pi / 2)) ** 2
        betas = betas / betas[-1]
    betas = jnp.asarray(betas)

    k_init, k_tr, k_scan = jax.random.split(key, 3)
    init_trace, _ = model.generate(k_tr, args, observed)
    logprior, loglik, u0_flat, unravel, constrain = make_tempered_logprobs(
        model, args, init_trace, observed, selection)

    # N prior draws: vmapped simulate, latents pulled through the bijectors
    def prior_draw(k):
        tr = model.simulate(k, args)
        bij = latent_bijectors(tr, observed, selection)
        u = {addr: bij[addr].inverse(tr.data.read(addr)) for addr in bij}
        return ravel_pytree(u)[0]

    u = jax.vmap(prior_draw)(jax.random.split(k_init, num_particles))

    resampler = RESAMPLERS[resampling]
    loglik_v = jax.vmap(loglik)

    def rung(carry, inp):
        u, lw, log_ml, beta_prev = carry
        beta, k = inp
        k_res, k_move = jax.random.split(k)
        # reweight: pi_beta / pi_beta_prev = lik^(beta - beta_prev)
        ll = loglik_v(u)
        lw = lw + (beta - beta_prev) * ll
        # resample on ESS decay
        log_total = logsumexp(lw)
        log_norm = lw - log_total
        ess = effective_sample_size_from_log_weights(log_norm)

        def do_resample(_):
            parents = resampler(k_res, log_norm)
            return (jnp.take(u, parents, axis=0), jnp.zeros_like(lw),
                    log_ml + log_total - jnp.log(float(num_particles)))

        def keep(_):
            return u, lw, log_ml

        u2, lw2, log_ml2 = jax.lax.cond(
            ess < ess_threshold * num_particles, do_resample, keep, None)

        # rejuvenate under pi_beta
        def logdens(ui):
            return logprior(ui) + beta * loglik(ui)

        grad_logdens = jax.grad(logdens)
        accepts = jnp.zeros(())
        for m in range(num_moves):
            km = jax.random.fold_in(k_move, m)
            if move == "hmc":
                u2, acc = _tempered_hmc_move(km, u2, logdens, grad_logdens,
                                             step_size, num_leapfrog)
            elif move == "mala":
                u2, acc = _tempered_mala_move(km, u2, logdens, grad_logdens,
                                              step_size)
            else:
                raise ValueError(f"smc_sampler: unknown move {move!r}")
            accepts = accepts + jnp.mean(acc.astype(lw.dtype))
        acc_rate = accepts / max(num_moves, 1)
        return (u2, lw2, log_ml2, beta), (ess, acc_rate)

    keys = jax.random.split(k_scan, betas.shape[0])
    lw0 = jnp.zeros(num_particles, u.dtype)
    (u, lw, log_ml, _), (ess_hist, acc_hist) = jax.lax.scan(
        rung, (u, lw0, jnp.zeros((), u.dtype), jnp.zeros((), u.dtype)),
        (betas, keys))

    log_ml = log_ml + logsumexp(lw) - jnp.log(float(num_particles))
    particles = jax.vmap(constrain)(u)
    return {
        "particles": particles,
        "unconstrained": u,
        "log_weights": lw - logsumexp(lw),
        "log_ml": log_ml,
        "ess": ess_hist,
        "accept_rate": acc_hist,
        "betas": betas,
    }


def adaptive_smc_sampler(key, model, args, observed, *, num_particles,
                         target_ess=0.9, max_temps=100, num_moves=2,
                         move="hmc", step_size=0.1, num_leapfrog=8,
                         ess_threshold=0.5, resampling="systematic",
                         selection=None, bisect_iters=30):
    """Tempered SMC with an ESS-adapted temperature ladder.

    Instead of a fixed schedule, each rung's increment ``delta`` is chosen
    by bisection so that the ESS of the would-be reweighted particles is
    ``target_ess * N`` (Jasra et al. adaptive tempering) — dense rungs where
    the likelihood bites, coarse elsewhere. The whole sampler, including
    the scalar bisection (a fori_loop) and the outer temperature loop (a
    while_loop bounded by ``max_temps``), is one XLA program.

    Returns the same dict as :func:`smc_sampler` plus ``num_temps`` (rungs
    actually used); ``betas``/``ess``/``accept_rate`` are (max_temps,)
    buffers valid up to that count (NaN-padded beyond it).
    """
    k_init, k_tr, k_loop = jax.random.split(key, 3)
    init_trace, _ = model.generate(k_tr, args, observed)
    logprior, loglik, u0_flat, unravel, constrain = make_tempered_logprobs(
        model, args, init_trace, observed, selection)

    def prior_draw(k):
        tr = model.simulate(k, args)
        bij = latent_bijectors(tr, observed, selection)
        u = {addr: bij[addr].inverse(tr.data.read(addr)) for addr in bij}
        return ravel_pytree(u)[0]

    u = jax.vmap(prior_draw)(jax.random.split(k_init, num_particles))
    resampler = RESAMPLERS[resampling]
    loglik_v = jax.vmap(loglik)
    fdtype = u.dtype
    logn = jnp.log(float(num_particles))

    def ess_of(lw):
        return effective_sample_size_from_log_weights(lw - logsumexp(lw))

    def pick_delta(lw, ll, beta):
        """Largest delta <= 1 - beta keeping ESS >= target * current ESS.

        The target is *relative* to the pre-reweight ESS (Jasra et al.):
        an absolute target stalls — once ESS ~ target*N, every delta > 0
        violates it and beta never reaches 1.
        """
        hi0 = 1.0 - beta
        floor = target_ess * ess_of(lw)

        def full_ok(_):
            return hi0

        def bisect(_):
            def body(i, bounds):
                lo, hi = bounds
                mid = 0.5 * (lo + hi)
                ok = ess_of(lw + mid * ll) >= floor
                return (jnp.where(ok, mid, lo), jnp.where(ok, hi, mid))

            lo, hi = jax.lax.fori_loop(
                0, bisect_iters, body,
                (jnp.zeros((), fdtype), hi0))
            # lo is the certified-feasible end; never step zero
            return jnp.maximum(lo, hi0 * 1e-6)

        return jax.lax.cond(
            ess_of(lw + hi0 * ll) >= floor, full_ok, bisect, None)

    def cond_fn(carry):
        u, lw, log_ml, beta, t, k, betas_h, ess_h, acc_h = carry
        return (beta < 1.0) & (t < max_temps)

    def body_fn(carry):
        u, lw, log_ml, beta, t, k, betas_h, ess_h, acc_h = carry
        k, k_res, k_move = jax.random.split(k, 3)
        ll = loglik_v(u)
        delta = pick_delta(lw, ll, beta)
        beta_new = beta + delta
        lw = lw + delta * ll

        log_total = logsumexp(lw)
        log_norm = lw - log_total
        ess = effective_sample_size_from_log_weights(log_norm)

        def do_resample(_):
            parents = resampler(k_res, log_norm)
            return (jnp.take(u, parents, axis=0), jnp.zeros_like(lw),
                    log_ml + log_total - logn)

        def keep(_):
            return u, lw, log_ml

        u2, lw2, log_ml2 = jax.lax.cond(
            ess < ess_threshold * num_particles, do_resample, keep, None)

        def logdens(ui):
            return logprior(ui) + beta_new * loglik(ui)

        grad_logdens = jax.grad(logdens)
        accepts = jnp.zeros((), fdtype)
        for m in range(num_moves):
            km = jax.random.fold_in(k_move, m)
            if move == "hmc":
                u2, acc = _tempered_hmc_move(km, u2, logdens, grad_logdens,
                                             step_size, num_leapfrog)
            elif move == "mala":
                u2, acc = _tempered_mala_move(km, u2, logdens, grad_logdens,
                                              step_size)
            else:
                raise ValueError(f"adaptive_smc_sampler: unknown move {move!r}")
            accepts = accepts + jnp.mean(acc.astype(fdtype))

        betas_h = betas_h.at[t].set(beta_new)
        ess_h = ess_h.at[t].set(ess)
        acc_h = acc_h.at[t].set(accepts / max(num_moves, 1))
        return (u2, lw2, log_ml2, beta_new, t + 1, k, betas_h, ess_h, acc_h)

    nan = jnp.full((max_temps,), jnp.nan, fdtype)
    carry = (u, jnp.zeros(num_particles, fdtype), jnp.zeros((), fdtype),
             jnp.zeros((), fdtype), jnp.zeros((), jnp.int32), k_loop,
             nan, nan, nan)
    u, lw, log_ml, beta, t, _, betas_h, ess_h, acc_h = jax.lax.while_loop(
        cond_fn, body_fn, carry)

    log_ml = log_ml + logsumexp(lw) - logn
    particles = jax.vmap(constrain)(u)
    return {
        "particles": particles,
        "unconstrained": u,
        "log_weights": lw - logsumexp(lw),
        "log_ml": log_ml,
        "ess": ess_h,
        "accept_rate": acc_h,
        "betas": betas_h,
        "num_temps": t,
    }
