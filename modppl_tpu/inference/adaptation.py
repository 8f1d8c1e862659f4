"""Warmup adaptation: dual-averaging step size + windowed mass estimation.

Stan-style schedule shared by HMC and NUTS:

  [ fast: step size only | slow windows: 25, 50, 100, ... (mass) | fast ]

Each slow window accumulates a Welford variance estimate of the
unconstrained draws; at the window's end the diagonal inverse mass becomes
the regularized variance and dual averaging restarts around the current
step size. Doubling windows let early (badly-conditioned) estimates be
thrown away — this is what the naive two-phase scheme got wrong on stiff
targets (phase A barely moves, so its variance estimate is garbage).

The window structure is static Python; each window is one ``lax.scan``, so
the whole warmup still compiles into a single program per chain and vmaps
over chains.
"""

import jax
import jax.numpy as jnp

from modppl_tpu.inference.hmc import da_init, da_update


def warmup_schedule(num_warmup, init_buffer=None, term_buffer=None,
                    base_window=25):
    """Return (fast1, [slow window sizes], fast2) summing to num_warmup."""
    if num_warmup < 20:
        return num_warmup, [], 0
    fast1 = init_buffer if init_buffer is not None else max(num_warmup * 15 // 100, 10)
    fast2 = term_buffer if term_buffer is not None else max(num_warmup * 10 // 100, 10)
    slow_total = num_warmup - fast1 - fast2
    if slow_total <= 0:
        return num_warmup, [], 0
    windows = []
    w = base_window
    remaining = slow_total
    while remaining > 0:
        if remaining < 2 * w or remaining < base_window:
            windows.append(remaining)
            remaining = 0
        else:
            windows.append(w)
            remaining -= w
            w *= 2
    return fast1, windows, fast2


def run_warmup(key, u0, transition, num_warmup, eps0, target_accept=0.8):
    """Adapt (step size, diagonal inverse mass) for `transition`.

    transition(key, u, eps, inv_mass) -> (u, accept_prob).
    Returns (u, eps, inv_mass).
    """
    fast1, slow, fast2 = warmup_schedule(num_warmup)
    zeros = jnp.zeros_like(u0)
    inv_mass = jnp.ones_like(u0)

    def make_body(inv_mass, adapt_mass):
        def body(carry, k):
            u, da, mean, m2, n = carry
            eps = jnp.exp(da["log_eps"])
            u, aprob = transition(k, u, eps, inv_mass)
            da = da_update(da, aprob, target=target_accept)
            if adapt_mass:
                n = n + 1.0
                delta = u - mean
                mean = mean + delta / n
                m2 = m2 + delta * (u - mean)
            return (u, da, mean, m2, n), aprob

        return body

    def run_phase(phase_key, u, da, inv_mass, length, adapt_mass):
        carry = (u, da, zeros, zeros, jnp.zeros(()))
        keys = jax.random.split(phase_key, max(length, 1))
        carry, _ = jax.lax.scan(make_body(inv_mass, adapt_mass), carry, keys)
        return carry

    phase = 0
    u, da = u0, da_init(eps0)
    if fast1 > 0:
        u, da, *_ = run_phase(jax.random.fold_in(key, phase), u, da,
                              inv_mass, fast1, False)
        phase += 1
    for w in slow:
        u, da, mean, m2, n = run_phase(jax.random.fold_in(key, phase), u, da,
                                       inv_mass, w, True)
        phase += 1
        var = m2 / jnp.maximum(n - 1.0, 1.0)
        # regularize toward unit scale as Stan does (n/(n+5) shrinkage)
        shrink = n / (n + 5.0)
        var = shrink * var + (1.0 - shrink) * 1e-3
        inv_mass = 1.0 / jnp.clip(var, 1e-8, 1e8)
        # restart dual averaging around the current adapted step size
        da = da_init(jnp.exp(da["log_eps_bar"]))
    if fast2 > 0:
        u, da, *_ = run_phase(jax.random.fold_in(key, phase), u, da,
                              inv_mass, fast2, False)
    eps = jnp.exp(da["log_eps_bar"])
    return u, eps, inv_mass
