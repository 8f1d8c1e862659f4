"""Parallel tempering (replica exchange) over vmapped HMC/MALA chains.

Extension beyond the reference (no counterpart; the reference's only MCMC is
single-chain MH, modppl/src/inference/mh.rs). K replicas per chain run at
inverse temperatures ``betas`` against the tempered posterior

    pi_beta(u)  propto  prior(u) * likelihood(u)^beta

interleaving within-replica HMC transitions with Metropolis swap proposals
between adjacent rungs. Swaps use the standard acceptance

    log alpha = (beta_i - beta_j) * (loglik(u_j) - loglik(u_i))

and alternate even/odd pairings each round (deterministic-even-odd scheme),
which is the lattice-neighbor pattern that maps onto ``ppermute`` when the
replica axis is sharded across a mesh. On a single chip the replica axis is
just a vmapped array axis and swaps are index shuffles.

The whole sampler — replicas x chains x iterations — is one XLA program:
``lax.scan`` over rounds, ``vmap`` over chains, replica axis vectorized.
"""

import jax
import jax.numpy as jnp

from modppl_tpu.inference.smc_sampler import (
    _tempered_hmc_move,
    _tempered_mala_move,
    make_tempered_logprobs,
)


def _swap_round(key, u, ll, betas, parity):
    """One even/odd swap sweep over the replica axis.

    u: (K, D) replicas; ll: (K,) cached loglik values; parity: 0 or 1.
    Returns swapped (u, ll, accept_mask).
    """
    K = u.shape[0]
    idx = jnp.arange(K)
    # partner of replica k in this parity round
    lower = (idx % 2 == parity) & (idx + 1 < K)
    partner = jnp.where(lower, idx + 1, jnp.where(
        (idx % 2 != parity) & (idx >= 1), idx - 1, idx))
    # acceptance decided by the lower member of each pair
    ll_p = ll[partner]
    log_alpha = (betas - betas[partner]) * (ll_p - ll)
    us = jax.random.uniform(key, (K,))
    # same uniform for both members of a pair: use the lower index's draw
    pair_lo = jnp.minimum(idx, partner)
    accept = jnp.log(us[pair_lo]) < log_alpha
    accept = accept & (partner != idx)
    src = jnp.where(accept, partner, idx)
    return u[src], ll[src], accept


def parallel_tempering(key, model, args, observed, *,
                       betas=None, num_replicas=8, num_chains=1,
                       num_rounds=500, moves_per_round=1, move="hmc",
                       step_size=0.1, num_leapfrog=8, selection=None,
                       record_all_replicas=False):
    """Run replica-exchange MCMC; returns cold-chain (beta=1) samples.

    betas: increasing inverse temperatures ending at 1.0 (default: geometric
    ladder over num_replicas rungs). Samples: {addr: (chains, rounds, ...)}
    from the cold replica (plus all replicas if record_all_replicas).
    """
    if betas is None:
        betas = jnp.geomspace(0.05, 1.0, num_replicas)
    betas = jnp.asarray(betas)
    K = betas.shape[0]

    k_tr, k_init, k_run = jax.random.split(key, 3)
    init_trace, _ = model.generate(k_tr, args, observed)
    logprior, loglik, u0_flat, unravel, constrain = make_tempered_logprobs(
        model, args, init_trace, observed, selection)

    def logdens_at(beta):
        return lambda ui: logprior(ui) + beta * loglik(ui)

    loglik_v = jax.vmap(loglik)

    def chain(k, u0):
        """One PT chain: u0 (K, D) replicas."""

        def round_body(carry, inp):
            u, parity = carry
            k_round = inp
            k_move, k_swap = jax.random.split(k_round)
            # within-replica moves, one (vectorized) per rung
            def move_rung(km, u_k, beta):
                logdens = logdens_at(beta)
                grad = jax.grad(logdens)
                u_k = u_k[None]
                for m in range(moves_per_round):
                    kmm = jax.random.fold_in(km, m)
                    if move == "hmc":
                        u_k, acc = _tempered_hmc_move(
                            kmm, u_k, logdens, grad, step_size, num_leapfrog)
                    else:
                        u_k, acc = _tempered_mala_move(
                            kmm, u_k, logdens, grad, step_size)
                return u_k[0], acc[0]

            move_keys = jax.random.split(k_move, K)
            u, move_acc = jax.vmap(move_rung)(move_keys, u, betas)
            # swap sweep
            ll = loglik_v(u)
            u, ll, swap_acc = _swap_round(k_swap, u, ll, betas, parity)
            out = (u if record_all_replicas else u[-1],
                   move_acc, swap_acc)
            return (u, 1 - parity), out

        round_keys = jax.random.split(k, num_rounds)
        (u, _), (us, move_acc, swap_acc) = jax.lax.scan(
            round_body, (u0, jnp.zeros((), jnp.int32)), round_keys)
        return us, move_acc, swap_acc

    # init: replicas jittered around the generate trace's latents
    D = u0_flat.shape[0]
    init_keys = jax.random.split(k_init, num_chains)
    u0s = jax.vmap(lambda kk: u0_flat[None, :] + 0.5 * jax.random.normal(
        kk, (K, D), u0_flat.dtype))(init_keys)

    chain_keys = jax.random.split(k_run, num_chains)
    us, move_acc, swap_acc = jax.vmap(chain)(chain_keys, u0s)

    if record_all_replicas:
        samples = jax.vmap(jax.vmap(jax.vmap(constrain)))(us)
    else:
        samples = jax.vmap(jax.vmap(constrain))(us)
    return {
        "samples": samples,
        "unconstrained": us,
        "move_accept": move_acc,
        "swap_accept": swap_acc,
        "betas": betas,
    }
