"""No-U-Turn Sampler: iterative tree doubling, XLA-compatible.

Extension target beyond the reference (BASELINE.json north star). This is
the multinomial-NUTS variant (progressive biased sampling over the
trajectory) built with the *iterative* tree construction: inside a depth-d
subtree the 2^d leapfrog leaves are visited left-to-right under a
``lax.while_loop``, with a checkpoint stack of at most ``max_depth`` states
for the sub-U-turn checks:

- an even leaf j is pushed at stack slot popcount(j);
- after an odd leaf i with t trailing one-bits, the completed binary
  subtrees are checked against stack slots [popcount(i-1)-t+1, popcount(i-1)].

Everything is fixed-shape (static ``max_depth``), so the transition jits,
vmaps over chains, and shards over the mesh exactly like the HMC kernel.
Warmup reuses the dual-averaging + Welford mass adaptation from
inference/hmc.py.
"""

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from modppl_tpu.inference.hmc import make_unconstrained_logprob

_DIVERGENCE = 1000.0


def _popcount(x):
    x = x - ((x >> 1) & 0x55555555)
    x = (x & 0x33333333) + ((x >> 2) & 0x33333333)
    x = (x + (x >> 4)) & 0x0F0F0F0F
    return (x * 0x01010101) >> 24


def _trailing_ones(x):
    return _popcount((x & ~(x + 1)))


def _is_turning(inv_mass, z_left, p_left, z_right, p_right, direction=1.0):
    """Hoffman-Gelman U-turn criterion with stored (time-oriented) momenta.

    For a subtree built in `direction`, (left, right) are (start, current)
    and dz must be re-oriented by the integration direction.
    """
    dz = (z_right - z_left) * direction
    return (jnp.dot(dz, inv_mass * p_left) < 0.0) | \
           (jnp.dot(dz, inv_mass * p_right) < 0.0)


def _leapfrog_once(grad_fn, z, p, g, eps, inv_mass, direction):
    e = eps * direction
    p = p + 0.5 * e * g
    z = z + e * inv_mass * p
    g = grad_fn(z)
    p = p + 0.5 * e * g
    return z, p, g


def nuts_transition(key, u, logp_fn, grad_fn, eps, inv_mass, max_depth=10):
    """One NUTS transition on flat coordinates.

    Returns (u', logp(u'), stats) with stats = dict(accept_prob, divergent,
    tree_depth, num_leapfrog).
    """
    dim = u.shape[0]
    dtype = u.dtype
    k_mom, k_loop = jax.random.split(key)
    p0 = jax.random.normal(k_mom, (dim,), dtype) / jnp.sqrt(inv_mass)
    logp0 = logp_fn(u)
    g0 = grad_fn(u)
    h0 = -logp0 + 0.5 * jnp.sum(inv_mass * p0 * p0)

    # tree state: edges (z, p, g) left/right, proposal, weights, momentum sum
    zeros = jnp.zeros((dim,), dtype)

    def energy(z, p):
        return -logp_fn(z) + 0.5 * jnp.sum(inv_mass * p * p)

    # checkpoint stacks for the iterative sub-u-turn checks
    ckpt_z = jnp.zeros((max_depth + 1, dim), dtype)
    ckpt_p = jnp.zeros((max_depth + 1, dim), dtype)

    def build_subtree(key, z, p, g, direction, depth):
        """Run 2^depth leapfrog leaves from (z,p,g) in `direction`.

        Returns (z_edge, p_edge, g_edge, proposal, logw_subtree, sum_p,
        turning, divergent, sum_accept_prob, n_leaves_done).
        """
        n_leaves = jnp.int32(1) << depth

        def cond(st):
            i = st["i"]
            return (i < n_leaves) & ~st["turning"] & ~st["divergent"]

        def body(st):
            i = st["i"]
            z, p, g = _leapfrog_once(
                grad_fn, st["z"], st["p"], st["g"], eps, inv_mass, direction)
            h = energy(z, p)
            logw = h0 - h
            divergent = ~jnp.isfinite(logw) | (logw < -_DIVERGENCE)
            # progressive multinomial proposal within the subtree
            log_sum_w = jnp.logaddexp(st["log_sum_w"], logw)
            k = jax.random.fold_in(st["key"], i)
            take = jnp.log(jax.random.uniform(k, (), dtype)) < logw - log_sum_w
            proposal = jnp.where(take, z, st["proposal"])
            prop_logp = jnp.where(take, -h + 0.5 * jnp.sum(inv_mass * p * p),
                                  st["prop_logp"])
            sum_accept = st["sum_accept"] + jnp.minimum(1.0, jnp.exp(logw))

            # checkpoint push for even leaves at slot popcount(i)
            slot = _popcount(i)
            is_even = (i % 2) == 0
            ckz = jnp.where(is_even,
                            st["ckpt_z"].at[slot].set(z), st["ckpt_z"])
            ckp = jnp.where(is_even,
                            st["ckpt_p"].at[slot].set(p), st["ckpt_p"])

            # sub-u-turn checks for odd leaves against the top t slots
            t = _trailing_ones(i)
            idx_max = _popcount(jnp.maximum(i - 1, 0))
            idx_min = idx_max - t + 1

            def check(m, turning):
                zs = ckz[m]
                ps = ckp[m]
                active = (m >= idx_min) & (m <= idx_max) & ((i % 2) == 1)
                turn = _is_turning(inv_mass, zs, ps, z, p, direction)
                return turning | (active & turn)

            turning = jax.lax.fori_loop(0, max_depth + 1, check, st["turning"])

            return {
                "i": i + 1, "key": st["key"], "z": z, "p": p, "g": g,
                "proposal": proposal, "prop_logp": prop_logp,
                "log_sum_w": log_sum_w, "sum_p": st["sum_p"] + p,
                "turning": turning, "divergent": st["divergent"] | divergent,
                "sum_accept": sum_accept, "ckpt_z": ckz, "ckpt_p": ckp,
            }

        st0 = {
            "i": jnp.int32(0), "key": key, "z": z, "p": p, "g": g,
            "proposal": z, "prop_logp": jnp.asarray(-jnp.inf, dtype),
            "log_sum_w": jnp.asarray(-jnp.inf, dtype),
            "sum_p": zeros, "turning": jnp.asarray(False),
            "divergent": jnp.asarray(False),
            "sum_accept": jnp.asarray(0.0, dtype),
            "ckpt_z": ckpt_z, "ckpt_p": ckpt_p,
        }
        st = jax.lax.while_loop(cond, body, st0)
        return st

    def outer_cond(st):
        return (st["depth"] < max_depth) & ~st["turning"] & ~st["divergent"]

    def outer_body(st):
        k_dir, k_sub, k_take, k_next = jax.random.split(st["key"], 4)
        direction = jnp.where(jax.random.bernoulli(k_dir), 1.0, -1.0).astype(dtype)
        go_right = direction > 0
        z_e = jnp.where(go_right, st["z_right"], st["z_left"])
        p_e = jnp.where(go_right, st["p_right"], st["p_left"])
        g_e = jnp.where(go_right, st["g_right"], st["g_left"])

        sub = build_subtree(k_sub, z_e, p_e, g_e, direction, st["depth"])

        # biased progressive sampling between tree and new subtree
        take = jnp.log(jax.random.uniform(k_take, (), dtype)) < \
            sub["log_sum_w"] - st["log_sum_w"]
        ok = ~sub["turning"] & ~sub["divergent"]
        proposal = jnp.where(ok & take, sub["proposal"], st["proposal"])
        prop_logp = jnp.where(ok & take, sub["prop_logp"], st["prop_logp"])
        log_sum_w = jnp.where(ok, jnp.logaddexp(st["log_sum_w"],
                                                sub["log_sum_w"]),
                              st["log_sum_w"])

        z_left = jnp.where(go_right, st["z_left"], sub["z"])
        p_left = jnp.where(go_right, st["p_left"], sub["p"])
        g_left = jnp.where(go_right, st["g_left"], sub["g"])
        z_right = jnp.where(go_right, sub["z"], st["z_right"])
        p_right = jnp.where(go_right, sub["p"], st["p_right"])
        g_right = jnp.where(go_right, sub["g"], st["g_right"])

        sum_p = st["sum_p"] + sub["sum_p"]
        turning = sub["turning"] | _is_turning(
            inv_mass, z_left, p_left, z_right, p_right)

        return {
            "key": k_next, "depth": st["depth"] + 1,
            "z_left": z_left, "p_left": p_left, "g_left": g_left,
            "z_right": z_right, "p_right": p_right, "g_right": g_right,
            "proposal": proposal, "prop_logp": prop_logp,
            "log_sum_w": log_sum_w, "sum_p": sum_p,
            "turning": turning, "divergent": st["divergent"] | sub["divergent"],
            "sum_accept": st["sum_accept"] + sub["sum_accept"],
            "n_leapfrog": st["n_leapfrog"] + sub["i"],
        }

    st0 = {
        "key": k_loop, "depth": jnp.int32(0),
        "z_left": u, "p_left": p0, "g_left": g0,
        "z_right": u, "p_right": p0, "g_right": g0,
        "proposal": u, "prop_logp": logp0,
        "log_sum_w": jnp.asarray(0.0, dtype),  # initial point: logw = h0-h0
        "sum_p": p0, "turning": jnp.asarray(False),
        "divergent": jnp.asarray(False),
        "sum_accept": jnp.asarray(0.0, dtype),
        "n_leapfrog": jnp.int32(0),
    }
    st = jax.lax.while_loop(outer_cond, outer_body, st0)

    u_new = st["proposal"]
    logp_new = st["prop_logp"]  # -H(z,p) + kinetic(p) == logp(z), tracked
    accept_prob = st["sum_accept"] / jnp.maximum(
        st["n_leapfrog"].astype(dtype), 1.0)
    stats = {
        "accept_prob": accept_prob,
        "divergent": st["divergent"],
        "tree_depth": st["depth"],
        "num_leapfrog": st["n_leapfrog"],
    }
    return u_new, logp_new, stats


def _nuts_chain(key, logprob, u0_flat, num_warmup, num_samples, eps0,
                max_depth, target_accept):
    from modppl_tpu.inference.adaptation import run_warmup

    grad = jax.grad(logprob)

    def transition(k, u, eps, inv_mass):
        return nuts_transition(k, u, logprob, grad, eps, inv_mass, max_depth)

    def warm_transition(k, u, eps, inv_mass):
        u, _, stats = transition(k, u, eps, inv_mass)
        return u, stats["accept_prob"]

    u, eps, inv_mass = run_warmup(
        jax.random.fold_in(key, 0), u0_flat, warm_transition, num_warmup,
        eps0, target_accept)

    def sample_body(u, k):
        u, logp, stats = transition(k, u, eps, inv_mass)
        return u, (u, logp, stats["accept_prob"], stats["divergent"],
                   stats["tree_depth"])

    _, (us, logps, aprobs, divs, depths) = jax.lax.scan(
        sample_body, u, jax.random.split(jax.random.fold_in(key, 2),
                                         num_samples))
    return us, logps, aprobs, divs, depths, eps


def _pooled_nuts_chains(key, logprob, u0s, num_warmup, num_samples, eps0,
                        max_depth, target_accept, axis_name=None):
    """All chains share ONE pooled-adapted (eps, inv_mass) — the NUTS
    counterpart of hmc._pooled_chains (SURVEY.md §2b item 5). Cross-shard
    pooling + bitwise layout invariance come from
    adaptation.run_warmup_pooled's fixed add-tree reductions."""
    from modppl_tpu.inference.adaptation import run_warmup_pooled

    grad = jax.grad(logprob)

    def transition(k, u, eps, inv_mass):
        return nuts_transition(k, u, logprob, grad, eps, inv_mass, max_depth)

    def warm_transition(k, u, eps, inv_mass):
        u, _, stats = transition(k, u, eps, inv_mass)
        return u, stats["accept_prob"]

    us, eps, inv_mass = run_warmup_pooled(
        jax.random.fold_in(key, 0), u0s, warm_transition, num_warmup, eps0,
        target_accept, axis_name=axis_name)

    c_local = u0s.shape[0]
    if axis_name is None:
        gidx = jnp.arange(c_local)
    else:
        gidx = jax.lax.axis_index(axis_name) * c_local + jnp.arange(c_local)

    def sample_body(us_c, k):
        keys = jax.vmap(lambda i: jax.random.fold_in(k, i))(gidx)
        us_c, logps, stats = jax.vmap(
            lambda kk, uu: transition(kk, uu, eps, inv_mass))(keys, us_c)
        return us_c, (us_c, logps, stats["accept_prob"], stats["divergent"],
                      stats["tree_depth"])

    keys_s = jax.random.split(jax.random.fold_in(key, 2), num_samples)
    _, (us, logps, aprobs, divs, depths) = jax.lax.scan(sample_body, us,
                                                        keys_s)
    sw = lambda x: jnp.swapaxes(x, 0, 1)
    return sw(us), sw(logps), sw(aprobs), sw(divs), sw(depths), eps


def nuts_runner(model, args, observed, *, num_samples=1000, num_warmup=500,
                num_chains=1, step_size=0.1, max_depth=8, target_accept=0.8,
                selection=None, init_trace=None, pooled_adaptation=None,
                axis_name=None, setup_key=None):
    """Build a reusable COMPILED NUTS sampler: returns ``run(key) -> dict``.

    The NUTS counterpart of hmc.hmc_runner — setup happens once, eagerly;
    each ``run(key)`` is one jitted program (one-shot :func:`nuts` calls
    are tracing-dominated at scale).
    """
    if init_trace is None:
        init_trace, _ = model.generate(
            setup_key if setup_key is not None else jax.random.PRNGKey(0),
            args, observed)
    logprob, u0, bijectors, constrain = make_unconstrained_logprob(
        model, args, init_trace, observed, selection)
    u0_flat, unravel = ravel_pytree(u0)

    def logprob_flat(u_flat):
        return logprob(unravel(u_flat))

    if pooled_adaptation is None:
        pooled_adaptation = num_chains > 1

    def constrain_flat(u_flat):
        return constrain(unravel(u_flat))

    @jax.jit
    def run(k_run):
        chain_keys = jax.random.split(k_run, num_chains)
        jitter = jax.vmap(lambda k: 0.5 * jax.random.normal(
            k, u0_flat.shape, u0_flat.dtype))(chain_keys)
        u0s = u0_flat[None, :] + jitter

        if pooled_adaptation:
            us, logps, aprobs, divs, depths, eps = _pooled_nuts_chains(
                jax.random.fold_in(k_run, 0), logprob_flat, u0s, num_warmup,
                num_samples, step_size, max_depth, target_accept,
                axis_name=axis_name)
        else:
            def run_one(k, u0f):
                return _nuts_chain(k, logprob_flat, u0f, num_warmup,
                                   num_samples, step_size, max_depth,
                                   target_accept)

            us, logps, aprobs, divs, depths, eps = jax.vmap(run_one)(
                chain_keys, u0s)

        samples = jax.vmap(jax.vmap(constrain_flat))(us)
        return {
            "samples": samples,
            "logp": logps,
            "accept_prob": aprobs,
            "divergences": divs,
            "tree_depth": depths,
            "step_size": eps,
            "unconstrained": us,
        }

    return run


def nuts(key, model, args, observed, **config):
    """Adaptive NUTS over a model's unconstrained latents; vmapped chains.

    ``pooled_adaptation`` (default: on whenever num_chains > 1) shares one
    (eps, inv_mass) adapted from every chain's accept statistics and draws
    — see inference/hmc.hmc for the contract and determinism notes. For
    repeated invocations build the sampler once with :func:`nuts_runner`.
    """
    k_init, k_run = jax.random.split(key)
    run = nuts_runner(model, args, observed, setup_key=k_init, **config)
    return run(k_run)
