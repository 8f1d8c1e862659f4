"""Pallas TPU kernel: fused leapfrog integration + log-prob evaluation.

SURVEY.md §2a / §7.6 extension target: "Pallas kernel fusing leapfrog
integration with log-prob evaluation for the hot loop". The generic HMC path
(inference/hmc.py) evaluates ``grad(logjp)`` as a separate XLA computation
per leapfrog step, so positions/momenta round-trip through HBM ``L`` times
per transition. For the large family of targets whose log-density is
quadratic in the latents,

    logp(u) = -1/2 u^T Λ u + b^T u   (+ const),    grad = b − Λ u,

(Gaussian posteriors: all conjugate linear-Gaussian models, Laplace
approximations, and the mass-matrix-warmup phase of any smooth target) the
whole trajectory fits the MXU: this kernel keeps a block of chains' (u, p)
resident in VMEM across all ``L`` steps, computing each gradient as one
(chains × dim) · (dim × dim) matmul — zero HBM traffic between steps.

The chain batch is the kernel grid: rows are chains, so 10^4 chains is 79
grid steps of a (128, dim) block — no ``vmap`` needed, and the chain axis
shards over a device mesh like any other batched op.

Padding contract (handled by the wrapper): dim is padded to a lane multiple
with Λ, b, inv_mass, p all zero in the pad — padded coordinates then have
zero gradient and zero velocity, so they stay exactly 0 and contribute 0 to
energies.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_LANE = 128
_BC = 128  # chains per grid block


def _kernel(num_steps, u_ref, p_ref, eps_ref, lam_ref, b_ref, im_ref,
            uo_ref, po_ref):
    u = u_ref[...]                 # (BC, D)
    p = p_ref[...]                 # (BC, D)
    eps = eps_ref[...][:, :1]      # (BC, 1) per-chain step size
    lam = lam_ref[...]             # (D, D) precision
    b = b_ref[...]                 # (1, D)
    im = im_ref[...]               # (1, D) inverse mass diagonal

    def grad(u):
        # HIGHEST is load-bearing: the TPU default f32 dot is a single
        # mantissa-truncating bf16 pass; the Metropolis accept ratio is
        # computed from trajectories of these gradients, so default
        # precision would bias the chain's stationary distribution
        # (~0.1 nat logp error at d ~ 128)
        return b - jnp.dot(u, lam, preferred_element_type=u.dtype,
                           precision=jax.lax.Precision.HIGHEST)

    def body(_, carry):
        u, p, g = carry
        p = p + 0.5 * eps * g
        u = u + eps * im * p
        g = grad(u)
        p = p + 0.5 * eps * g
        return (u, p, g)

    u, p, _ = jax.lax.fori_loop(0, num_steps, body, (u, p, grad(u)))
    uo_ref[...] = u
    po_ref[...] = p


def _pad_to(x, n, axis):
    pad = n - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(jax.jit,
                   static_argnames=("num_steps", "interpret", "block_chains"))
def fused_leapfrog(u, p, eps, lam, b, inv_mass, num_steps, interpret=False,
                   block_chains=_BC):
    """Integrate ``num_steps`` leapfrog steps of the quadratic target.

    Args:
      u, p: (N, D) positions / momenta (rows = chains).
      eps: per-chain step sizes, shape (N,) (or scalar, broadcast).
      lam: (D, D) precision matrix Λ.
      b: (D,) linear coefficient (Λ·mean for a Gaussian N(mean, Λ⁻¹)).
      inv_mass: (D,) diagonal inverse mass.
      num_steps: static trajectory length L.
    Returns (u_L, p_L), each (N, D).
    """
    n, d = u.shape
    dt = u.dtype
    dp = -(-d // _LANE) * _LANE
    bc = min(block_chains, -(-n // 8) * 8)
    npad = -(-n // bc) * bc

    eps = jnp.broadcast_to(jnp.asarray(eps, dt).reshape(-1), (n,))
    u_p = _pad_to(_pad_to(u, npad, 0), dp, 1)
    p_p = _pad_to(_pad_to(p.astype(dt), npad, 0), dp, 1)
    eps_p = jnp.broadcast_to(_pad_to(eps, npad, 0)[:, None], (npad, _LANE))
    lam_p = _pad_to(_pad_to(lam.astype(dt), dp, 0), dp, 1)
    b_p = _pad_to(b.astype(dt)[None, :], dp, 1)
    im_p = _pad_to(inv_mass.astype(dt)[None, :], dp, 1)

    grid = (npad // bc,)
    row_block = lambda i: (i, 0)
    full = lambda i: (0, 0)
    uo, po = pl.pallas_call(
        functools.partial(_kernel, num_steps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bc, dp), row_block),      # u
            pl.BlockSpec((bc, dp), row_block),      # p
            pl.BlockSpec((bc, _LANE), row_block),   # eps
            pl.BlockSpec((dp, dp), full),           # lam
            pl.BlockSpec((1, dp), full),            # b
            pl.BlockSpec((1, dp), full),            # inv_mass
        ],
        out_specs=[pl.BlockSpec((bc, dp), row_block),
                   pl.BlockSpec((bc, dp), row_block)],
        out_shape=[jax.ShapeDtypeStruct((npad, dp), dt),
                   jax.ShapeDtypeStruct((npad, dp), dt)],
        interpret=interpret,
    )(u_p, p_p, eps_p, lam_p, b_p, im_p)
    return uo[:n, :d], po[:n, :d]


def quadratic_logp(u, lam, b):
    """logp(u) = -1/2 u^T Λ u + b^T u, batched over rows of u.

    Small dims use the broadcast-multiply-sum form: a (N, d) @ (d, d) dot
    over a huge batch pads the tiny contraction to MXU tiles
    (docs/performance.md rule 2); the elementwise form is pure VPU.
    """
    from modppl_tpu.ops.smalllinalg import SMALL_DIM_MAX, matvec_small

    if u.shape[-1] <= SMALL_DIM_MAX:
        return (-0.5 * jnp.sum(u * matvec_small(lam, u), axis=-1)
                + jnp.sum(u * b, axis=-1))
    # HIGHEST: the accept ratio is computed from this logp; the default
    # f32 dot's single bf16 pass would perturb the stationary distribution
    # by ~0.1+ nat at d >= 128 (one (N,d)@(d,d) at 6 passes is negligible)
    hi = jax.lax.Precision.HIGHEST
    return (-0.5 * jnp.sum(u * jnp.dot(u, lam, precision=hi), axis=-1)
            + jnp.dot(u, b, precision=hi))


def hmc_transition_quadratic(key, u, eps, lam, b, inv_mass, num_leapfrog,
                             interpret=False):
    """One batched HMC transition on the quadratic target via the fused
    kernel. Mirrors inference/hmc.py:hmc_transition (momentum refresh,
    Metropolis accept, divergence guard), but the whole chain batch is one
    pallas_call. Returns (u', logp(u'), accept_prob, divergent) per chain.

    Dispatch by dim: d <= 7 runs the chains-on-lanes VPU kernel
    (ops/leapfrog_vpu_pallas.py) which fuses the WHOLE transition —
    integration, Hamiltonians, Metropolis accept and selection — into one
    launch (the generic path's ~25 small kernels' launch overheads
    dominate at tiny per-chain work); larger d runs the MXU-tiled kernel
    here.
    """
    from modppl_tpu.ops.leapfrog_vpu_pallas import (
        MAX_DIM_VPU,
        hmc_transition_small,
    )

    k_mom, k_acc = jax.random.split(key)
    n, d = u.shape
    p0 = jax.random.normal(k_mom, (n, d), u.dtype) / jnp.sqrt(inv_mass)
    if d <= MAX_DIM_VPU:
        u01 = jax.random.uniform(k_acc, (n,), u.dtype)
        (u_out, _), logp_out, accept_prob, divergent, _, _ =             hmc_transition_small(u, p0, eps, u01, lam, b, inv_mass,
                                 num_leapfrog, interpret=interpret)
        return u_out, logp_out, accept_prob, divergent
    u1, p1 = fused_leapfrog(u, p0, eps, lam, b, inv_mass, num_leapfrog,
                            interpret=interpret)
    logp0 = quadratic_logp(u, lam, b)
    logp1 = quadratic_logp(u1, lam, b)
    h0 = -logp0 + 0.5 * jnp.sum(inv_mass * p0 * p0, axis=-1)
    h1 = -logp1 + 0.5 * jnp.sum(inv_mass * p1 * p1, axis=-1)
    delta_h = h0 - h1
    divergent = ~jnp.isfinite(delta_h) | (delta_h < -1000.0)
    accept_prob = jnp.where(divergent, 0.0, jnp.minimum(1.0, jnp.exp(delta_h)))
    accept = jax.random.uniform(k_acc, (n,), u.dtype) < accept_prob
    u_out = jnp.where(accept[:, None], u1, u)
    logp_out = jnp.where(accept, logp1, logp0)
    return u_out, logp_out, accept_prob, divergent


@functools.partial(jax.jit, static_argnames=(
    "num_samples", "num_leapfrog", "interpret"))
def hmc_quadratic(key, u0, lam, b, inv_mass, *, step_size, num_samples,
                  num_leapfrog, interpret=False):
    """Fixed-step-size HMC chain batch on the quadratic target: lax.scan of
    fused transitions. u0: (chains, dim). Returns dict with samples
    (num_samples, chains, dim), accept_prob, divergences."""
    n = u0.shape[0]
    eps = jnp.broadcast_to(jnp.asarray(step_size, u0.dtype), (n,))

    def body(carry, k):
        u = carry
        k_jit, k_tr = jax.random.split(k)
        # per-chain ±50% step-size jitter (see hmc.py:hmc_transition)
        e = eps * jax.random.uniform(k_jit, (n,), u0.dtype,
                                     minval=0.5, maxval=1.5)
        u, logp, aprob, div = hmc_transition_quadratic(
            k_tr, u, e, lam, b, inv_mass, num_leapfrog, interpret=interpret)
        return u, (u, logp, aprob, div)

    keys = jax.random.split(key, num_samples)
    _, (us, logps, aprobs, divs) = jax.lax.scan(body, u0, keys)
    return {"samples": us, "logp": logps, "accept_prob": aprobs,
            "divergences": divs}
