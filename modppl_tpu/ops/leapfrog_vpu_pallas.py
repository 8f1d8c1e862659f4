"""Pallas TPU kernel: fused small-dim HMC transitions on the VPU.

Companion to ops/leapfrog_pallas.py (the MXU-tiled kernel for dim >= 128).
For the small-d quadratic zoo — conjugate / linear-Gaussian targets with a
handful of latents — the MXU formulation wastes (128/d)^2 of every matmul,
and the generic XLA path pays per-KERNEL-LAUNCH overheads that dominate at
tiny per-chain work: the transition is ~25 small XLA kernels (draws,
leapfrog scan ops, energies, accept selects) of a few microseconds each
(measured 0.21-0.27 ms per 8-leapfrog transition at 10^4 chains, d=3, on
a v5e).

This kernel runs the ENTIRE transition minus the PRNG draws in ONE launch:
leapfrog integration, both Hamiltonians, the Metropolis accept and the
state/logp selection. Layout: chains on LANES, dims on SUBLANES — ``u``
is an (8, N) f32 block (rows 0..d-1 live, the rest zero-padded with zero
inverse mass so padded coordinates stay exactly 0). The gradient b - Λu
unrolls over the d^2 static entries of Λ (scalar reads from a VMEM params
tile broadcast onto (1, N) rows), so every op is an elementwise VPU op —
no MXU, no padding waste.

Cites SURVEY.md §2a extension row / §7.6 ("Pallas kernel fusing leapfrog
integration with log-prob evaluation for the hot loop").
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_SUB = 8          # sublane rows: d <= 7 state rows + padding
_LANE = 128
_BC = 4096        # chains per grid block

MAX_DIM_VPU = 7

# rows of the packed stats output
_ROW_LOGP, _ROW_APROB, _ROW_DIV, _ROW_H0, _ROW_H1 = 0, 1, 2, 3, 4


def _pad_lanes(x, n):
    pad = n - x.shape[-1]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[-1] = (0, pad)
    return jnp.pad(x, widths)


def _kernel(num_steps, d, u_ref, p_ref, eps_ref, u01_ref, par_ref,
            uo_ref, po_ref, st_ref):
    u0 = u_ref[...]                   # (8, BC)
    p = p_ref[...]
    eps = eps_ref[0:1, :]             # (1, BC) per-chain step size
    u01 = u01_ref[0:1, :]             # (1, BC) accept uniforms

    def lam(j, k):
        return par_ref[j, k]          # static-index scalar read

    def bvec(j):
        return par_ref[j, MAX_DIM_VPU]

    def im(j):
        return par_ref[j, MAX_DIM_VPU + 1]

    def row(x, j):
        return x[j: j + 1, :]         # (1, BC) static sublane slice

    def grad_rows(u):
        return [bvec(j) - sum(lam(j, k) * row(u, k) for k in range(d))
                for j in range(d)]

    def stack_rows(rows):
        return jnp.concatenate(
            rows + [jnp.zeros((_SUB - d, rows[0].shape[-1]),
                              rows[0].dtype)], axis=0)

    def logp_of(u):
        quad = sum(lam(j, k) * row(u, j) * row(u, k)
                   for j in range(d) for k in range(d))
        lin = sum(bvec(j) * row(u, j) for j in range(d))
        return lin - 0.5 * quad

    def kin_of(p):
        return 0.5 * sum(im(j) * row(p, j) * row(p, j) for j in range(d))

    logp0 = logp_of(u0)
    h0 = -logp0 + kin_of(p)

    u = u0
    g = stack_rows(grad_rows(u))
    for _ in range(num_steps):
        p = p + 0.5 * eps * g
        u_rows = [row(u, j) + eps * im(j) * row(p, j) for j in range(d)]
        u = stack_rows(u_rows)
        g = stack_rows(grad_rows(u))
        p = p + 0.5 * eps * g

    logp1 = logp_of(u)
    h1 = -logp1 + kin_of(p)
    delta_h = h0 - h1

    # Metropolis accept + divergence guard (inference/hmc.py:hmc_transition)
    divergent = jnp.logical_not(jnp.isfinite(delta_h)) | (delta_h < -1000.0)
    aprob = jnp.where(divergent, 0.0,
                      jnp.minimum(1.0, jnp.exp(jnp.minimum(delta_h, 0.0))))
    accept = u01 < aprob
    uo_ref[...] = jnp.where(accept, u, u0)
    po_ref[...] = p
    bc = u0.shape[-1]
    zeros = jnp.zeros((_SUB - 5, bc), u0.dtype)
    st_ref[...] = jnp.concatenate(
        [jnp.where(accept, logp1, logp0), aprob,
         divergent.astype(u0.dtype), h0, h1, zeros], axis=0)


@functools.partial(jax.jit,
                   static_argnames=("num_steps", "interpret", "block_chains"))
def hmc_transition_small(u, p, eps, u01, lam, b, inv_mass, num_steps,
                         interpret=False, block_chains=_BC):
    """One whole HMC transition (minus the PRNG draws) in one pallas_call.

    Args:
      u: (N, d) positions, d <= 7; p: (N, d) fresh momenta.
      eps: per-chain step sizes (N,) (or scalar); jitter applied by caller.
      u01: (N,) accept uniforms.
      lam: (d, d) precision; b: (d,); inv_mass: (d,) diagonal.
    Returns ((u_out, p_end) each (N, d), logp_out (N,), accept_prob (N,),
    divergent (N,), h0 (N,), h1 (N,)); u_out is post-accept, p_end the raw
    trajectory endpoint momentum (for tests).
    """
    n, d = u.shape
    dt = u.dtype
    assert d <= MAX_DIM_VPU, f"hmc_transition_small: d={d} > {MAX_DIM_VPU}"
    bc = min(block_chains, -(-n // _LANE) * _LANE)
    npad = -(-n // bc) * bc

    u8 = _pad_lanes(jnp.zeros((_SUB, n), dt).at[:d].set(u.T), npad)
    p8 = _pad_lanes(jnp.zeros((_SUB, n), dt).at[:d].set(p.T), npad)
    eps = jnp.broadcast_to(jnp.asarray(eps, dt).reshape(-1), (n,))
    eps8 = jnp.broadcast_to(_pad_lanes(eps[None, :], npad), (_SUB, npad))
    # padded lanes: u01 pad of 2.0 never accepts, keeping pads at u0 = 0
    u018 = jnp.broadcast_to(
        _pad_lanes(jnp.asarray(u01, dt)[None, :], npad)
        + jnp.where(jnp.arange(npad) < n, 0.0, 2.0).astype(dt)[None, :],
        (_SUB, npad))
    par = jnp.zeros((_SUB, _LANE), dt)
    par = par.at[:d, :d].set(lam.astype(dt))
    par = par.at[:d, MAX_DIM_VPU].set(b.astype(dt))
    par = par.at[:d, MAX_DIM_VPU + 1].set(inv_mass.astype(dt))

    grid = (npad // bc,)
    blk = lambda i: (0, i)
    full = lambda i: (0, 0)
    uo, po, st = pl.pallas_call(
        functools.partial(_kernel, num_steps, d),
        grid=grid,
        in_specs=[pl.BlockSpec((_SUB, bc), blk),
                  pl.BlockSpec((_SUB, bc), blk),
                  pl.BlockSpec((_SUB, bc), blk),
                  pl.BlockSpec((_SUB, bc), blk),
                  pl.BlockSpec((_SUB, _LANE), full)],
        out_specs=[pl.BlockSpec((_SUB, bc), blk),
                   pl.BlockSpec((_SUB, bc), blk),
                   pl.BlockSpec((_SUB, bc), blk)],
        out_shape=[jax.ShapeDtypeStruct((_SUB, npad), dt)] * 3,
        interpret=interpret,
    )(u8, p8, eps8, u018, par)
    return ((uo[:d, :n].T, po[:d, :n].T),
            st[_ROW_LOGP, :n], st[_ROW_APROB, :n], st[_ROW_DIV, :n] > 0.5,
            st[_ROW_H0, :n], st[_ROW_H1, :n])


def fused_leapfrog_small(u, p, eps, lam, b, inv_mass, num_steps,
                         interpret=False, block_chains=_BC):
    """Integration-only view (testing): returns (u_L, p_L, h0, h1).

    Runs the full-transition kernel with always-accepting uniforms so
    u_out IS the trajectory endpoint; production uses
    :func:`hmc_transition_small` directly.
    """
    n, _ = u.shape
    (uo, po), _, _, _, h0, h1 = hmc_transition_small(
        u, p, eps, jnp.full((n,), -1.0, u.dtype), lam, b, inv_mass,
        num_steps, interpret=interpret, block_chains=block_chains)
    return uo, po, h0, h1
