"""Pallas TPU kernel: fused small-dim HMC transitions on the VPU.

Companion to ops/leapfrog_pallas.py (the MXU-tiled kernel for dim >= 128).
For the small-d quadratic zoo — conjugate / linear-Gaussian targets with a
handful of latents — the MXU formulation wastes (128/d)^2 of every matmul,
and the generic XLA path pays per-KERNEL-LAUNCH overheads that dominate at
tiny per-chain work: the transition is ~25 small XLA kernels (draws,
leapfrog scan ops, energies, accept selects) of a few microseconds each
(measured 0.21-0.27 ms per 8-leapfrog transition at 10^4 chains, d=3, on
a v5e).

Three tiers, all elementwise VPU (gradients b - Λu unroll over the d^2
static entries of Λ as scalar reads from a VMEM params tile — no MXU, no
padding waste):

- `hmc_transition_small`: ONE whole transition per launch (leapfrog,
  Hamiltonians, Metropolis accept/selection). Layout: chains on lanes,
  dims on sublanes — (8, N) blocks with rows 0..d-1 live.
- `hmc_sample_chunk_small` (round 4): the ENTIRE sampling phase in one
  launch — grid over transitions, chain block in VMEM scratch.
- `hmc_warmup_chunk_small` (round 4): the ENTIRE pooled windowed warmup
  in one launch — dual-averaging scalars, Chan-Welford moments and the
  inverse mass in VMEM scratch, window resets on static grid indices.

The chunk kernels use the PACKED layout (`_transition_core_packed`):
coordinate j fills all 8 sublanes of rows [8j, 8j+8) of an (8d, N/8)
block, so every VPU op runs at full tile utilization (the (1, N) row
layout wastes 7/8) — measured 31.5 -> 20 ms for a 300+500-iteration run
at 10^4 chains, d=3 (docs/performance.md).

Cites SURVEY.md §2a extension row / §7.6 ("Pallas kernel fusing leapfrog
integration with log-prob evaluation for the hot loop").
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SUB = 8          # sublane rows: d <= 7 state rows + padding
_LANE = 128
_BC = 4096        # chains per grid block

MAX_DIM_VPU = 7
# chunk kernels (packed layout) support larger d: the round-5 parameter
# tile holds Λ at [:d, :d], b at column _COL_B and the inverse mass at
# _COL_IM, in ceil(d/8)*8 sublane rows — no structural wall until the
# d^2-term unrolled gradient blows up Mosaic compile time (measured
# acceptable through d = 12; docs/performance.md round-5 sweep).
MAX_DIM_VPU_CHUNK = 12
_COL_B, _COL_IM = _LANE - 2, _LANE - 1

# rows of the packed stats output
_ROW_LOGP, _ROW_APROB, _ROW_DIV, _ROW_H0, _ROW_H1 = 0, 1, 2, 3, 4


def _par_rows(d):
    return max(_SUB, -(-d // _SUB) * _SUB)


def _make_par(lam, b, inv_mass, dt):
    """Round-5 chunk-kernel parameter tile: Λ at [:d, :d], b at column
    _COL_B, inverse mass at _COL_IM (when given), ceil(d/8)*8 rows."""
    d = lam.shape[0]
    assert d <= _COL_B, d
    par = jnp.zeros((_par_rows(d), _LANE), dt)
    par = par.at[:d, :d].set(lam.astype(dt))
    par = par.at[:d, _COL_B].set(b.astype(dt))
    if inv_mass is not None:
        par = par.at[:d, _COL_IM].set(inv_mass.astype(dt))
    return par


def _pad_lanes(x, n):
    pad = n - x.shape[-1]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[-1] = (0, pad)
    return jnp.pad(x, widths)


def _transition_core(num_steps, d, u0, p, eps, u01, par_ref, im_fn=None):
    """One HMC transition on (8, BC) blocks — shared by the single-
    transition kernel and the chunked samplers. Returns
    (u_out, p_end, logp_out, aprob, divergent, h0, h1), each (·, BC).
    ``im_fn(j)`` overrides the inverse-mass read (the warmup kernel keeps
    an evolving inverse mass in scratch)."""

    def lam(j, k):
        return par_ref[j, k]          # static-index scalar read

    def bvec(j):
        return par_ref[j, MAX_DIM_VPU]

    im = im_fn if im_fn is not None else (
        lambda j: par_ref[j, MAX_DIM_VPU + 1])

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
    u_out = jnp.where(accept, u, u0)
    logp_out = jnp.where(accept, logp1, logp0)
    return u_out, p, logp_out, aprob, divergent, h0, h1


def _kernel(num_steps, d, u_ref, p_ref, eps_ref, u01_ref, par_ref,
            uo_ref, po_ref, st_ref):
    u0 = u_ref[...]                   # (8, BC)
    u_out, p, logp_out, aprob, divergent, h0, h1 = _transition_core(
        num_steps, d, u0, p_ref[...], eps_ref[0:1, :], u01_ref[0:1, :],
        par_ref)
    uo_ref[...] = u_out
    po_ref[...] = p
    bc = u0.shape[-1]
    zeros = jnp.zeros((_SUB - 5, bc), u0.dtype)
    st_ref[...] = jnp.concatenate(
        [logp_out, aprob, divergent.astype(u0.dtype), h0, h1, zeros],
        axis=0)


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


def _transition_core_packed(num_steps, d, u0, p, eps, u01, par_ref,
                            im_fn=None):
    """_transition_core in the PACKED layout: chains fill all 8 sublanes —
    coordinate j occupies rows [8j, 8j+8) of an (8d, W) block (W = N/8),
    so every VPU op runs at full tile utilization instead of 1/8 on
    (1, N) rows. Per-chain math is identical; eps/u01 and all returned
    per-chain quantities are (8, W) tiles."""

    def lam(j, k):
        return par_ref[j, k]

    def bvec(j):
        return par_ref[j, _COL_B]

    im = im_fn if im_fn is not None else (
        lambda j: par_ref[j, _COL_IM])

    def row(x, j):
        return x[8 * j: 8 * (j + 1), :]   # (8, W) coordinate slab

    def grad_rows(u):
        return [bvec(j) - sum(lam(j, k) * row(u, k) for k in range(d))
                for j in range(d)]

    def stack_rows(rows):
        return jnp.concatenate(rows, axis=0)

    def logp_of(u):
        quad = sum(lam(j, k) * row(u, j) * row(u, k)
                   for j in range(d) for k in range(d))
        lin = sum(bvec(j) * row(u, j) for j in range(d))
        return lin - 0.5 * quad

    def kin_of(p):
        return 0.5 * sum(im(j) * row(p, j) * row(p, j) for j in range(d))

    logp0 = logp_of(u0)
    h0 = -logp0 + kin_of(p)

    # eps is an (8, W) per-chain tile; full-block ops need it repeated
    # over the d coordinate slabs
    eps_full = jnp.concatenate([eps] * d, axis=0)

    u = u0
    g = stack_rows(grad_rows(u))
    for _ in range(num_steps):
        p = p + 0.5 * eps_full * g
        u_rows = [row(u, j) + eps * im(j) * row(p, j) for j in range(d)]
        u = stack_rows(u_rows)
        g = stack_rows(grad_rows(u))
        p = p + 0.5 * eps_full * g

    logp1 = logp_of(u)
    h1 = -logp1 + kin_of(p)
    delta_h = h0 - h1
    divergent = jnp.logical_not(jnp.isfinite(delta_h)) | (delta_h < -1000.0)
    aprob = jnp.where(divergent, 0.0,
                      jnp.minimum(1.0, jnp.exp(jnp.minimum(delta_h, 0.0))))
    accept_tile = u01 < aprob                        # (8, W)
    accept = jnp.concatenate([accept_tile] * d, axis=0)
    u_out = jnp.where(accept, u, u0)
    logp_out = jnp.where(accept_tile, logp1, logp0)
    return u_out, p, logp_out, aprob, divergent, h0, h1


def _pack_chains(x_nd, npad):
    """(n, d) chain-major -> (8d, npad//8): coordinate j's chains fill all
    8 sublanes of rows [8j, 8j+8) (chain c at sublane c // (npad//8),
    lane c % (npad//8))."""
    n, d = x_nd.shape
    w = npad // 8
    x = _pad_lanes(x_nd.T, npad)                     # (d, npad)
    return x.reshape(d * 8, w)


def _unpack_chains(x_packed, n, d):
    """(8d, W) -> (n, d)."""
    w = x_packed.shape[-1]
    return x_packed.reshape(d, 8 * w).T[:n]


def _chunk_kernel(num_steps, d, u0_ref, aux_ref, par_ref, out_ref, u_scr):
    """Grid = (num_samples,): one transition per grid step, the chain
    block carried in VMEM scratch across steps — the whole sampling phase
    is ONE kernel launch (the generic path pays ~25 small XLA kernel
    launches per transition, which dominates at small d)."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        u_scr[...] = u0_ref[...]

    aux = aux_ref[0]                  # (8(d+2), W), packed layout:
    p = aux[: 8 * d]                  # rows [0,8d) momenta (pre-scaled),
    eps = aux[8 * d: 8 * d + 8]       # [8d,8d+8) jittered step sizes,
    u01 = aux[8 * d + 8: 8 * d + 16]  # [8d+8,8d+16) accept uniforms
    u_out, _, logp_out, aprob, divergent, _, _ = _transition_core_packed(
        num_steps, d, u_scr[...], p, eps, u01, par_ref)
    u_scr[...] = u_out
    out_ref[0] = jnp.concatenate(
        [u_out, logp_out, aprob, divergent.astype(aux.dtype)], axis=0)


@functools.partial(jax.jit, static_argnames=(
    "num_samples", "num_steps", "interpret"))
def hmc_sample_chunk_small(key, u, eps, lam, b, inv_mass, num_samples,
                           num_steps, interpret=False):
    """Run ``num_samples`` whole HMC transitions in ONE pallas_call.

    The packed chain block ((8d, N/8), coordinate slabs over full
    sublanes) stays resident in VMEM scratch across the grid's transition
    axis; per-transition randoms (momenta, ±50% step-size jitter, accept
    uniforms) are pre-drawn and streamed in as one packed
    (T, 8(d+2), N/8) aux array, and each transition writes its
    post-accept positions + (logp, accept_prob, divergent) to one packed
    (T, 8(d+3), N/8) output block. Eliminates the per-transition
    launch overhead that floors the d <= 7 generic path (~25 XLA kernels
    per transition; docs/performance.md round-3/4 tables).

    Args:
      u: (N, d) start positions, d <= MAX_DIM_VPU - 1 (rows d, d+1 of the
        aux block carry eps/uniforms, so d <= 6).
      eps: shared adapted step size (scalar); jittered ±50% per
        (transition, chain) like hmc.hmc_transition.
    Returns (us (T, N, d), logps (T, N), aprobs (T, N), divs (T, N) bool,
    u_final (N, d)).
    """
    n, d = u.shape
    dt = u.dtype
    assert d <= MAX_DIM_VPU_CHUNK, \
        f"hmc_sample_chunk_small: d={d} > {MAX_DIM_VPU_CHUNK}"
    npad = -(-n // (8 * _LANE)) * (8 * _LANE)
    w = npad // 8
    T = num_samples

    k_mom, k_jit, k_acc = jax.random.split(key, 3)
    mom = jax.random.normal(k_mom, (T, n, d), dt) \
        / jnp.sqrt(inv_mass.astype(dt))[None, None, :]
    epsj = eps * jax.random.uniform(k_jit, (T, n, 1), dt,
                                    minval=0.5, maxval=1.5)
    # padded chains never accept (uniform pad = 2.0) and start at u = 0
    # with zero momenta, so they stay exactly 0
    u01 = jnp.pad(jax.random.uniform(k_acc, (T, n, 1), dt),
                  ((0, 0), (0, npad - n), (0, 0)), constant_values=2.0)
    aux = jnp.concatenate(
        [jax.vmap(lambda x: _pack_chains(x, npad))(mom),
         jax.vmap(lambda x: _pack_chains(x, npad))(epsj),
         u01.reshape(T, 8, w)], axis=1)              # (T, 8(d+2), W)
    u8 = _pack_chains(u, npad)
    par = _make_par(lam, b, inv_mass, dt)

    rows_aux = 8 * (d + 2)
    rows_out = 8 * (d + 3)
    pr = _par_rows(d)
    out = pl.pallas_call(
        functools.partial(_chunk_kernel, num_steps, d),
        grid=(T,),
        in_specs=[pl.BlockSpec((8 * d, w), lambda t: (0, 0)),
                  pl.BlockSpec((1, rows_aux, w), lambda t: (t, 0, 0)),
                  pl.BlockSpec((pr, _LANE), lambda t: (0, 0))],
        out_specs=pl.BlockSpec((1, rows_out, w), lambda t: (t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((T, rows_out, w), dt),
        scratch_shapes=[pltpu.VMEM((8 * d, w), dt)],
        interpret=interpret,
    )(u8, aux, par)
    us = jax.vmap(lambda o: _unpack_chains(o[: 8 * d], n, d))(out)
    logps = out[:, 8 * d: 8 * d + 8].reshape(T, npad)[:, :n]
    aprobs = out[:, 8 * d + 8: 8 * d + 16].reshape(T, npad)[:, :n]
    divs = out[:, 8 * d + 16: 8 * d + 24].reshape(T, npad)[:, :n] > 0.5
    u_final = us[-1]
    return us, logps, aprobs, divs, u_final


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


# --------------------------------------------------------------------------
# Whole-warmup kernel: pooled dual averaging + windowed Welford mass, all
# iterations in ONE launch (round 4)
# --------------------------------------------------------------------------

# scratch rows for the warmup state (VMEM (16, LANE) f32)
_R_LOGEPS, _R_LOGEPSBAR, _R_HBAR, _R_MU, _R_TDA = 0, 1, 2, 3, 4
_R_NW, _R_MEAN, _R_M2, _R_IM = 5, 6, 7, 8


def _warmup_kernel(num_steps, d, n_live, eps0, target, boundaries,
                   u0_ref, aux_ref, par_ref, out_ref, u_scr, st_scr):
    """Grid = (num_warmup,): Stan-style pooled warmup with the chain block
    AND the adaptation state (dual averaging scalars, Chan-Welford
    mean/m2, inverse mass) resident in VMEM scratch. ``boundaries`` is a
    static tuple of (iteration_index, adapt_mass_during_prev_window)
    window ends; mass/DA resets fire via pl.when on the grid index —
    exactly run_warmup_pooled's schedule semantics (inference/
    adaptation.py), with pre-drawn randoms instead of fold_in streams."""
    t = pl.program_id(0)
    nT = pl.num_programs(0)
    dt = st_scr.dtype
    c_live = jnp.asarray(float(n_live), dt)

    def srow(r):
        return st_scr[r, 0]           # scalar read

    def wrow(r, val):
        st_scr[r: r + 1, :] = jnp.full((1, _LANE), val, dt)

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, _LANE), 1)

    def wvec(r, scalars):
        # pack d scalars into row r (col j = scalars[j])
        acc = jnp.zeros((1, _LANE), dt)
        for j, s in enumerate(scalars):
            acc = acc + jnp.where(lane == j, s, 0.0)
        st_scr[r: r + 1, :] = acc

    @pl.when(t == 0)
    def _():
        u_scr[...] = u0_ref[...]
        wrow(_R_LOGEPS, jnp.log(eps0))
        wrow(_R_LOGEPSBAR, jnp.log(eps0))
        wrow(_R_HBAR, 0.0)
        wrow(_R_MU, jnp.log(10.0 * eps0))
        wrow(_R_TDA, 0.0)
        wrow(_R_NW, 0.0)
        wrow(_R_MEAN, 0.0)
        wrow(_R_M2, 0.0)
        wrow(_R_IM, 1.0)

    # ---- window-end updates (static boundary indices; fire BEFORE the
    # iteration, i.e. right after the window's last transition) ----------
    for (bidx, was_slow) in boundaries:
        @pl.when(t == bidx)
        def _(was_slow=was_slow):
            if was_slow:
                n_w = srow(_R_NW)
                shrink = n_w / (n_w + 5.0)
                var_scalars = []
                for j in range(d):
                    m2_j = st_scr[_R_M2, j]
                    var_j = m2_j / jnp.maximum(n_w - 1.0, 1.0)
                    var_j = shrink * var_j + (1.0 - shrink) * 1e-3
                    var_j = jnp.clip(var_j, 1e-8, 1e8)
                    # ROUND-5 FIX: the metric M^-1 is the VARIANCE
                    # estimate (Stan's inv_metric), not 1/var — see
                    # inference/adaptation.py
                    var_scalars.append(var_j)
                wvec(_R_IM, var_scalars)
                # dual averaging restarts around the adapted step size
                leb = srow(_R_LOGEPSBAR)
                wrow(_R_LOGEPS, leb)
                wrow(_R_MU, jnp.log(10.0) + leb)
                wrow(_R_HBAR, 0.0)
                wrow(_R_TDA, 0.0)
                wrow(_R_NW, 0.0)
                wrow(_R_MEAN, 0.0)
                wrow(_R_M2, 0.0)

    in_slow = jnp.zeros((), jnp.bool_)
    prev = 0
    for (bidx, was_slow) in boundaries:
        in_slow = in_slow | ((t >= prev) & (t < bidx) & was_slow)
        prev = bidx

    aux = aux_ref[0]                  # (8(d+2), W) packed: STANDARD
    # normal momenta scaled by the EVOLVING mass: p_j = z_j / sqrt(im_j)
    p = jnp.concatenate(
        [aux[8 * j: 8 * (j + 1), :] * jax.lax.rsqrt(st_scr[_R_IM, j])
         for j in range(d)], axis=0)
    eps = jnp.exp(srow(_R_LOGEPS)) * aux[8 * d: 8 * d + 8, :]
    u01 = aux[8 * d + 8: 8 * d + 16, :]

    u_out, _, _, aprob, _, _, _ = _transition_core_packed(
        num_steps, d, u_scr[...], p, eps, u01, par_ref,
        im_fn=lambda j: st_scr[_R_IM, j])
    u_scr[...] = u_out

    # pooled accept statistic over LIVE chains (pads masked; the packed
    # flat chain index is sublane * W + lane)
    w_cols = aprob.shape[-1]
    flat = (jax.lax.broadcasted_iota(jnp.int32, aprob.shape, 0) * w_cols
            + jax.lax.broadcasted_iota(jnp.int32, aprob.shape, 1))
    mask = (flat < n_live).astype(dt)
    a_mean = jnp.sum(aprob * mask) / c_live

    # dual averaging (inference/hmc.py:da_update constants)
    t_da = srow(_R_TDA) + 1.0
    eta_h = 1.0 / (t_da + 10.0)
    h_bar = (1.0 - eta_h) * srow(_R_HBAR) + eta_h * (target - a_mean)
    log_eps = srow(_R_MU) - jnp.sqrt(t_da) / 0.05 * h_bar
    eta = jnp.exp(-0.75 * jnp.log(t_da))
    log_eps_bar = eta * log_eps + (1.0 - eta) * srow(_R_LOGEPSBAR)
    wrow(_R_TDA, t_da)
    wrow(_R_HBAR, h_bar)
    wrow(_R_LOGEPS, log_eps)
    wrow(_R_LOGEPSBAR, log_eps_bar)

    # Chan-Welford pooled mass update during slow windows
    @pl.when(in_slow)
    def _():
        n_w = srow(_R_NW)
        n_new = n_w + c_live
        mean_s, m2_s = [], []
        for j in range(d):
            uj_t = u_out[8 * j: 8 * (j + 1), :]
            b_mean = jnp.sum(uj_t * mask) / c_live
            b_m2 = jnp.sum(((uj_t - b_mean) * mask) ** 2)
            mean_j = st_scr[_R_MEAN, j]
            delta = b_mean - mean_j
            mean_s.append(mean_j + delta * c_live / n_new)
            m2_s.append(st_scr[_R_M2, j] + b_m2
                        + delta * delta * n_w * c_live / n_new)
        wvec(_R_MEAN, mean_s)
        wvec(_R_M2, m2_s)
        wrow(_R_NW, n_new)

    @pl.when(t == nT - 1)
    def _():
        # pack final (u, eps_bar, inv_mass) into the single output block
        # (concatenate, not .at[].set — Mosaic has no scatter): rows
        # [0, 8d) = packed u; the trailing tile(s) carry eps on sublane 0
        # and im_j on sublane 1 + j, zero-padded to whole 8-row tiles
        bc2 = u_out.shape[-1]
        eps_row = jnp.full((1, bc2), jnp.exp(srow(_R_LOGEPSBAR)), dt)
        im_rows = [jnp.full((1, bc2), st_scr[_R_IM, j], dt)
                   for j in range(d)]
        tr = -(-(1 + d) // 8) * 8
        out_ref[...] = jnp.concatenate(
            [u_out, eps_row] + im_rows
            + [jnp.zeros((tr - 1 - d, bc2), dt)], axis=0)


@functools.partial(jax.jit, static_argnames=(
    "num_warmup", "num_steps", "eps0", "target_accept", "interpret"))
def hmc_warmup_chunk_small(key, u0s, eps0, lam, b, num_warmup, num_steps,
                           target_accept=0.8, interpret=False):
    """The ENTIRE pooled warmup (Stan windowed schedule) in ONE
    pallas_call. Returns (us (N, d), eps (scalar), inv_mass (d,)).

    Semantics follow inference/adaptation.run_warmup_pooled (same DA
    constants, same window schedule from warmup_schedule, same Chan-
    Welford pooling and shrinkage) with pre-drawn per-iteration randoms;
    it is a separate RNG stream from the generic path, not a bitwise
    replica of it."""
    from modppl_tpu.inference.adaptation import warmup_schedule

    n, d = u0s.shape
    dt = u0s.dtype
    assert d <= MAX_DIM_VPU_CHUNK, \
        f"hmc_warmup_chunk_small: d={d} > {MAX_DIM_VPU_CHUNK}"
    npad = -(-n // (8 * _LANE)) * (8 * _LANE)
    T = int(num_warmup)

    fast1, slow, fast2 = warmup_schedule(T)
    boundaries = []
    idx = fast1
    if fast1 > 0:
        boundaries.append((idx, False))
    for w in slow:
        idx += w
        boundaries.append((idx, True))
    # (the final fast2 window needs no end-update; eps_bar is read off)

    k_mom, k_jit, k_acc = jax.random.split(key, 3)
    # STANDARD normals — the kernel scales by the evolving 1/sqrt(im)
    mom = jax.random.normal(k_mom, (T, n, d), dt)
    jit = jax.random.uniform(k_jit, (T, n, 1), dt, minval=0.5, maxval=1.5)
    u01 = jnp.pad(jax.random.uniform(k_acc, (T, n, 1), dt),
                  ((0, 0), (0, npad - n), (0, 0)), constant_values=2.0)
    w = npad // 8
    aux = jnp.concatenate(
        [jax.vmap(lambda x: _pack_chains(x, npad))(mom),
         jax.vmap(lambda x: _pack_chains(x, npad))(jit),
         u01.reshape(T, 8, w)], axis=1)              # (T, 8(d+2), W)
    u8 = _pack_chains(u0s, npad)
    par = _make_par(lam, b, None, dt)

    rows_aux = 8 * (d + 2)
    pr = _par_rows(d)
    out = pl.pallas_call(
        functools.partial(_warmup_kernel, num_steps, d, n,
                          float(eps0), float(target_accept),
                          tuple(boundaries)),
        grid=(T,),
        in_specs=[pl.BlockSpec((8 * d, w), lambda t: (0, 0)),
                  pl.BlockSpec((1, rows_aux, w), lambda t: (t, 0, 0)),
                  pl.BlockSpec((pr, _LANE), lambda t: (0, 0))],
        out_specs=pl.BlockSpec(
            (8 * d + (-(-(1 + d) // 8) * 8), w), lambda t: (0, 0)),
        out_shape=jax.ShapeDtypeStruct(
            (8 * d + (-(-(1 + d) // 8) * 8), w), dt),
        scratch_shapes=[pltpu.VMEM((8 * d, w), dt),
                        pltpu.VMEM((16, _LANE), dt)],
        interpret=interpret,
    )(u8, aux, par)
    us = _unpack_chains(out[: 8 * d], n, d)
    eps = out[8 * d, 0]
    inv_mass = jnp.stack([out[8 * d + 1 + j, 0] for j in range(d)])
    return us, eps, inv_mass
