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
from jax.experimental.pallas import tpu as pltpu

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


def _seg_width(d):
    """Lane-group width for chain packing: the smallest 128-divisor tile
    >= d. G = 128 // s chains share one 128-lane row (their Λ blocks sit
    on the diagonal of a (128, 128) packed matrix), so d <= 64 quadratic
    targets stop paying the full 128-lane padding (round 5: the d = 32
    MXU path previously wasted 4x lanes AND 4x rows of MXU work)."""
    for s in (16, 32, 64):
        if d <= s:
            return s
    return _LANE


def _seg_matrices(seg, dt):
    """(B, Bt, C) 0/1 matrices for the packed-chain layout.

    ``compact (BC, 8) @ B (8, 128)`` broadcasts per-(row, group) scalars
    to their s-lane groups (step sizes, accept masks); ``plane (BC, 128)
    @ Bt (128, 8)`` reduces each s-lane group to its compact column
    (per-chain Hamiltonian / logp sums); ``row_plane (1, 128) @ C (128,
    128)`` sums lanes with equal offset-in-group across groups
    (per-coordinate pooling over ALL packed chains). Groups g >= G are
    zero rows/columns of B/Bt, so the 8-wide compact padding is inert."""
    ig8 = jax.lax.broadcasted_iota(jnp.int32, (8, _LANE), 0)
    il8 = jax.lax.broadcasted_iota(jnp.int32, (8, _LANE), 1)
    B = ((il8 // seg) == ig8).astype(dt)
    ilt = jax.lax.broadcasted_iota(jnp.int32, (_LANE, 8), 0)
    igt = jax.lax.broadcasted_iota(jnp.int32, (_LANE, 8), 1)
    Bt = ((ilt // seg) == igt).astype(dt)
    ir = jax.lax.broadcasted_iota(jnp.int32, (_LANE, _LANE), 0)
    ic = jax.lax.broadcasted_iota(jnp.int32, (_LANE, _LANE), 1)
    C = ((ir % seg) == (ic % seg)).astype(dt)
    return B, Bt, C


def _pack_chains(x, s, rows):
    """(..., n, d) -> (..., rows, 128): G = 128//s chains per packed row,
    each padded to s lanes (pads zero: zero gradient, zero momentum)."""
    G = _LANE // s
    *lead, n, d = x.shape
    x = jnp.pad(x, [(0, 0)] * len(lead) + [(0, rows * G - n), (0, s - d)])
    return x.reshape(*lead, rows, _LANE)


def _unpack_chains(xp, s, n, d):
    *lead, rows, _ = xp.shape
    G = _LANE // s
    return xp.reshape(*lead, rows * G, s)[..., :n, :d]


def _chain_compact(vals, s, rows, pad_value=0.0):
    """(..., n) per-chain scalars -> (..., rows, 8) compact per-group
    arrays (lane g = the value for the chain in group g of that row; the
    kernel broadcasts to s-lane planes via ``@ B``). Compact streams keep
    the HBM random-stream footprint at 8 floats per packed row instead of
    a full 128-lane plane. Pad chains get ``pad_value`` (2.0 for accept
    uniforms: a padded chain never accepts, so it stays at its zero pad)."""
    G = _LANE // s
    *lead, n = vals.shape
    v = jnp.pad(vals, [(0, 0)] * len(lead) + [(0, rows * G - n)],
                constant_values=pad_value)
    v = v.reshape(*lead, rows, G)
    if G < 8:
        v = jnp.pad(v, [(0, 0)] * (len(lead) + 1) + [(0, 8 - G)],
                    constant_values=pad_value)
    return v


def _pack_quad(lam, b, s, dt):
    """Block-diagonal packed quadratic form: G copies of the (s, s)-padded
    Λ on the diagonal of a (128, 128) matrix (cross-chain entries zero, so
    ``u_packed @ lam_packed`` is every chain's gradient), b tiled."""
    G = _LANE // s
    lp = _pad_to(_pad_to(lam.astype(dt), s, 0), s, 1)
    lam_p = jnp.kron(jnp.eye(G, dtype=dt), lp)
    b_p = jnp.tile(_pad_to(b.astype(dt)[None, :], s, 1), (1, G))
    return lam_p, b_p


def _chunk_kernel_mxu(num_steps, seg, u0_ref, mom_ref, eps_ref, u01_ref,
                      lam_ref, b_ref, im_ref, uo_ref, st_ref, u_scr):
    """Grid = (chain_blocks, num_samples): transitions iterate INNERMOST,
    so each block's packed positions persist in VMEM scratch across its
    whole sampling phase (re-initialized from u0 at t == 0);
    per-transition randoms stream per grid step (the MXU counterpart of
    leapfrog_vpu_pallas._chunk_kernel, blocked over chains to respect the
    16 MB scoped-VMEM limit at 4096+ chains).

    Round 5: rows carry G = 128//seg chains each (block-diagonal Λ), so
    d <= 64 targets do 128/s times less MXU work and HBM traffic.
    Per-chain scalars travel COMPACT — (BC, 8) lane-per-group arrays for
    the eps / accept-uniform streams (expanded to s-lane planes in-kernel
    via ``@ B``) and a (BC, 24) stats output [logp | aprob | divergent]
    — so stream/stat HBM stays at a few floats per packed row. Per-chain
    Hamiltonian sums reduce plane -> compact via ``@ Bt``
    (_seg_matrices). logp is computed elementwise via the gradient
    identity logp_elem = 0.5*u*(b + g) (g = b - uΛ), reusing the
    leapfrog's own matmuls."""
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        u_scr[...] = u0_ref[...]

    lam = lam_ref[...]
    bv = b_ref[...]                  # (1, 128) packed
    im = im_ref[...]                 # (1, 128) packed
    u0 = u_scr[...]                  # (BC, 128) packed rows
    p0 = mom_ref[0]                  # (BC, 128) pre-scaled momenta
    eps_c = eps_ref[0]               # (BC, 8) compact per-group
    u01_c = u01_ref[0]               # (BC, 8)
    dt = u0.dtype

    hi = jax.lax.Precision.HIGHEST
    B, Bt, _ = _seg_matrices(seg, dt)
    eps = jnp.dot(eps_c, B, precision=hi)    # (BC, 128) plane

    def grad(u):
        # HIGHEST is load-bearing (see _kernel). Clamp the matmul
        # input: an overflowed (inf) chain would otherwise poison every
        # co-packed chain in its row through inf * 0 = nan against the
        # block-diagonal zeros — elementwise ops keep the overflow
        # confined to the bad chain's own lanes, the matmul must too.
        # u is never nan here (p stays finite when g does, so u only
        # ever reaches +-inf), so a clip to +-1e30 suffices and is
        # cheaper than an isfinite select; the bad chain itself is
        # flagged divergent from its energies.
        u_m = jnp.clip(u, -1e30, 1e30)
        return bv - jnp.dot(u_m, lam, preferred_element_type=dt,
                            precision=hi)

    def e_elem(u, g, p):
        # -logp + kinetic, elementwise (per-chain totals via @ Bt)
        return -0.5 * u * (bv + g) + 0.5 * im * p * p

    def body(_, carry):
        u, p, g = carry
        p = p + 0.5 * eps * g
        u = u + eps * im * p
        g = grad(u)
        p = p + 0.5 * eps * g
        return (u, p, g)

    g0 = grad(u0)
    e0 = e_elem(u0, g0, p0)
    u1, p1, g1 = jax.lax.fori_loop(0, num_steps, body, (u0, p0, g0))

    # same sanitation for the energy reduction: zero non-finite terms in
    # the @ Bt sum and flag their groups divergent explicitly
    e_diff = e0 - e_elem(u1, g1, p1)
    fin = jnp.isfinite(e_diff)
    bad_c = jnp.dot(1.0 - fin.astype(dt), Bt, precision=hi) > 0.0
    dh_c = jnp.dot(jnp.where(fin, e_diff, 0.0), Bt, precision=hi)
    div_c = bad_c | jnp.logical_not(jnp.isfinite(dh_c)) | (dh_c < -1000.0)
    aprob_c = jnp.where(div_c, 0.0,
                        jnp.minimum(1.0, jnp.exp(jnp.minimum(dh_c, 0.0))))
    acc_c = (u01_c < aprob_c).astype(dt)
    # accept plane, selected with where (NOT arithmetic blend): a
    # divergent u1 carries inf/nan and 0 * inf would poison the reject
    acc = jnp.dot(acc_c, B, precision=hi) > 0.5
    u_out = jnp.where(acc, u1, u0)
    # logp reduction sanitized like the energies: a chain whose state
    # energy overflows f32 (it is flagged divergent above) must not nan
    # its co-packed neighbors' logp sums; its own logp is garbage, which
    # the divergent flag already communicates
    lp_elem = 0.5 * jnp.where(acc, u1 * (bv + g1), u0 * (bv + g0))
    lp_c = jnp.dot(jnp.where(jnp.isfinite(lp_elem), lp_elem, 0.0),
                   Bt, precision=hi)
    u_scr[...] = u_out
    uo_ref[0] = u_out
    st_ref[0] = jnp.concatenate([lp_c, aprob_c, div_c.astype(dt)], axis=1)


# warmup-state scratch rows (VMEM (8, LANE) f32)
_R_LOGEPS, _R_LOGEPSBAR, _R_HBAR, _R_MU, _R_TDA, _R_NW = 0, 1, 2, 3, 4, 5


def _warmup_kernel_mxu(num_steps, n_live, eps0, target, boundaries, seg,
                       u0_ref, mom_ref, epsj_ref, u01_ref, lam_ref, b_ref,
                       out_ref, u_scr, st_scr, mean_scr, m2_scr, im_scr):
    """Grid = (num_warmup,): the whole pooled windowed warmup in one
    launch at d >= 13 — the packed chain block, dual-averaging scalars,
    Chan-Welford (1, 128) moment planes and the (1, 128) inverse mass all
    live in VMEM scratch (the MXU counterpart of leapfrog_vpu_pallas.
    _warmup_kernel). Round 5: rows carry G = 128//seg chains each (see
    _chunk_kernel_mxu); the Welford moments pool over ALL chains via the
    cross-group matrix C (coordinate j's statistics combine the lanes
    g*seg + j of every group g), so the adapted metric is identical in
    distribution to the unpacked layout."""
    t = pl.program_id(0)
    nT = pl.num_programs(0)
    dt = st_scr.dtype
    G = _LANE // seg
    c_chains = jnp.asarray(float(n_live), dt)
    hi = jax.lax.Precision.HIGHEST
    B, Bt, C = _seg_matrices(seg, dt)

    def srow(r):
        return st_scr[r, 0]

    def wrow(r, val):
        st_scr[r: r + 1, :] = jnp.full((1, _LANE), val, dt)

    @pl.when(t == 0)
    def _():
        u_scr[...] = u0_ref[...]
        wrow(_R_LOGEPS, jnp.log(eps0))
        wrow(_R_LOGEPSBAR, jnp.log(eps0))
        wrow(_R_HBAR, 0.0)
        wrow(_R_MU, jnp.log(10.0 * eps0))
        wrow(_R_TDA, 0.0)
        wrow(_R_NW, 0.0)
        mean_scr[...] = jnp.zeros_like(mean_scr)
        m2_scr[...] = jnp.zeros_like(m2_scr)
        im_scr[...] = jnp.ones_like(im_scr)

    for (bidx, was_slow) in boundaries:
        @pl.when(t == bidx)
        def _(was_slow=was_slow):
            if was_slow:
                n_w = srow(_R_NW)
                shrink = n_w / (n_w + 5.0)
                var = m2_scr[...] / jnp.maximum(n_w - 1.0, 1.0)
                var = shrink * var + (1.0 - shrink) * 1e-3
                # ROUND-5 FIX: the metric M^-1 is the VARIANCE
                # estimate (Stan's inv_metric), not 1/var — see
                # inference/adaptation.py
                im_scr[...] = jnp.clip(var, 1e-8, 1e8)
                leb = srow(_R_LOGEPSBAR)
                wrow(_R_LOGEPS, leb)
                wrow(_R_MU, jnp.log(10.0) + leb)
                wrow(_R_HBAR, 0.0)
                wrow(_R_TDA, 0.0)
                wrow(_R_NW, 0.0)
                mean_scr[...] = jnp.zeros_like(mean_scr)
                m2_scr[...] = jnp.zeros_like(m2_scr)

    in_slow = jnp.zeros((), jnp.bool_)
    prev = 0
    for (bidx, was_slow) in boundaries:
        in_slow = in_slow | ((t >= prev) & (t < bidx) & was_slow)
        prev = bidx

    lam = lam_ref[...]
    bv = b_ref[...]
    im = im_scr[...]                 # (1, 128) packed
    u0 = u_scr[...]                  # (BC, 128) packed rows
    z = mom_ref[0]                   # standard normals, packed
    p0 = z * jax.lax.rsqrt(im)
    eps = jnp.exp(srow(_R_LOGEPS)) \
        * jnp.dot(epsj_ref[0], B, precision=hi)    # (BC, 128) plane
    u01_c = u01_ref[0]               # (BC, 8) compact

    def grad(u):
        # clamped matmul input: see _chunk_kernel_mxu.grad (an inf
        # chain must not nan-poison its co-packed row)
        u_m = jnp.clip(u, -1e30, 1e30)
        return bv - jnp.dot(u_m, lam, preferred_element_type=dt,
                            precision=hi)

    def e_elem(u, g, p):
        return -0.5 * u * (bv + g) + 0.5 * im * p * p

    def body(_, carry):
        u, p, g = carry
        p = p + 0.5 * eps * g
        u = u + eps * im * p
        g = grad(u)
        p = p + 0.5 * eps * g
        return (u, p, g)

    g0 = grad(u0)
    e0 = e_elem(u0, g0, p0)
    u1, p1, g1 = jax.lax.fori_loop(0, num_steps, body, (u0, p0, g0))
    e_diff = e0 - e_elem(u1, g1, p1)
    fin = jnp.isfinite(e_diff)
    bad_c = jnp.dot(1.0 - fin.astype(dt), Bt, precision=hi) > 0.0
    dh_c = jnp.dot(jnp.where(fin, e_diff, 0.0), Bt, precision=hi)
    div_c = bad_c | jnp.logical_not(jnp.isfinite(dh_c)) | (dh_c < -1000.0)
    aprob_c = jnp.where(div_c, 0.0,
                        jnp.minimum(1.0, jnp.exp(jnp.minimum(dh_c, 0.0))))
    acc_c = (u01_c < aprob_c).astype(dt)
    acc = jnp.dot(acc_c, B, precision=hi) > 0.5
    u_out = jnp.where(acc, u1, u0)
    u_scr[...] = u_out

    # live-chain mask, compact: chain id = row*G + group lane
    rowi_c = jax.lax.broadcasted_iota(jnp.int32, aprob_c.shape, 0)
    gi_c = jax.lax.broadcasted_iota(jnp.int32, aprob_c.shape, 1)
    mask_c = (((rowi_c * G + gi_c) < n_live) & (gi_c < G)).astype(dt)
    a_mean = jnp.sum(aprob_c * mask_c) / c_chains

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

    @pl.when(in_slow)
    def _():
        n_w = srow(_R_NW)
        n_new = n_w + c_chains
        # live-chain mask as an s-lane plane for the moment sums
        rowi = jax.lax.broadcasted_iota(jnp.int32, u_out.shape, 0)
        lanei = jax.lax.broadcasted_iota(jnp.int32, u_out.shape, 1)
        mask = ((rowi * G + lanei // seg) < n_live).astype(dt)
        um = u_out * mask                       # pads zeroed
        # per-coordinate totals over ALL packed chains: row-sum to a
        # (1, 128) lane plane, then pool across groups via C (each lane
        # ends up holding its coordinate's all-chain total, replicated
        # identically in every group)
        b_mean = jnp.dot(jnp.sum(um, axis=0, keepdims=True), C,
                         precision=hi) / c_chains
        b_m2 = jnp.dot(jnp.sum(((u_out - b_mean) * mask) ** 2, axis=0,
                               keepdims=True), C, precision=hi)
        mean = mean_scr[...]
        delta = b_mean - mean
        mean_scr[...] = mean + delta * c_chains / n_new
        m2_scr[...] = m2_scr[...] + b_m2 + delta * delta * n_w * c_chains \
            / n_new
        wrow(_R_NW, n_new)

    @pl.when(t == nT - 1)
    def _():
        eps_row = jnp.full((1, _LANE), jnp.exp(srow(_R_LOGEPSBAR)), dt)
        out_ref[...] = jnp.concatenate(
            [u_out, im_scr[...], eps_row,
             jnp.zeros((6, _LANE), dt)], axis=0)


@functools.partial(jax.jit, static_argnames=(
    "num_warmup", "num_steps", "eps0", "target_accept", "interpret"))
def hmc_warmup_chunk(key, u0s, eps0, lam, b, num_warmup, num_steps,
                     target_accept=0.8, interpret=False):
    """The ENTIRE pooled warmup in ONE pallas_call at d >= 13 (all chains
    in one block — warmup writes no per-iteration outputs, so the block
    fits scoped VMEM where the sampler must tile chains). d <= 64 targets
    pack G = 128//s chains per lane row (round 5, see _seg_width).
    Returns (us (N, d), eps scalar, inv_mass (d,)). Same schedule and
    constants as adaptation.run_warmup_pooled; separate pre-drawn RNG
    stream (re-laid-out in round 5 — the packed layout draws per-chain
    (T, n) jitter/accept streams instead of (T, 1, n) rows)."""
    from modppl_tpu.inference.adaptation import warmup_schedule

    n, d = u0s.shape
    dt = u0s.dtype
    s = _seg_width(d)
    G = _LANE // s
    rows = -(-(-(-n // G)) // 8) * 8    # ceil(n/G) rounded up to 8
    T = int(num_warmup)

    fast1, slow, fast2 = warmup_schedule(T)
    boundaries = []
    idx = fast1
    if fast1 > 0:
        boundaries.append((idx, False))
    for w in slow:
        idx += w
        boundaries.append((idx, True))

    k_mom, k_jit, k_acc = jax.random.split(key, 3)
    mom_p = _pack_chains(jax.random.normal(k_mom, (T, n, d), dt), s, rows)
    epsj_c = _chain_compact(
        jax.random.uniform(k_jit, (T, n), dt, minval=0.5, maxval=1.5),
        s, rows)
    u01_c = _chain_compact(jax.random.uniform(k_acc, (T, n), dt), s, rows,
                           pad_value=2.0)
    u_p = _pack_chains(u0s, s, rows)
    lam_p, b_p = _pack_quad(lam, b, s, dt)

    out = pl.pallas_call(
        functools.partial(_warmup_kernel_mxu, num_steps, n, float(eps0),
                          float(target_accept), tuple(boundaries), s),
        grid=(T,),
        in_specs=[pl.BlockSpec((rows, _LANE), lambda t: (0, 0)),
                  pl.BlockSpec((1, rows, _LANE), lambda t: (t, 0, 0)),
                  pl.BlockSpec((1, rows, 8), lambda t: (t, 0, 0)),
                  pl.BlockSpec((1, rows, 8), lambda t: (t, 0, 0)),
                  pl.BlockSpec((_LANE, _LANE), lambda t: (0, 0)),
                  pl.BlockSpec((1, _LANE), lambda t: (0, 0))],
        out_specs=pl.BlockSpec((rows + 8, _LANE), lambda t: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((rows + 8, _LANE), dt),
        scratch_shapes=[pltpu.VMEM((rows, _LANE), dt),
                        pltpu.VMEM((8, _LANE), dt),
                        pltpu.VMEM((1, _LANE), dt),
                        pltpu.VMEM((1, _LANE), dt),
                        pltpu.VMEM((1, _LANE), dt)],
        # all chains live in one block (~2 MB each for u0/scratch/out plus
        # double-buffered streams) — past the default 16 MB scoped-VMEM
        # budget at 4096 chains, comfortably inside the chip's VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(u_p, mom_p, epsj_c, u01_c, lam_p, b_p)
    us = _unpack_chains(out[:rows], s, n, d)
    inv_mass = out[rows, :d]    # group lanes are identical; first group
    eps = out[rows + 1, 0]
    return us, eps, inv_mass


@functools.partial(jax.jit, static_argnames=(
    "num_samples", "num_steps", "interpret"))
def hmc_sample_chunk(key, u, eps, lam, b, inv_mass, num_samples, num_steps,
                     interpret=False):
    """All ``num_samples`` MXU-tiled HMC transitions in ONE pallas_call
    (d >= 13 quadratic targets; the VPU counterpart is
    leapfrog_vpu_pallas.hmc_sample_chunk_small). d <= 64 targets pack
    G = 128//s chains per lane row (round 5, see _seg_width) — 128/s
    times less MXU work and HBM traffic than the 128-lane-padded layout.
    Returns (us (T, N, d), logps (T, N), aprobs (T, N), divs (T, N))."""
    n, d = u.shape
    dt = u.dtype
    s = _seg_width(d)
    G = _LANE // s
    rows_n = -(-n // G)
    # pick the block COUNT first, then size blocks to fit: padding to a
    # fixed 1024-row block would waste up to a whole block of MXU work
    # (e.g. 2500 packed rows -> 3 x 1024 = 23% pad; here 3 x 840 = 0.8%)
    nb = -(-rows_n // 1024)
    per_block = -(-rows_n // nb)
    bc = -(-per_block // 8) * 8
    rows = nb * bc
    T = num_samples

    k_mom, k_jit, k_acc = jax.random.split(key, 3)
    mom = jax.random.normal(k_mom, (T, n, d), dt) \
        / jnp.sqrt(inv_mass.astype(dt))[None, None, :]
    mom_p = _pack_chains(mom, s, rows)
    # pads: never accept (u01 = 2), zero momenta -> padded chains stay 0
    eps_c = _chain_compact(
        eps * jax.random.uniform(k_jit, (T, n), dt, minval=0.5,
                                 maxval=1.5), s, rows)
    u01_c = _chain_compact(jax.random.uniform(k_acc, (T, n), dt), s, rows,
                           pad_value=2.0)
    u_p = _pack_chains(u, s, rows)
    lam_p, b_p = _pack_quad(lam, b, s, dt)
    im_p = jnp.tile(_pad_to(inv_mass.astype(dt)[None, :], s, 1), (1, G))

    us_p, st_p = pl.pallas_call(
        functools.partial(_chunk_kernel_mxu, num_steps, s),
        grid=(rows // bc, T),
        in_specs=[pl.BlockSpec((bc, _LANE), lambda c, t: (c, 0)),
                  pl.BlockSpec((1, bc, _LANE), lambda c, t: (t, c, 0)),
                  pl.BlockSpec((1, bc, 8), lambda c, t: (t, c, 0)),
                  pl.BlockSpec((1, bc, 8), lambda c, t: (t, c, 0)),
                  pl.BlockSpec((_LANE, _LANE), lambda c, t: (0, 0)),
                  pl.BlockSpec((1, _LANE), lambda c, t: (0, 0)),
                  pl.BlockSpec((1, _LANE), lambda c, t: (0, 0))],
        out_specs=[pl.BlockSpec((1, bc, _LANE), lambda c, t: (t, c, 0)),
                   pl.BlockSpec((1, bc, 24), lambda c, t: (t, c, 0))],
        out_shape=[jax.ShapeDtypeStruct((T, rows, _LANE), dt),
                   jax.ShapeDtypeStruct((T, rows, 24), dt)],
        scratch_shapes=[pltpu.VMEM((bc, _LANE), dt)],
        interpret=interpret,
    )(u_p, mom_p, eps_c, u01_c, lam_p, b_p, im_p)
    us = _unpack_chains(us_p, s, n, d)
    # compact stats: lanes [0:8) logp, [8:16) aprob, [16:24) divergent,
    # one lane per group
    lp = st_p[:, :, 0:G].reshape(T, rows * G)[:, :n]
    ap = st_p[:, :, 8:8 + G].reshape(T, rows * G)[:, :n]
    dv = st_p[:, :, 16:16 + G].reshape(T, rows * G)[:, :n]
    return us, lp, ap, dv > 0.5


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
