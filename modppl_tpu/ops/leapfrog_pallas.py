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


def _chunk_kernel_mxu(num_steps, u0_ref, mom_ref, ju_ref, lam_ref, b_ref,
                      im_ref, out_ref, st_ref, u_scr):
    """Grid = (chain_blocks, num_samples): transitions iterate INNERMOST,
    so each chain block's (BC, D) positions persist in VMEM scratch across
    its whole sampling phase (re-initialized from u0 at t == 0);
    per-transition randoms stream per grid step (the MXU counterpart of
    leapfrog_vpu_pallas._chunk_kernel, blocked over chains to respect the
    16 MB scoped-VMEM limit at 4096+ chains)."""
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        u_scr[...] = u0_ref[...]

    lam = lam_ref[...]
    bv = b_ref[...]                  # (1, D)
    im = im_ref[...]                 # (1, D)
    u0 = u_scr[...]                  # (BC, D)
    p = mom_ref[0]                   # (BC, D) pre-scaled momenta
    eps = ju_ref[0, 0:1, :].T        # (BC, 1) jittered step sizes
    u01 = ju_ref[0, 1:2, :].T        # (BC, 1) accept uniforms

    hi = jax.lax.Precision.HIGHEST

    def grad(u):
        # HIGHEST is load-bearing (see _kernel)
        return bv - jnp.dot(u, lam, preferred_element_type=u.dtype,
                            precision=hi)

    def logp_of(u):
        return (-0.5 * jnp.sum(
            u * jnp.dot(u, lam, precision=hi), axis=-1, keepdims=True)
            + jnp.sum(u * bv, axis=-1, keepdims=True))

    def kin_of(p):
        return 0.5 * jnp.sum(im * p * p, axis=-1, keepdims=True)

    logp0 = logp_of(u0)
    h0 = -logp0 + kin_of(p)

    def body(_, carry):
        u, p, g = carry
        p = p + 0.5 * eps * g
        u = u + eps * im * p
        g = grad(u)
        p = p + 0.5 * eps * g
        return (u, p, g)

    u, p, _ = jax.lax.fori_loop(0, num_steps, body, (u0, p, grad(u0)))

    logp1 = logp_of(u)
    h1 = -logp1 + kin_of(p)
    delta_h = h0 - h1
    divergent = jnp.logical_not(jnp.isfinite(delta_h)) | (delta_h < -1000.0)
    aprob = jnp.where(divergent, 0.0,
                      jnp.minimum(1.0, jnp.exp(jnp.minimum(delta_h, 0.0))))
    accept = u01 < aprob
    u_out = jnp.where(accept, u, u0)
    u_scr[...] = u_out
    out_ref[0] = u_out
    st_ref[0] = jnp.concatenate(
        [jnp.where(accept, logp1, logp0), aprob,
         divergent.astype(u0.dtype),
         jnp.zeros((u0.shape[0], 5), u0.dtype)], axis=1).T


# warmup-state scratch rows (VMEM (8, LANE) f32)
_R_LOGEPS, _R_LOGEPSBAR, _R_HBAR, _R_MU, _R_TDA, _R_NW = 0, 1, 2, 3, 4, 5


def _warmup_kernel_mxu(num_steps, n_live, eps0, target, boundaries,
                       u0_ref, mom_ref, ju_ref, lam_ref, b_ref, out_ref,
                       u_scr, st_scr, mean_scr, m2_scr, im_scr):
    """Grid = (num_warmup,): the whole pooled windowed warmup in one
    launch at d >= 128 — the (BC, D) chain block, dual-averaging scalars,
    Chan-Welford (1, D) moments and the (1, D) inverse mass all live in
    VMEM scratch (the MXU counterpart of leapfrog_vpu_pallas.
    _warmup_kernel; per-coordinate chain reductions are single
    row-axis sums here, no lane packing needed)."""
    t = pl.program_id(0)
    nT = pl.num_programs(0)
    dt = st_scr.dtype
    c_live = jnp.asarray(float(n_live), dt)
    hi = jax.lax.Precision.HIGHEST

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
    im = im_scr[...]                 # (1, D)
    u0 = u_scr[...]                  # (BC, D)
    z = mom_ref[0]                   # standard normals
    p = z * jax.lax.rsqrt(im)
    eps = jnp.exp(srow(_R_LOGEPS)) * ju_ref[0, 0:1, :].T   # (BC, 1)
    u01 = ju_ref[0, 1:2, :].T

    def grad(u):
        return bv - jnp.dot(u, lam, preferred_element_type=u.dtype,
                            precision=hi)

    def logp_of(u):
        return (-0.5 * jnp.sum(
            u * jnp.dot(u, lam, precision=hi), axis=-1, keepdims=True)
            + jnp.sum(u * bv, axis=-1, keepdims=True))

    def kin_of(p):
        return 0.5 * jnp.sum(im * p * p, axis=-1, keepdims=True)

    h0 = -logp_of(u0) + kin_of(p)

    def body(_, carry):
        u, p, g = carry
        p = p + 0.5 * eps * g
        u = u + eps * im * p
        g = grad(u)
        p = p + 0.5 * eps * g
        return (u, p, g)

    u, p, _ = jax.lax.fori_loop(0, num_steps, body, (u0, p, grad(u0)))
    delta_h = h0 - (-logp_of(u) + kin_of(p))
    divergent = jnp.logical_not(jnp.isfinite(delta_h)) | (delta_h < -1000.0)
    aprob = jnp.where(divergent, 0.0,
                      jnp.minimum(1.0, jnp.exp(jnp.minimum(delta_h, 0.0))))
    accept = u01 < aprob
    u_out = jnp.where(accept, u, u0)
    u_scr[...] = u_out

    mask = (jax.lax.broadcasted_iota(jnp.int32, aprob.shape, 0)
            < n_live).astype(dt)
    a_mean = jnp.sum(aprob * mask) / c_live

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
        n_new = n_w + c_live
        um = u_out * mask                       # pads zeroed
        b_mean = jnp.sum(um, axis=0, keepdims=True) / c_live
        b_m2 = jnp.sum(((u_out - b_mean) * mask) ** 2, axis=0,
                       keepdims=True)
        mean = mean_scr[...]
        delta = b_mean - mean
        mean_scr[...] = mean + delta * c_live / n_new
        m2_scr[...] = m2_scr[...] + b_m2 + delta * delta * n_w * c_live \
            / n_new
        wrow(_R_NW, n_new)

    @pl.when(t == nT - 1)
    def _():
        dcols = u_out.shape[-1]
        eps_row = jnp.full((1, dcols), jnp.exp(srow(_R_LOGEPSBAR)), dt)
        out_ref[...] = jnp.concatenate(
            [u_out, im_scr[...], eps_row,
             jnp.zeros((6, dcols), dt)], axis=0)


@functools.partial(jax.jit, static_argnames=(
    "num_warmup", "num_steps", "eps0", "target_accept", "interpret"))
def hmc_warmup_chunk(key, u0s, eps0, lam, b, num_warmup, num_steps,
                     target_accept=0.8, interpret=False):
    """The ENTIRE pooled warmup in ONE pallas_call at d >= 128 (all chains
    in one block — warmup writes no per-iteration outputs, so the block
    fits scoped VMEM where the sampler must tile chains). Returns
    (us (N, d), eps scalar, inv_mass (d,)). Same schedule/constants as
    adaptation.run_warmup_pooled; separate pre-drawn RNG stream."""
    from modppl_tpu.inference.adaptation import warmup_schedule

    n, d = u0s.shape
    dt = u0s.dtype
    dp = -(-d // _LANE) * _LANE
    npad = -(-n // 8) * 8
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
    mom = jax.random.normal(k_mom, (T, n, d), dt)
    epsj = jax.random.uniform(k_jit, (T, 1, n), dt, minval=0.5, maxval=1.5)
    u01 = jax.random.uniform(k_acc, (T, 1, n), dt)
    ju = jnp.concatenate([epsj, u01, jnp.zeros((T, 6, n), dt)], axis=1)
    ju = jnp.pad(ju, ((0, 0), (0, 0), (0, npad - n)))
    ju = ju.at[:, 1, n:].set(2.0)
    mom = jnp.pad(mom, ((0, 0), (0, npad - n), (0, dp - d)))
    u_p = _pad_to(_pad_to(u0s, npad, 0), dp, 1)
    lam_p = _pad_to(_pad_to(lam.astype(dt), dp, 0), dp, 1)
    b_p = _pad_to(b.astype(dt)[None, :], dp, 1)

    out = pl.pallas_call(
        functools.partial(_warmup_kernel_mxu, num_steps, n, float(eps0),
                          float(target_accept), tuple(boundaries)),
        grid=(T,),
        in_specs=[pl.BlockSpec((npad, dp), lambda t: (0, 0)),
                  pl.BlockSpec((1, npad, dp), lambda t: (t, 0, 0)),
                  pl.BlockSpec((1, 8, npad), lambda t: (t, 0, 0)),
                  pl.BlockSpec((dp, dp), lambda t: (0, 0)),
                  pl.BlockSpec((1, dp), lambda t: (0, 0))],
        out_specs=pl.BlockSpec((npad + 8, dp), lambda t: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((npad + 8, dp), dt),
        scratch_shapes=[pltpu.VMEM((npad, dp), dt),
                        pltpu.VMEM((8, _LANE), dt),
                        pltpu.VMEM((1, dp), dt),
                        pltpu.VMEM((1, dp), dt),
                        pltpu.VMEM((1, dp), dt)],
        # all chains live in one block (~2 MB each for u0/scratch/out plus
        # double-buffered streams) — past the default 16 MB scoped-VMEM
        # budget at 4096 chains, comfortably inside the chip's VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(u_p, mom, ju, lam_p, b_p)
    us = out[:n, :d]
    inv_mass = out[npad, :d]
    eps = out[npad + 1, 0]
    return us, eps, inv_mass


@functools.partial(jax.jit, static_argnames=(
    "num_samples", "num_steps", "interpret"))
def hmc_sample_chunk(key, u, eps, lam, b, inv_mass, num_samples, num_steps,
                     interpret=False):
    """All ``num_samples`` MXU-tiled HMC transitions in ONE pallas_call
    (d >= 128 quadratic targets; the VPU counterpart is
    leapfrog_vpu_pallas.hmc_sample_chunk_small). Returns
    (us (T, N, d), logps (T, N), aprobs (T, N), divs (T, N))."""
    n, d = u.shape
    dt = u.dtype
    dp = -(-d // _LANE) * _LANE
    bc = min(1024, -(-n // 8) * 8)
    npad = -(-n // bc) * bc
    T = num_samples

    k_mom, k_jit, k_acc = jax.random.split(key, 3)
    mom = jax.random.normal(k_mom, (T, n, d), dt) \
        / jnp.sqrt(inv_mass.astype(dt))[None, None, :]
    epsj = eps * jax.random.uniform(k_jit, (T, 1, n), dt,
                                    minval=0.5, maxval=1.5)
    u01 = jax.random.uniform(k_acc, (T, 1, n), dt)
    # pads: never accept, zero momenta -> padded chains stay at u0 pad (0)
    ju = jnp.concatenate(
        [epsj, u01, jnp.zeros((T, 6, n), dt)], axis=1)
    ju = jnp.pad(ju, ((0, 0), (0, 0), (0, npad - n)),
                 constant_values=0.0)
    ju = ju.at[:, 1, n:].set(2.0)
    mom = jnp.pad(mom, ((0, 0), (0, npad - n), (0, dp - d)))
    u_p = _pad_to(_pad_to(u, npad, 0), dp, 1)
    lam_p = _pad_to(_pad_to(lam.astype(dt), dp, 0), dp, 1)
    b_p = _pad_to(b.astype(dt)[None, :], dp, 1)
    im_p = _pad_to(inv_mass.astype(dt)[None, :], dp, 1)

    us, st = pl.pallas_call(
        functools.partial(_chunk_kernel_mxu, num_steps),
        grid=(npad // bc, T),
        in_specs=[pl.BlockSpec((bc, dp), lambda c, t: (c, 0)),
                  pl.BlockSpec((1, bc, dp), lambda c, t: (t, c, 0)),
                  pl.BlockSpec((1, 8, bc), lambda c, t: (t, 0, c)),
                  pl.BlockSpec((dp, dp), lambda c, t: (0, 0)),
                  pl.BlockSpec((1, dp), lambda c, t: (0, 0)),
                  pl.BlockSpec((1, dp), lambda c, t: (0, 0))],
        out_specs=[pl.BlockSpec((1, bc, dp), lambda c, t: (t, c, 0)),
                   pl.BlockSpec((1, 8, bc), lambda c, t: (t, 0, c))],
        out_shape=[jax.ShapeDtypeStruct((T, npad, dp), dt),
                   jax.ShapeDtypeStruct((T, 8, npad), dt)],
        scratch_shapes=[pltpu.VMEM((bc, dp), dt)],
        interpret=interpret,
    )(u_p, mom, ju, lam_p, b_p, im_p)
    return (us[:, :n, :d], st[:, 0, :n], st[:, 1, :n],
            st[:, 2, :n] > 0.5)


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
