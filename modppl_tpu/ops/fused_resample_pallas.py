"""Pallas TPU kernel: fused systematic resampling (ancestors + gather).

The two expensive ops of a compiled resampling step at N ~ 10^6 are both
scalar-core-bound on TPU (profiled on a v5e):

- the XLA scatter-add in the ancestor computation (~9 ms), and
- the (N, C) row-gather that clones the selected particles (~5 ms at C=2 —
  each tiny row becomes a scalar-core descriptor; ~1.5 GB/s effective).

This kernel computes both in one pass on the VPU + MXU. Systematic
resampling gives *sorted* first-child slot positions

    S_j = ceil(N * cdf_j - u)   (non-decreasing, in [0, N])

so with A[p] = S[p-1] (A[0] = -1), the ancestor of output slot i is the
unique p with A[p] <= i < A[p+1]. The indicator matrix

    D[p, i] = [A[p] <= i] - [A[p+1] <= i]   (difference of two ramps)

is exactly one-hot per column, and

    [state_T; ids] @ D

yields, per output slot, a **bitwise-exact** copy of the ancestor's state
rows (one nonzero term per column — no accumulation error; multiplying by
1.0 and adding zeros is exact) together with the ancestor index itself
(ids row, exact for N < 2^24).

Work per block of B output slots: only the S entries covering its slot
range — located by one vectorized searchsorted outside the kernel
(scalar-prefetch) — streamed in (8, W)-tile chunks with double-buffered
DMA (Mosaic rejects sub-tile DMA slices, so transfers stay whole-tile),
then reduced **sub-row by sub-row over the live range only**: a
dynamic-trip ``fori_loop`` from the first to the last (1, W) sub-row that
intersects [c[b], c[b+1]] skips the ~3/4 of each streamed tile that no
slot in the block can match (round 2 processed every sub-row; an unrolled
``pl.when`` variant was reverted for Mosaic compile-time blowup).

Contraction modes (both bitwise-exact, selected at trace time):

- ``bf16`` (state dim C <= 4, opt-in via MODPPL_FUSED_RESAMPLE_BF16;
  measured slightly slower end-to-end than f32 HIGHEST at N=2^20 on a v5e
  — the split prep outweighs the dot saving once dead sub-rows are
  skipped — kept for wider-state / MXU-bound regimes): each f32 row is
  split into
  three bf16 rows (hi = bf16(x), mid = bf16(x - hi), lo = x - hi - mid)
  whose sum reconstructs x exactly — bf16 has an 8-bit mantissa, so three
  parts cover all 24 f32 mantissa bits, and every partial sum is exactly
  representable. The one-hot contraction then runs as ONE native bf16 MXU
  pass with f32 accumulation (one nonzero per column keeps each part
  exact), 6x less MXU work than the f32 HIGHEST mode below. Requires
  finite state values (an infinite row would make x - hi NaN); particle
  states are finite by construction, and the plain-XLA fallback remains
  available via MODPPL_DISABLE_FUSED_RESAMPLE.
- ``f32``: f32 dots at
  Precision.HIGHEST — the TPU default f32 dot is a single bf16 pass that
  silently truncates mantissas (measured: ancestor ids quantized to
  multiples of 4 at N=2^20).
- ``bf16k`` (round 4): the 3-way split computed IN-KERNEL per streamed
  tile, three single-pass bf16 dots — half of f32's MXU passes, no HBM
  prep.
- ``bf16p`` (round 4, the default for C <= 10): packed pre-split rows
  [3C parts; lane-iota; ones] — ONE bf16 dot per sub-row yields the state
  copies and the ancestor ids (lane + rowbase*hit accumulation, exact in
  f32 for N < 2^24): a third of bf16k's passes.

Results are bit-identical to the scatter+cumsum formulation
(parallel/resample.py) — same integer logic on the same S.
"""

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_B = 256        # output slots per grid step
_W = 128        # lane width of one A sub-row / one MXU contraction slab
_SUB = 8        # sublane rows per A-tile chunk
_CH = _SUB * _W  # S/state entries per DMA chunk (one full (8, W) int32 tile)
# round-4 sweep on a v5e at N = 2^20, bf16k mode (ms/filter, 10-step
# spiral): (B=256,W=128) 36.8 | (256,256) 38.8 | (512,256) 41.2 |
# (512,128) 40.5 | (128,128) 43.2 | (256,512) 44.8 | (1024,256) 51.9.
# MXU work per output slot scales ~(B + W)·rows, so the smallest W whose
# (8, W) int32 tile is still a native Mosaic tile (W = 128) wins; B below
# 256 loses to per-block fixed cost.

# f32/bf16k modes: ext rows = ceil((C + 1)/8)*8 sublanes, multi-slab up to
# 4 (VERDICT r3 #4 — mvnormal/LGSSM-class states routinely exceed 7 f32
# lanes; the contraction just grows sublane tiles, reusing the same D
# compares per sub-row)
MAX_STATE_DIM = 31
MAX_STATE_DIM_PACKED = 10  # bf16p: 3C + 2 rows <= 32 sublanes
MAX_STATE_DIM_BF16 = 4     # legacy pre-split bf16 mode: 3*(C+1) <= 16


@functools.partial(jax.jit, static_argnames=(
    "n", "rows", "mode", "ones_idx", "interpret"))
def _fused_gather(c, a_lo_pad, a_hi_pad, ext, n, rows, mode, ones_idx=None,
                  interpret=False):
    """Core pallas_call. See systematic_resample_fused for the public API.

    Args:
      c: (NB+1,) int32 — c[b] = #{S < b*B} (block boundary ranks).
      a_lo_pad: (A_LEN // CH, SUB, W) int32, tile-major — A[p] = S[p-1]
        (A[0] = -1), padded with INT32_MAX. Entry p lives at
        [p // CH, (p % CH) // W, p % W]; every DMA moves one whole
        (SUB, W) = (8, 128) tile, keeping both the HBM slice and the VMEM
        destination aligned to the native int32 tiling.
      a_hi_pad: same layout — A[p+1], same padding.
      ext: (rows, A_LEN) — f32 [state rows; ancestor ids; zeros] (f32 /
        bf16k modes) or bf16 [hi parts; mid parts; lo parts; zeros]
        (legacy pre-split bf16 mode).
      n: static output slot count (multiple of B).
      rows: sublane height of ext (f32/bf16k: ceil((C+1)/8)*8; bf16: 16).
      mode: contraction mode, all bitwise-exact —
        - "f32": 6-pass f32 HIGHEST dot (the TPU default f32 dot is one
          mantissa-truncating bf16 pass; Precision.HIGH's 3-pass bf16x3 is
          measured NOT bit-exact for one-hot copies either);
        - "bf16k": IN-KERNEL exact 3-way bf16 split (hi/mid/lo bit-chop of
          each streamed f32 tile on the VPU) + three single-pass bf16 dots
          with f32 accumulation — half the MXU passes of "f32" with none
          of the legacy mode's HBM-side prep (round 3's measured loss);
        - "bf16": legacy pre-split rows (kept for the record);
        - "bf16p": PACKED pre-split bf16 — ext rows are [3C split parts;
          lane-iota row (p % W, exact: < W <= 256 in bf16); ones row], so
          ONE bf16 dot per sub-row yields the state parts, the in-window
          lane position of each slot's ancestor, and a hit indicator; the
          kernel accumulates ancestor ids as lane + rowbase·hit (rowbase
          is a per-sub-row scalar, exact in f32 for N < 2^24). A third of
          bf16k's MXU passes — the one dot covers state AND ids.
    Returns (rows, n) f32 — the contraction output, parts not yet summed
    (f32/bf16k return recombined rows; bf16p's ones row is replaced by the
    accumulated rowbase term — parents = lane row + that row).
    """
    nb = n // _B
    e_dtype = jnp.bfloat16 if mode in ("bf16", "bf16p") else jnp.float32

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb,),
        # DMA sources pinned to HBM: under ANY the compiler may park them in
        # VMEM, where sub-tile slices are rejected.
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM),
                  pl.BlockSpec(memory_space=pltpu.HBM),
                  pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec((rows, _B), lambda b, c_ref, seq_ref: (0, b)),
        scratch_shapes=[
            pltpu.VMEM((2, _SUB, _W), jnp.int32),     # A[p] tiles (2 buffers)
            pltpu.VMEM((2, _SUB, _W), jnp.int32),     # A[p+1] tiles
            pltpu.VMEM((2, rows, _CH), e_dtype),      # ext slabs
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    def kernel(c_ref, seq_ref, alo_hbm, ahi_hbm, ext_hbm, out_ref,
               alo_vmem, ahi_vmem, e_vmem, alo_sem, ahi_sem, e_sem):
        b = pl.program_id(0)
        nb_ = pl.num_programs(0)
        i0 = b * _B
        lo = c_ref[b]
        hi = c_ref[b + 1]
        # D rows needed: p in [lo, hi]; chunks are CH-aligned tile windows.
        k0 = lo // _CH
        num_chunks = hi // _CH - k0 + 1
        # global chunk sequence number: DMA slots alternate ACROSS blocks,
        # so each block's first chunk is prefetched by its predecessor and
        # the ~1 us HBM latency never sits on the per-block critical path
        # (round-3 profile: 4096 serialized first-chunk DMAs were the
        # dominant kernel cost at ~800 ns/block).
        seq0 = seq_ref[b]

        def copies(chunk, slot):
            return (
                pltpu.make_async_copy(
                    alo_hbm.at[chunk], alo_vmem.at[slot], alo_sem.at[slot]),
                pltpu.make_async_copy(
                    ahi_hbm.at[chunk], ahi_vmem.at[slot], ahi_sem.at[slot]),
                pltpu.make_async_copy(
                    ext_hbm.at[:, pl.ds(chunk * _CH, _CH)], e_vmem.at[slot],
                    e_sem.at[slot]),
            )

        @pl.when(b == 0)
        def _():
            for cp in copies(k0, 0):        # seq 0 -> slot 0
                cp.start()

        i_c = i0 + jax.lax.broadcasted_iota(jnp.int32, (_B, 1), 0)  # (B, 1)

        def body(k, acc):
            seq = seq0 + k
            slot = jax.lax.rem(seq, jnp.int32(2))
            nslot = jax.lax.rem(seq + jnp.int32(1), jnp.int32(2))

            # prefetch the next chunk in the GLOBAL sequence: the
            # within-block successor, or the next block's first chunk
            # (which may re-fetch the same chunk when a boundary entry is
            # shared; the final prefetch reads the padded spare chunk)
            nxt_chunk = jnp.where(k + 1 < num_chunks, k0 + k + 1,
                                  c_ref[b + 1] // _CH)
            for cp in copies(nxt_chunk, nslot):
                cp.start()

            for cp in copies(k0 + k, slot):
                cp.wait()

            # live sub-row range of this chunk: entries outside [lo, hi]
            # have a one-hot row that is identically zero for every slot of
            # this block, so their compares + dot are skipped entirely.
            base = (k0 + k) * _CH
            r_lo = jnp.clip((lo - base) // _W, 0, _SUB - 1)
            r_hi = jnp.clip((hi - base) // _W, 0, _SUB - 1)

            def sub_row(r, acc):
                alo = alo_vmem[slot, pl.ds(r, 1), :]    # (1, W)
                ahi = ahi_vmem[slot, pl.ds(r, 1), :]
                t_lo = alo <= i_c                       # (1,W) vs (B,1)->(B,W)
                t_hi = ahi <= i_c
                d = (t_lo & jnp.logical_not(t_hi)).astype(e_dtype)
                e = e_vmem[slot, :, pl.ds(r * _W, _W)]  # (rows, W)
                # (rows, W) x (B, W) contracting on W (A @ B^T form) on the
                # MXU; exact: one nonzero per output column.
                if mode == "bf16p":
                    acc_mat, acc_base = acc
                    out = jax.lax.dot_general(
                        e, d, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    # ancestor id = in-window lane + rowbase * hit; the
                    # ones row (index ones_idx) carries the hit indicator
                    rowbase = ((k0 + k) * _CH + r * _W).astype(jnp.float32)
                    base_term = rowbase * out[ones_idx:ones_idx + 1, :]
                    return acc_mat + out, acc_base + base_term
                if mode == "bf16k":
                    # exact in-kernel 3-way split (see _split3): bit-chop
                    # the f32 tile into hi/mid/lo bf16 parts on the VPU,
                    # then three SINGLE-pass bf16 dots with f32
                    # accumulation — each part copies exactly (one nonzero
                    # per column), so hi+mid+lo reconstructs every f32 bit
                    mask = jnp.uint32(0xFFFF0000)
                    xb = jax.lax.bitcast_convert_type(e, jnp.uint32)
                    hi_p = jax.lax.bitcast_convert_type(xb & mask,
                                                        jnp.float32)
                    r1 = e - hi_p
                    r1b = jax.lax.bitcast_convert_type(r1, jnp.uint32)
                    mid_p = jax.lax.bitcast_convert_type(r1b & mask,
                                                         jnp.float32)
                    lo_p = r1 - mid_p
                    db = d.astype(jnp.bfloat16)
                    parts = [
                        jax.lax.dot_general(
                            p.astype(jnp.bfloat16), db,
                            (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
                        for p in (hi_p, mid_p, lo_p)]
                    # exact recombination: each part arrives exact and
                    # hi+mid, (hi+mid)+lo are exactly representable
                    return acc + ((parts[0] + parts[1]) + parts[2])
                if mode == "bf16":
                    return acc + jax.lax.dot_general(
                        e, d, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                # f32: HIGHEST is load-bearing (default f32 dot = one
                # truncating bf16 pass)
                return acc + jax.lax.dot_general(
                    e, d, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)

            return jax.lax.fori_loop(r_lo, r_hi + 1, sub_row, acc)

        acc0 = jnp.zeros((rows, _B), jnp.float32)
        if mode == "bf16p":
            acc0 = (acc0, jnp.zeros((1, _B), jnp.float32))
        acc = jax.lax.fori_loop(0, num_chunks, body, acc0)
        if mode == "bf16p":
            acc_mat, acc_base = acc
            out_ref[...] = acc_mat
            # the ones row's raw total (== 1 for every slot) is useless;
            # overwrite it with the accumulated rowbase term so parents =
            # lane row + this row on the host side
            out_ref[pl.ds(ones_idx, 1), :] = acc_base
        else:
            out_ref[...] = acc

        @pl.when(b == nb_ - 1)
        def _():
            # drain the dangling final prefetch (nobody consumes it)
            for cp in copies(hi // _CH,
                             jax.lax.rem(seq0 + num_chunks, jnp.int32(2))):
                cp.wait()

    # global chunk-sequence prefix: seq0[b] = total chunks of blocks < b
    k0s = c[:-1] // _CH
    nchunks = c[1:] // _CH - k0s + 1
    seq0 = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                            jnp.cumsum(nchunks, dtype=jnp.int32)])
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rows, n), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(c, seq0, a_lo_pad, a_hi_pad, ext)


def _split3(x):
    """Exact 3-way bf16 split: x == hi + mid + lo with every partial sum
    representable (8 mantissa bits per part cover f32's 24). Finite x only.

    The parts are carved by *bit-masking* the low 16 bits (truncation), not
    by f32->bf16->f32 round-trips: XLA's allow-excess-precision pass (on by
    default on TPU) elides a demote/promote pair, which silently turns
    ``x - f32(bf16(x))`` into ``x - x`` (measured: mid == lo == 0 on a
    v5e). A truncated hi has zero low bits, so the final bf16 conversions
    are exact bit-chops, and each residual is exactly representable.
    """
    mask = jnp.uint32(0xFFFF0000)
    xb = jax.lax.bitcast_convert_type(x, jnp.uint32)
    hi = jax.lax.bitcast_convert_type(xb & mask, jnp.float32)
    r1 = x - hi
    r1b = jax.lax.bitcast_convert_type(r1, jnp.uint32)
    mid = jax.lax.bitcast_convert_type(r1b & mask, jnp.float32)
    lo = r1 - mid
    return (hi.astype(jnp.bfloat16), mid.astype(jnp.bfloat16),
            lo.astype(jnp.bfloat16))


def systematic_resample_fused(key, log_normalized_weights, state_t,
                              interpret=False):
    """Systematic resampling with fused ancestor + state gather.

    Args:
      key: PRNG key for the single stratification uniform.
      log_normalized_weights: (N,) with N % 256 == 0.
      state_t: (C, N) transposed particle state, C <= MAX_STATE_DIM (31),
        float32, finite.
    Returns:
      (new_state_t (C, N) f32, parents (N,) int32) — parents bit-identical
      to parallel.resample.systematic_parents; state copies bitwise exact.
    """
    n = log_normalized_weights.shape[0]
    u = jax.random.uniform(key, (), log_normalized_weights.dtype)
    cdf = jnp.cumsum(jnp.exp(log_normalized_weights))
    cdf = cdf / cdf[-1]
    s = jnp.clip(jnp.ceil(cdf * n - u), 0, n).astype(jnp.int32)
    # XLA's parallel-prefix f32 cumsum is NOT monotone (different prefixes
    # round through different summation trees), so s can locally invert by
    # one slot — which breaks the one-hot interval property (a slot gets two
    # ancestors). Exact integer cummax repairs sortedness; applied in every
    # systematic-resampling formulation so they stay bit-identical.
    s = jax.lax.cummax(s)
    return resample_fused_from_s(s, state_t, interpret=interpret)


def resample_fused_from_s(s, state_t, interpret=False):
    """Fused ancestor + gather from a precomputed sorted slot-position
    vector S (= cummax(ceil(N·cdf − u))). Entry point for callers that
    compute S with their own (e.g. layout-invariant, parallel/
    sharded_smc._det_grid_positions) CDF algorithm.

    Args: s (N,) int32 sorted in [0, N]; state_t (C, N) f32.
    Returns (new_state_t, parents) — exact integer/copy semantics of the
    scatter+cumsum fallback on the same S.
    """
    n = s.shape[0]
    C = state_t.shape[0]
    assert n % _B == 0, f"fused resample: N={n} must be a multiple of {_B}"
    assert C <= MAX_STATE_DIM, f"fused resample: state dim {C} > {MAX_STATE_DIM}"
    # default mode: in-kernel exact bf16 split ("bf16k") — half the MXU
    # passes of 6-pass f32 HIGHEST with no HBM-side prep; measured
    # bit-identical to the f32 mode and the XLA fallback on a v5e.
    # MODPPL_FUSED_RESAMPLE_MODE=f32 restores the round-3 default;
    # MODPPL_FUSED_RESAMPLE_BF16 keeps selecting the legacy pre-split mode.
    if (C <= MAX_STATE_DIM_BF16
            and bool(os.environ.get("MODPPL_FUSED_RESAMPLE_BF16"))):
        mode = "bf16"
    else:
        default = "bf16p" if C <= MAX_STATE_DIM_PACKED else "bf16k"
        mode = os.environ.get("MODPPL_FUSED_RESAMPLE_MODE", default)
        if mode == "bf16p" and C > MAX_STATE_DIM_PACKED:
            mode = "bf16k"
    if mode not in ("f32", "bf16", "bf16k", "bf16p"):
        raise ValueError(f"unknown fused-resample mode {mode!r}")
    if mode == "bf16" and C > MAX_STATE_DIM_BF16:
        # per-mode width cap enforced at resolve time (ADVICE r4): the
        # legacy pre-split layout holds 3 split parts + lane row in a
        # 16-row buffer, so C > 4 would fail later with an opaque shape
        # error inside the kernel
        raise ValueError(
            f"fused-resample mode 'bf16' supports state dim <= "
            f"{MAX_STATE_DIM_BF16} (got {C}); use mode 'bf16k' or 'bf16p'")
    if mode == "bf16":
        rows = 16
    elif mode == "bf16p":
        # 3C split parts + lane row + ones row, padded to whole (16, 128)
        # bf16 tiles (a (8, W) bf16 operand occupies a full tile anyway)
        rows = -(-(3 * C + 2) // 16) * 16
    else:
        rows = max(8, -(-(C + 1) // 8) * 8)

    nb = n // _B
    boundaries = jnp.arange(nb + 1, dtype=jnp.int32) * _B
    c = jnp.searchsorted(s, boundaries, side="left").astype(jnp.int32)

    imax = jnp.iinfo(jnp.int32).max
    # room for n+1 entries plus one full spare chunk, rounded to whole tiles
    a_len = ((n + 1 + _CH - 1) // _CH) * _CH + _CH
    # A[p] = S[p-1] with A[0] = -1; A[p+1] = S[p] (pad: +inf)
    a_lo = jnp.full((a_len,), imax, jnp.int32)
    a_lo = (a_lo.at[0].set(-1).at[1: n + 1].set(s)
            .reshape(a_len // _CH, _SUB, _W))
    a_hi = jnp.full((a_len,), imax, jnp.int32)
    a_hi = a_hi.at[:n].set(s).reshape(a_len // _CH, _SUB, _W)

    # ext column p: state of ancestor min(p, n-1) + the id itself
    ids = jnp.minimum(jnp.arange(n + 1, dtype=jnp.int32), n - 1)
    logical = jnp.concatenate(
        [state_t.astype(jnp.float32), state_t[:, -1:].astype(jnp.float32)],
        axis=1)                                                   # (C, N+1)
    logical = jnp.concatenate(
        [logical, ids.astype(jnp.float32)[None, :]], axis=0)      # (C+1, N+1)
    D = C + 1
    ones_idx = None
    if mode == "bf16":
        hi_p, mid_p, lo_p = _split3(logical)
        parts = jnp.concatenate([hi_p, mid_p, lo_p], axis=0)      # (3D, N+1)
        ext = jnp.zeros((rows, a_len), jnp.bfloat16)
        ext = ext.at[: 3 * D, : n + 1].set(parts)
    elif mode == "bf16p":
        # state parts only — ids come from the lane/ones rows + in-kernel
        # rowbase accumulation (exact: lane < W <= 256 in bf16, rowbase
        # and totals exact in f32 for N < 2^24)
        state_cols = logical[:C]                                  # (C, N+1)
        hi_p, mid_p, lo_p = _split3(state_cols)
        parts = jnp.concatenate([hi_p, mid_p, lo_p], axis=0)      # (3C, N+1)
        ext = jnp.zeros((rows, a_len), jnp.bfloat16)
        ext = ext.at[: 3 * C, : n + 1].set(parts)
        lane = (jnp.arange(a_len, dtype=jnp.int32) % _W).astype(
            jnp.bfloat16)
        ext = ext.at[3 * C].set(lane)
        ext = ext.at[3 * C + 1].set(jnp.ones((a_len,), jnp.bfloat16))
        ones_idx = 3 * C + 1
    else:
        ext = jnp.zeros((rows, a_len), jnp.float32)
        ext = ext.at[:D, : n + 1].set(logical)

    out = _fused_gather(c, a_lo, a_hi, ext, n, rows, mode,
                        ones_idx=ones_idx, interpret=interpret)
    if mode == "bf16":
        # exact recombination: each part arrives exact (one-hot copy), and
        # hi + mid and (hi + mid) + lo are exactly representable f32 sums.
        out = out[:D] + out[D: 2 * D] + out[2 * D: 3 * D]
    if mode == "bf16p":
        new_state_t = out[:C] + out[C: 2 * C] + out[2 * C: 3 * C]
        parents = jnp.clip(
            (out[3 * C] + out[3 * C + 1]).astype(jnp.int32), 0, n - 1)
        return new_state_t, parents
    new_state_t = out[:C]
    parents = out[C].astype(jnp.int32)
    return new_state_t, parents
