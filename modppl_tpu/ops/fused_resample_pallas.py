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
1.0 and adding zeros is exact in f32) together with the ancestor index
itself (ids row, exact in f32 for N < 2^24). The contraction runs on the
MXU with the tiny state dimension on the sublane axis (8 rows), so the
matmul costs 8*W*B flops per W-wide slab instead of the 128-padded naive
(slots x rows) @ (rows x C) orientation.

Work per block of B output slots: the S entries covering its slot range —
located by one cheap vectorized searchsorted outside the kernel
(scalar-prefetch) — streamed in (8, W)-tile chunks (CH = 8*W entries) with
double-buffered DMA; every DMA moves a full sublane/lane-aligned tile
(Mosaic rejects sub-tile slices). Total ~ N*(B + W) lane-compares +
N*8*(1 + B/W) MXU flops. Results are bit-identical to the scatter+cumsum
formulation (same integer logic on the same S).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_B = 256        # output slots per grid step
_W = 256        # lane width of one A sub-row / one MXU contraction slab
_SUB = 8        # sublane rows per A-tile chunk
_CH = _SUB * _W  # S/state entries per DMA chunk (one full (8, W) tile)
_ROWS = 8       # sublane rows of ext: state components + id row, zero-padded

MAX_STATE_DIM = _ROWS - 1


@functools.partial(jax.jit, static_argnames=("n", "interpret"))
def _fused_gather(c, a_lo_pad, a_hi_pad, ext, n, interpret=False):
    """Core pallas_call. See systematic_resample_fused for the public API.

    Args:
      c: (NB+1,) int32 — c[b] = #{S < b*B} (block boundary ranks).
      a_lo_pad: (A_LEN // CH, SUB, W) int32, tile-major — A[p] = S[p-1]
        (A[0] = -1), padded with INT32_MAX. Entry p lives at
        [p // CH, (p % CH) // W, p % W]; every DMA moves one whole
        (SUB, W) = (8, 256) tile, keeping both the HBM slice and the VMEM
        destination aligned to the (8, 128) int32 tiling.
      a_hi_pad: same layout — A[p+1], same padding.
      ext: (8, A_LEN) f32 — [state rows; ancestor ids; zeros], zero-padded.
      n: static output slot count (multiple of B).
    Returns (8, n) f32: rows 0..C-1 = resampled state, row C = ancestor ids.
    """
    nb = n // _B

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        # DMA sources pinned to HBM: under ANY the compiler may park them in
        # VMEM, where sub-tile slices are rejected.
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM),
                  pl.BlockSpec(memory_space=pltpu.HBM),
                  pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec((_ROWS, _B), lambda b, c_ref: (0, b)),
        scratch_shapes=[
            pltpu.VMEM((2, _SUB, _W), jnp.int32),     # A[p] tiles (2 buffers)
            pltpu.VMEM((2, _SUB, _W), jnp.int32),     # A[p+1] tiles
            pltpu.VMEM((2, _ROWS, _CH), jnp.float32),  # ext slabs
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    def kernel(c_ref, alo_hbm, ahi_hbm, ext_hbm, out_ref,
               alo_vmem, ahi_vmem, e_vmem, alo_sem, ahi_sem, e_sem):
        b = pl.program_id(0)
        i0 = b * _B
        lo = c_ref[b]
        hi = c_ref[b + 1]
        # D rows needed: p in [lo, hi]; chunks are CH-aligned tile windows.
        k0 = lo // _CH
        num_chunks = hi // _CH - k0 + 1

        def copies(k, slot):
            chunk = k0 + k
            return (
                pltpu.make_async_copy(
                    alo_hbm.at[chunk], alo_vmem.at[slot], alo_sem.at[slot]),
                pltpu.make_async_copy(
                    ahi_hbm.at[chunk], ahi_vmem.at[slot], ahi_sem.at[slot]),
                pltpu.make_async_copy(
                    ext_hbm.at[:, pl.ds(chunk * _CH, _CH)], e_vmem.at[slot],
                    e_sem.at[slot]),
            )

        for cp in copies(0, 0):
            cp.start()

        i_c = i0 + jax.lax.broadcasted_iota(jnp.int32, (_B, 1), 0)  # (B, 1)

        def body(k, acc):
            slot = jax.lax.rem(k, jnp.int32(2))
            nxt = jax.lax.rem(k + jnp.int32(1), jnp.int32(2))

            @pl.when(k + 1 < num_chunks)
            def _():
                for cp in copies(k + 1, nxt):
                    cp.start()

            for cp in copies(k, slot):
                cp.wait()

            alo = alo_vmem[slot]                    # (SUB, W)
            ahi = ahi_vmem[slot]
            e = e_vmem[slot]                        # (ROWS, CH)
            # unrolled over the tile's SUB sub-rows: each is a W-wide slab
            for r in range(_SUB):
                t_lo = alo[r: r + 1, :] <= i_c      # (1, W) vs (B, 1) -> (B, W)
                t_hi = ahi[r: r + 1, :] <= i_c
                d = (t_lo & jnp.logical_not(t_hi)).astype(jnp.float32)
                # (ROWS, W) x (B, W) contracting on W (A @ B^T form) on the
                # MXU; exact: one nonzero per output column. Precision
                # HIGHEST is load-bearing — the TPU default runs f32 dots as
                # one bf16 pass, which silently truncates the copied state
                # mantissas (measured: ancestor ids quantized to multiples
                # of 4 at N=2^20); full-precision passes keep the one-hot
                # copy bitwise exact.
                acc = acc + jax.lax.dot_general(
                    e[:, r * _W: (r + 1) * _W], d, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
            return acc

        acc = jax.lax.fori_loop(
            0, num_chunks, body, jnp.zeros((_ROWS, _B), jnp.float32))
        out_ref[...] = acc

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((_ROWS, n), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(c, a_lo_pad, a_hi_pad, ext)


def systematic_resample_fused(key, log_normalized_weights, state_t,
                              interpret=False):
    """Systematic resampling with fused ancestor + state gather.

    Args:
      key: PRNG key for the single stratification uniform.
      log_normalized_weights: (N,) with N % 256 == 0.
      state_t: (C, N) transposed particle state, C <= 7, float32.
    Returns:
      (new_state_t (C, N) f32, parents (N,) int32) — parents bit-identical
      to parallel.resample.systematic_parents; state copies bitwise exact.
    """
    n = log_normalized_weights.shape[0]
    C = state_t.shape[0]
    assert n % _B == 0, f"fused resample: N={n} must be a multiple of {_B}"
    assert C <= MAX_STATE_DIM, f"fused resample: state dim {C} > {MAX_STATE_DIM}"

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
    state_cols = jnp.concatenate(
        [state_t.astype(jnp.float32), state_t[:, -1:].astype(jnp.float32)],
        axis=1)                                                   # (C, N+1)
    ext = jnp.zeros((_ROWS, a_len), jnp.float32)
    ext = ext.at[:C, : n + 1].set(state_cols)
    ext = ext.at[C, : n + 1].set(ids.astype(jnp.float32))

    out = _fused_gather(c, a_lo, a_hi, ext, n, interpret=interpret)
    new_state_t = out[:C]
    parents = out[C].astype(jnp.int32)
    return new_state_t, parents
