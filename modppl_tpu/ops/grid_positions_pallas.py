"""Pallas TPU kernels: blocked systematic-resampling grid positions.

VERDICT r3 #3 ("blocked Pallas cumsum for the CDF; fold the
normalize+ceil+cummax prep into kernels"). The XLA formulation of the
layout-invariant CDF (parallel/sharded_smc._det_grid_positions) materializes
every Hillis-Steele level to HBM — 10 pad+add passes over the weight vector
plus a reduce-window cummax, ~0.6 ms/step at N = 2^20 on a v5e. These two
kernels keep each 1024-wide block in VMEM across all scan levels:

- ``stats_cumsum``: rows of exp(lw − m) are prefix-summed IN REGISTER
  (shift-add levels never touch HBM) and per-block Σe, Σe² emitted — one
  read + one write of the vector instead of ~20 passes.
- ``positions_cummax``: applies the replicated block offsets, the
  normalize+ceil quantization, and the in-block integer cummax, emitting
  per-block maxima for the (tiny, replicated) cross-block repair.

Both compute the SAME fixed add structure per 1024-block as the XLA
fallback, so a TPU dp=1 and dp=8 run still agree bitwise (each shard's rows
are whole blocks); the CPU fallback keeps its own internally-consistent
pair. Block width is pinned to 1024 (= _cdf_block(N) for N >= 2^16).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_BW = 1024    # block width (must equal parallel.sharded_smc._cdf_block(N))
_ROWS = 256   # blocks processed per grid step (256 KiB tiles in VMEM)


def _shift_add_scan(x, op, fill):
    """Hillis-Steele inclusive scan along the last axis, in register.

    The shift is a slice + concat (Mosaic rejects negative lax.pad edges);
    each level stays in VMEM/vregs — nothing round-trips HBM."""
    n = x.shape[-1]
    lead = x.shape[:-1]
    k = 1
    while k < n:
        pad = jnp.full(lead + (k,), fill, x.dtype)
        shifted = jnp.concatenate([pad, x[..., : n - k]], axis=-1)
        x = op(x, shifted)
        k *= 2
    return x


def _stats_kernel(lw_ref, m_ref, cum_ref, tot_ref, sqtot_ref):
    lw = lw_ref[...]                       # (R, BW)
    e = jnp.exp(lw - m_ref[0, 0])
    cum = _shift_add_scan(e, jnp.add, 0.0)
    cum_ref[...] = cum
    tot_ref[...] = cum[:, -1:]
    sqtot_ref[...] = jnp.sum(e * e, axis=-1, keepdims=True)


@functools.partial(jax.jit, static_argnames=("interpret",))
def stats_cumsum(lw_rows, m, interpret=False):
    """Per-block inclusive cumsum of e = exp(lw − m), Σe, Σe².

    Args: lw_rows (nb, 1024) f32; m scalar (global max of lw).
    Returns (cum (nb, 1024), totals (nb,), sq_totals (nb,)).
    """
    nb, bw = lw_rows.shape
    assert bw == _BW, bw
    rows = min(_ROWS, nb)
    assert nb % rows == 0, (nb, rows)
    cum, tot, sqtot = pl.pallas_call(
        _stats_kernel,
        grid=(nb // rows,),
        in_specs=[pl.BlockSpec((rows, bw), lambda b: (b, 0)),
                  pl.BlockSpec((1, 1), lambda b: (0, 0))],
        out_specs=[pl.BlockSpec((rows, bw), lambda b: (b, 0)),
                   pl.BlockSpec((rows, 1), lambda b: (b, 0)),
                   pl.BlockSpec((rows, 1), lambda b: (b, 0))],
        out_shape=[jax.ShapeDtypeStruct((nb, bw), jnp.float32),
                   jax.ShapeDtypeStruct((nb, 1), jnp.float32),
                   jax.ShapeDtypeStruct((nb, 1), jnp.float32)],
        interpret=interpret,
    )(lw_rows, m.reshape(1, 1))
    return cum, tot[:, 0], sqtot[:, 0]


def _positions_kernel(n, cum_ref, offs_ref, scal_ref, s_ref, mx_ref):
    cum = cum_ref[...]                     # (R, BW)
    offs = offs_ref[...]                   # (R, 1)
    total = scal_ref[0, 0]
    u = scal_ref[0, 1]
    cdf = cum + offs
    s = jnp.ceil((cdf / total) * n - u)
    s = jnp.clip(s, 0.0, n).astype(jnp.int32)
    s = _shift_add_scan(s, jnp.maximum, jnp.iinfo(jnp.int32).min)
    s_ref[...] = s
    mx_ref[...] = s[:, -1:]


@functools.partial(jax.jit, static_argnames=("num_particles", "interpret"))
def positions_cummax(cum, offs, total, u, num_particles, interpret=False):
    """S = cummax_within_block(clip(ceil(N·cdf − u))) + per-block maxima.

    Args: cum (nb, 1024) in-block cumsums; offs (nb,) exclusive block
    offsets; total, u scalars. Returns (s_rows (nb, 1024) int32 — cross-
    block cummax NOT yet applied, mx (nb,) int32 block maxima).
    """
    nb, bw = cum.shape
    assert bw == _BW, bw
    rows = min(_ROWS, nb)
    # mirror of stats_cumsum's divisibility contract (ADVICE r4): without
    # it a non-dividing nb would silently compute only nb // rows grid
    # steps' worth of positions
    assert nb % rows == 0, (nb, rows)
    scal = jnp.stack([jnp.asarray(total, jnp.float32),
                      jnp.asarray(u, jnp.float32)]).reshape(1, 2)
    s, mx = pl.pallas_call(
        functools.partial(_positions_kernel, float(num_particles)),
        grid=(nb // rows,),
        in_specs=[pl.BlockSpec((rows, bw), lambda b: (b, 0)),
                  pl.BlockSpec((rows, 1), lambda b: (b, 0)),
                  pl.BlockSpec((1, 2), lambda b: (0, 0))],
        out_specs=[pl.BlockSpec((rows, bw), lambda b: (b, 0)),
                   pl.BlockSpec((rows, 1), lambda b: (b, 0))],
        out_shape=[jax.ShapeDtypeStruct((nb, bw), jnp.int32),
                   jax.ShapeDtypeStruct((nb, 1), jnp.int32)],
        interpret=interpret,
    )(cum, offs.reshape(nb, 1), scal)
    return s, mx[:, 0]
