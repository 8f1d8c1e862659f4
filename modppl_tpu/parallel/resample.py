"""Vectorized resampling kernels.

TPU-native replacement for the reference's scalar multinomial resampling loop
(modppl/src/inference/particle_filter.rs:37-41 driving the inverse-CDF scan
at categorical.rs:24-31): ancestor indices are computed with one
cumulative-sum + one scatter + one cumulative-sum — all O(N) single-pass VPU
ops — and the "clone the selected traces" loop (particle_filter.rs:109-114)
becomes a single index-gather over the batched trace pytree's leaves.

Why not searchsorted: binary search over N particles costs log2(N) dependent
random-access gather passes (~20 for 10^6 particles) — measured 13x slower
than the scatter+cumsum form on a v5e chip. For the *uniform grid* of
systematic positions the inverse map is closed-form:

    S_j   = ceil(N * cdf_j - u)        # first grid position index > cdf_j
    z[s]  = #{j : S_j == s}            # one scatter-add
    a[i]  = #{j : S_j <= i} = cumsum(z)[i]   # = parent of grid position i

Systematic resampling (stratified, single-uniform) is the default for the
compiled tier: lower variance than multinomial and — because it consumes a
single uniform — the natural basis for bitwise-deterministic distributed
resampling (see parallel/distributed.py).
"""

import jax
import jax.numpy as jnp


def _normalized_cdf(log_normalized_weights):
    cdf = jnp.cumsum(jnp.exp(log_normalized_weights))
    return cdf / cdf[-1]


def _grid_parents(cdf, u, num):
    """Ancestors of the position grid (u + arange(num))/num via scatter+cumsum."""
    n_in = cdf.shape[0]
    s = jnp.ceil(cdf * num - u).astype(jnp.int32)
    s = jnp.clip(s, 0, num)
    # monotonicity repair: XLA's parallel-prefix f32 cumsum can locally
    # invert cdf, and the Pallas formulations of the same grid inverse
    # (ops/resample_pallas.py, ops/fused_resample_pallas.py) require sorted
    # S; the integer cummax is exact and keeps all three bit-identical.
    s = jax.lax.cummax(s)
    z = jnp.zeros(num + 1, jnp.int32).at[s].add(1)
    parents = jnp.cumsum(z[:num])
    return jnp.clip(parents, 0, n_in - 1)


def systematic_parents(key, log_normalized_weights, num=None):
    """Systematic (stratified, single-uniform) ancestors.

    positions_i = (u + i)/num against the weight CDF; deterministic given
    (key, weights) and invariant to particle-axis sharding layout.

    On TPU with num % 1024 == 0 the rank computation runs in a Pallas kernel
    (ops/resample_pallas.py) — bit-identical to the XLA scatter formulation
    and ~6x faster (the scatter serializes on the TPU scalar core).
    """
    import os

    n_in = log_normalized_weights.shape[0]
    n = num if num is not None else n_in
    if (jax.default_backend() == "tpu" and n % 1024 == 0
            and not os.environ.get("MODPPL_DISABLE_PALLAS_RESAMPLE")):
        from modppl_tpu.ops.resample_pallas import systematic_parents_pallas
        return systematic_parents_pallas(key, log_normalized_weights, num=n)
    u = jax.random.uniform(key, (), log_normalized_weights.dtype)
    return _grid_parents(_normalized_cdf(log_normalized_weights), u, n)


def multinomial_parents(key, log_normalized_weights, num=None):
    """IID categorical ancestors (reference semantics, particle_filter.rs:37-41).

    Uses sorted-uniform inversion: iid uniforms are sorted in O(N log N) and
    inverted against the CDF with the same O(N) grid trick (the sorted
    sample of N uniforms is distributionally a jittered grid), avoiding both
    an N x N Gumbel matrix and per-draw binary searches. Ancestors come out
    sorted; exchangeability of the particle system makes that immaterial.
    """
    n_in = log_normalized_weights.shape[0]
    n = num if num is not None else n_in
    cdf = _normalized_cdf(log_normalized_weights)
    us = jnp.sort(jax.random.uniform(key, (n,), log_normalized_weights.dtype))
    # parent[i] = #{j : cdf_j < us_i}: scatter each cdf_j into the sorted-u
    # grid via searchsorted on the *uniforms* — both arrays sorted, so one
    # searchsorted of cdf (size N) into us (size n) suffices.
    s = jnp.searchsorted(us, cdf, side="left").astype(jnp.int32)
    z = jnp.zeros(n + 1, jnp.int32).at[jnp.clip(s, 0, n)].add(1)
    parents = jnp.cumsum(z[:n])
    return jnp.clip(parents, 0, n_in - 1)


def stratified_parents(key, log_normalized_weights, num=None):
    """Stratified ancestors: one independent uniform per output stratum.

    positions_i = (u_i + i)/num with iid u_i — lower variance than
    multinomial, slightly higher than systematic, but with N independent
    stratification variables (useful when the single systematic uniform's
    coupling is undesirable, e.g. for some particle-MCMC estimators).
    Same O(N) scatter+cumsum inverse as the systematic kernel.
    """
    n_in = log_normalized_weights.shape[0]
    n = num if num is not None else n_in
    cdf = _normalized_cdf(log_normalized_weights)
    us = jax.random.uniform(key, (n,), log_normalized_weights.dtype)
    # first stratum index whose position (i + u_i)/n exceeds cdf_j:
    # i >= n*cdf_j - u_i is stratum-dependent; invert by locating each cdf_j
    # against the per-stratum positions with a searchsorted on the sorted
    # positions (they are sorted by construction: (i + u_i) strictly
    # increasing since u_i in [0,1)).
    positions = (jnp.arange(n, dtype=cdf.dtype) + us) / n
    s = jnp.searchsorted(positions, cdf, side="left").astype(jnp.int32)
    z = jnp.zeros(n + 1, jnp.int32).at[jnp.clip(s, 0, n)].add(1)
    parents = jnp.cumsum(z[:n])
    return jnp.clip(parents, 0, n_in - 1)


def residual_parents(key, log_normalized_weights, num=None):
    """Residual-systematic resampling: deterministic floor(N w) copies plus a
    systematic sweep over the residual weights for the R = N - sum(floor)
    remaining slots.

    Fully vectorized with static shapes even though R is data-dependent:
    both blocks are grid-inverses (scatter + cumsum) — the deterministic
    block on cumsum(floor(N w)), the residual block on the R-point
    systematic grid ceil(R * resid_cdf - u) — and the blocks are stitched
    with a shifted gather.
    """
    n_in = log_normalized_weights.shape[0]
    n = num if num is not None else n_in
    w = jnp.exp(log_normalized_weights)
    w = w / jnp.sum(w)
    counts = jnp.floor(n * w).astype(jnp.int32)
    num_det = jnp.sum(counts)
    # deterministic block: parents of slots [0, num_det) = repeat by counts
    cum = jnp.cumsum(counts)  # S_j = first slot after particle j's copies
    z = jnp.zeros(n + 1, jnp.int32).at[jnp.clip(cum, 0, n)].add(1)
    det_parents = jnp.clip(jnp.cumsum(z[:n]), 0, n_in - 1)
    # residual block: systematic sweep of R slots over the residual mass
    resid = n * w - counts
    r_total = jnp.asarray(n, w.dtype) - num_det.astype(w.dtype)  # R as traced
    resid_cdf = jnp.cumsum(resid)
    resid_cdf = resid_cdf / resid_cdf[-1]
    u = jax.random.uniform(key, (), w.dtype)
    s_res = jnp.clip(jnp.ceil(resid_cdf * r_total - u), 0, n).astype(jnp.int32)
    z_res = jnp.zeros(n + 1, jnp.int32).at[s_res].add(1)
    res_rank = jnp.clip(jnp.cumsum(z_res[:n]), 0, n_in - 1)  # rank on R-grid
    # slots >= num_det take residual draw (k - num_det) on the R-grid
    idx = jnp.arange(n, dtype=jnp.int32)
    shifted = jnp.take(res_rank, jnp.clip(idx - num_det, 0, n - 1))
    return jnp.where(idx >= num_det, shifted, det_parents)


RESAMPLERS = {
    "multinomial": multinomial_parents,
    "systematic": systematic_parents,
    "stratified": stratified_parents,
    "residual": residual_parents,
}


def gather_particles(tree, parents):
    """traces[i] = traces[parents[i]] as one XLA gather over every leaf.

    Replaces the O(N*T) per-particle trace clone at particle_filter.rs:109-114.
    """
    return jax.tree_util.tree_map(lambda x: jnp.take(x, parents, axis=0), tree)


def fused_systematic_resample_or_none(key, log_normalized_weights, tree):
    """Systematic resampling with the fused Pallas ancestor+gather kernel.

    Returns ``(new_tree, parents)`` when the TPU fused kernel applies
    (float32 leaves, small total state width, N % 256 == 0), else ``None``
    and the caller falls back to ``systematic_parents`` + ``gather_particles``.
    The decision is made at trace time (structure is static); results are
    bit-identical to the fallback (same integer ancestor logic, exact
    one-hot state copies).
    """
    from modppl_tpu.ops.fused_resample_pallas import systematic_resample_fused

    # escape hatch for Mosaic/toolchain regressions (via _fusable): the
    # plain XLA path is bit-identical, just slower
    n = log_normalized_weights.shape[0]
    fus = _fusable(n, tree)
    if fus is None:
        return None
    leaves, treedef, widths = fus

    rows = [leaf.reshape(n, -1).T for leaf in leaves]   # (k_i, N) each
    state_t = jnp.concatenate(rows, axis=0) if len(rows) > 1 else rows[0]
    new_t, parents = systematic_resample_fused(
        key, log_normalized_weights, state_t)
    out_leaves, off = [], 0
    for leaf, k in zip(leaves, widths):
        out_leaves.append(new_t[off: off + k].T.reshape(leaf.shape))
        off += k
    return jax.tree_util.tree_unflatten(treedef, out_leaves), parents


def np_prod(shape):
    out = 1
    for s in shape:
        out *= int(s)
    return out


def _fusable(n, tree):
    """Trace-time eligibility of the fused kernel for this state pytree;
    returns (leaves, treedef, widths) or None."""
    import os

    from modppl_tpu.ops.fused_resample_pallas import MAX_STATE_DIM

    if os.environ.get("MODPPL_DISABLE_FUSED_RESAMPLE"):
        return None
    if jax.default_backend() != "tpu":
        return None
    if n % 256 != 0:
        return None
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    widths = []
    for leaf in leaves:
        if leaf.dtype != jnp.float32 or leaf.ndim < 1 or leaf.shape[0] != n:
            return None
        widths.append(int(np_prod(leaf.shape[1:])))
    if sum(widths) > MAX_STATE_DIM:
        return None
    return leaves, treedef, widths


def fused_gather_from_s_or_none(s, tree):
    """Fused ancestor+gather from a precomputed sorted slot-position vector
    S (see ops/fused_resample_pallas.resample_fused_from_s), or ``None``
    when the kernel does not apply. Used by the sharded batched tier, which
    computes S with its layout-invariant CDF."""
    from modppl_tpu.ops.fused_resample_pallas import resample_fused_from_s

    n = s.shape[0]
    fus = _fusable(n, tree)
    if fus is None:
        return None
    leaves, treedef, widths = fus
    rows = [leaf.reshape(n, -1).T for leaf in leaves]
    state_t = jnp.concatenate(rows, axis=0) if len(rows) > 1 else rows[0]
    new_t, parents = resample_fused_from_s(s, state_t)
    out_leaves, off = [], 0
    for leaf, k in zip(leaves, widths):
        out_leaves.append(new_t[off: off + k].T.reshape(leaf.shape))
        off += k
    return jax.tree_util.tree_unflatten(treedef, out_leaves), parents
