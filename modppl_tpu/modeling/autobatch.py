"""Automatic batched-particle execution of per-particle ``@gen`` kernels.

The batched-particle tier (inference/vsmc.batched_particle_filter) treats
the particle axis as an ordinary array axis: unconstrained latents sample
from ONE threefry counter stream per address (~3x fewer PRNG blocks per
step than per-particle ``split``/``fold_in`` at 10^6 particles), and
constrained scores broadcast to per-particle ``(n,)`` weights. Round 2
required hand-written batch-aware model variants (``plate()`` addresses,
reshaped math); this module derives the batched execution AUTOMATICALLY
from the ordinary per-particle kernel:

- the model BODY runs per-particle under ``vmap`` — indexing/stacking
  semantics are untouched, any per-particle ``@gen`` kernel qualifies;
- the handler's fresh-draw hook (`_Handler._draw`) is overridden so each
  unconstrained address draws the full ``(n,)`` plate sample from the
  SHARED (unbatched) key — under ``vmap`` that computation is unbatched,
  so XLA hoists it out of the lane axis and each lane just gathers its
  slice. The values are bitwise-identical to a hand-written
  ``plate(dist, n)`` site (same ``addr_subkey`` stream, same
  ``sample_batch`` call).
- sites whose params are themselves per-particle (batched) cannot share a
  plate draw without materializing an (n, n) intermediate; they fall back
  to one ``fold_in(addr_key, lane)`` stream per lane (the per-particle
  cost, for that site only). Sub-``trace`` calls fold the lane index the
  same way.

Wrap a ScanKernel with :func:`auto_batch_scan_kernel` and pass it straight
to ``batched_particle_filter``.
"""

import jax
import jax.numpy as jnp

from modppl_tpu.core.gfi import Trace
from modppl_tpu.core.trie import Trie
from modppl_tpu.modeling.handlers import GenerateHandler, addr_subkey

try:  # jax-internal but long-stable; used only as a fast-path test
    from jax.interpreters.batching import BatchTracer as _BatchTracer
except Exception:  # pragma: no cover
    _BatchTracer = ()


def _any_batched(tree):
    return any(isinstance(x, _BatchTracer)
               for x in jax.tree_util.tree_leaves(tree))


class LaneGenerateHandler(GenerateHandler):
    """GenerateHandler whose fresh draws come from per-address plate streams.

    ``lane = (i, n)``: this execution is lane ``i`` of an ``n``-wide vmap
    over particles, with the handler ``key`` SHARED (unbatched) across
    lanes.
    """

    def __init__(self, key, trace, constraints, lane):
        super().__init__(key, trace, constraints)
        self.lane = lane

    def _draw(self, dist, params, addr):
        i, n = self.lane
        k = addr_subkey(self.key, addr)
        if _any_batched(params):
            # per-particle params: one counter stream per lane (plate
            # sharing would broadcast the whole (n,) base draw per lane)
            return dist.sample(jax.random.fold_in(k, i), params)
        return jax.tree_util.tree_map(
            lambda xs: xs[i], dist.sample_batch(k, (n,), params))

    def _subkey(self, addr):
        # sub-genfn calls get per-lane streams (correct, not plate-shared)
        return jax.random.fold_in(addr_subkey(self.key, addr), self.lane[0])


def _lane_generate(gen_fn, key, args, constraints, i, n):
    """Gen.generate (modeling/gen.py:72-86) with the lane handler."""
    constraints = constraints.copy()
    constraints.take_inner()
    g = LaneGenerateHandler(key, Trace(args, Trie(), None, 0.0), constraints,
                            lane=(i, n))
    retv = gen_fn.fn(g, *args)
    if not g.constraints.is_empty():
        raise ValueError(
            "generate error: not all constraints were consumed! residual: "
            f"{g.constraints.addresses()}")
    trace = g.tr
    trace.logjp = trace.data.weight()
    trace.set_retv(retv)
    return trace, g.weight


class AutoBatchedInit:
    """Batch-aware init: args ``(*per_particle_args, n)`` (the
    batched_smc_init convention), generate returns per-particle weights."""

    def __init__(self, inner):
        self.inner = inner
        self.__name__ = f"auto_batch({inner.__name__})"

    def __repr__(self):
        return f"AutoBatchedInit({self.inner!r})"

    def generate(self, key, args, constraints):
        *a, n = args
        a = tuple(a)
        with jax.named_scope(f"{self.__name__}.generate"):
            return jax.vmap(
                lambda i: _lane_generate(self.inner, key, a, constraints,
                                         i, n))(jnp.arange(n))


class AutoBatchedStep:
    """Batch-aware step: args ``(t, state)`` with ``state`` batched on its
    leading axis (the batched_smc_step convention)."""

    def __init__(self, inner):
        self.inner = inner
        self.__name__ = f"auto_batch({inner.__name__})"

    def __repr__(self):
        return f"AutoBatchedStep({self.inner!r})"

    def generate(self, key, args, constraints):
        t, state = args
        n = jax.tree_util.tree_leaves(state)[0].shape[0]
        with jax.named_scope(f"{self.__name__}.generate"):
            return jax.vmap(
                lambda i, st: _lane_generate(self.inner, key, (t, st),
                                             constraints, i, n)
            )(jnp.arange(n), state)


def auto_batch_scan_kernel(kernel):
    """Derive a batched-particle ScanKernel from a per-particle one.

    ``batched_particle_filter(key, auto_batch_scan_kernel(k), ...)`` runs
    the fast tier on any ordinary per-particle kernel — no hand-written
    ``plate()`` model variants needed.
    """
    from modppl_tpu.inference.vsmc import ScanKernel

    return ScanKernel(AutoBatchedInit(kernel.init),
                      AutoBatchedStep(kernel.step))
