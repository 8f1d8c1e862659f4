"""Profiling hooks: runtime trace annotation, device timing, and compiled
cost reporting.

SURVEY.md §5 (tracing/profiling — absent in the reference beyond ad-hoc
``dbg!``): jax.profiler trace capture around inference phases, host-side
``TraceAnnotation`` scopes to complement the trace-time ``jax.named_scope``
annotations already embedded per GFI method (modeling/gen.py) and per SMC
phase (inference/vsmc.py), plus XLA's compiled cost analysis for
per-program flop/byte reporting.
"""

import contextlib
import time

import jax


@contextlib.contextmanager
def annotate(name):
    """Host-side profiler annotation: shows up as a named span on the
    trace-viewer timeline (no-op overhead outside an active trace)."""
    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def capture_trace(log_dir):
    """Capture a jax.profiler trace of the enclosed block into ``log_dir``
    (view with TensorBoard's profile plugin or Perfetto)."""
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_time(fn, *args, repeats=3, **kwargs):
    """Wall-clock a jitted callable with compile excluded.

    Runs once to compile/warm up, then ``repeats`` timed runs under
    ``block_until_ready``; returns (result, best_seconds).
    """
    result = jax.block_until_ready(fn(*args, **kwargs))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args, **kwargs))
        best = min(best, time.perf_counter() - t0)
    return result, best


def compiled_cost(fn, *args, **kwargs):
    """XLA's cost analysis of ``jit(fn)`` on the given abstract args.

    Returns a dict with (at least, backend-dependent) ``flops`` and
    ``bytes accessed`` — the per-kernel cost reporting hook. Works from the
    lowered program only; nothing is executed.
    """
    compiled = jax.jit(fn).lower(*args, **kwargs).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, (list, tuple)):  # older jax returns [dict]
        cost = cost[0] if cost else {}
    return dict(cost) if cost else {}


def hlo_text(fn, *args, **kwargs):
    """Optimized HLO of ``jit(fn)`` — for inspecting fusion decisions."""
    return jax.jit(fn).lower(*args, **kwargs).compile().as_text()
