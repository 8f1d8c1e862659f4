"""Hierarchical model: bernoulli-gated linear/quadratic regression.

Reference parity: modppl/tests/dyngenfns/hierarchical.rs — nested generative
calls, stochastic branching, and the two MH proposals including the
trans-dimensional add_or_remove_param_proposal (hierarchical.rs:48-61).

This is the flagship correctness model (SURVEY.md §7 minimum slice): it
exercises choice maps, constraints, branching, nested `/=` calls, weights
and logsumexp. The eager form below branches on a concrete sample; the
compiled/vectorized form lives in models/hierarchical_static.py.
"""

from modppl_tpu.dists import bernoulli, normal
from modppl_tpu.modeling import gen

NOISE = 0.1


@gen
def linear(h):
    """(hierarchical.rs:17-22)"""
    a = h.sample(normal, (0.0, 1.0), "a")
    b = h.sample(normal, (0.0, 1.0), "b")
    return (a, b)


@gen
def quadratic(h):
    """(hierarchical.rs:24-30)"""
    a = h.sample(normal, (0.0, 1.0), "a")
    b = h.sample(normal, (0.0, 1.0), "b")
    c = h.sample(normal, (0.0, 1.0), "c")
    return (a, b, c)


@gen
def hierarchical_model(h, xs):
    """(hierarchical.rs:32-46)"""
    if h.sample(bernoulli, 0.7, "is_linear"):
        a, b = h.trace(linear, (), "coeffs")
        return [h.sample(normal, (a + b * x, NOISE), f"(y, {i})")
                for i, x in enumerate(xs)]
    else:
        a, b, c = h.trace(quadratic, (), "coeffs")
        return [h.sample(normal, (a + b * x + c * x * x, NOISE), f"(y, {i})")
                for i, x in enumerate(xs)]


@gen
def add_or_remove_param_proposal(h, trace):
    """Trans-dimensional jump proposal (hierarchical.rs:48-61)."""
    h.sample(normal, (trace.data.read("coeffs/a"), 0.025), "coeffs/a")
    h.sample(normal, (trace.data.read("coeffs/b"), 0.025), "coeffs/b")
    if not h.sample(bernoulli, 0.5, "is_linear"):
        if trace.data.search("coeffs/c") is not None:
            prev_c = trace.data.read("coeffs/c")
        else:
            prev_c = 0.0
        h.sample(normal, (prev_c, 0.025), "coeffs/c")


@gen
def hierarchical_drift_proposal(h, trace, drift_std):
    """Within-model drift proposal (hierarchical.rs:63-70)."""
    h.sample(normal, (trace.data.read("coeffs/a"), drift_std), "coeffs/a")
    h.sample(normal, (trace.data.read("coeffs/b"), drift_std), "coeffs/b")
    if not trace.data.read("is_linear"):
        h.sample(normal, (trace.data.read("coeffs/c"), drift_std), "coeffs/c")


def read_coeffs(trace):
    """Extract [a, b] or [a, b, c] from a trace (hierarchical.rs:5-15)."""
    a = trace.data.read("coeffs / a")
    b = trace.data.read("coeffs / b")
    if not trace.data.read("is_linear"):
        return [a, b, trace.data.read("coeffs / c")]
    return [a, b]
