"""Unfold: the Markov-kernel combinator.

Reference parity: ``DynUnfold`` (modppl/src/modeling/dynunfold.rs:7-100) —
wraps a kernel GenFn of ``(t, state) -> state`` and implements
``GenFn<(T, state), list[Trie], list[state]>`` by threading state through
``t = 0..T``, accumulating per-step choice tries and per-step logjp.
``update`` supports only ``ArgDiff.EXTEND`` (dynunfold.rs:66-100): it appends
``final_t - prev_t`` new steps via generate and returns empty discards —
the O(1)-per-step incremental-extension hook the particle filter relies on.

This eager class preserves exact reference semantics for any kernel
(including t==0 branching on a *Python* int t, as in the spiral model).
For the compiled tier, `modppl_tpu.inference.smc.vector_smc` runs the same
kernel under ``lax.scan`` over time and ``vmap`` over particles.
"""

import jax

from modppl_tpu.core.gfi import ArgDiff, GenFn, Trace


class Unfold(GenFn):
    """Sequential combinator over a kernel ``Gen`` of args (t, state)."""

    def __init__(self, kernel):
        self.kernel = kernel

    def __repr__(self):
        return f"Unfold({self.kernel!r})"

    def _step_key(self, key, t):
        return jax.random.fold_in(key, t)

    def simulate(self, key, args):
        # dynunfold.rs:24-40
        final_t, state = args
        assert final_t >= 1
        data, retv, logjp = [], [], 0.0
        for t in range(final_t):
            sub = self.kernel.simulate(self._step_key(key, t), (t, state))
            state = sub.retv
            retv.append(state)
            data.append(sub.data)
            logjp = logjp + sub.logjp
        return Trace(args, data, retv, logjp)

    def generate(self, key, args, vec_constraints):
        # dynunfold.rs:42-66
        final_t, state = args
        assert final_t >= 1
        data, retv, logjp, weight = [], [], 0.0, 0.0
        for t, constraints in enumerate(vec_constraints):
            sub, w = self.kernel.generate(
                self._step_key(key, t), (t, state), constraints)
            state = sub.retv
            retv.append(state)
            data.append(sub.data)
            logjp = logjp + sub.logjp
            weight = weight + w
        return Trace(args, data, retv, logjp), weight

    def update(self, key, trace, args, argdiff, vec_constraints):
        # dynunfold.rs:68-100: EXTEND only — append new timesteps.
        final_t, _ = args
        assert final_t >= 1
        prev_t = trace.args[0]
        assert final_t - prev_t == len(vec_constraints)
        if argdiff is not ArgDiff.EXTEND:
            raise ValueError(f"Unfold.update: can't handle ArgDiff {argdiff}")
        state = trace.retv[-1]
        data = list(trace.data)
        retv = list(trace.retv)
        logjp = trace.logjp
        weight = 0.0
        for i, constraints in enumerate(vec_constraints):
            t = prev_t + i
            sub, w = self.kernel.generate(
                self._step_key(key, t), (t, state), constraints)
            state = sub.retv
            retv.append(state)
            data.append(sub.data)
            logjp = logjp + sub.logjp
            weight = weight + w
        new_trace = Trace((final_t, trace.args[1]), data, retv, logjp)
        from modppl_tpu.core.trie import Trie
        discard = [Trie() for _ in range(final_t - prev_t)]
        return new_trace, discard, weight
