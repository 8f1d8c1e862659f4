"""Native C trie core vs the pure-Python base: exact behavioral parity.

Every operation battery runs against both ``Trie`` (native-backed when the
extension is built) and ``PurePythonTrie``; the whole existing trie/GFI
suite also exercises the native path since ``Trie`` subclasses it.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from modppl_tpu.core.trie import HAVE_NATIVE_TRIE, PurePythonTrie, Trie

CLASSES = [Trie, PurePythonTrie]


def test_native_extension_is_active():
    assert HAVE_NATIVE_TRIE, "C trie extension should be built in-repo"
    from modppl_tpu.native import ctrie
    assert Trie.__mro__[2] is ctrie.CTrieBase


@pytest.mark.parametrize("cls", CLASSES)
def test_basic_walk_and_mutation(cls):
    t = cls()
    assert t.is_empty() and not t.is_leaf() and len(t) == 0
    t.w_observe("a / b", 1.5, -0.5)
    t.observe("c", 2.0)
    assert t.read("a / b") == 1.5
    assert t["c"] == 2.0
    assert "a / b" in t and "a/b" in t and "nope" not in t
    assert t.search("a").search("b").is_leaf()
    assert float(t.weight()) == pytest.approx(-0.5)
    # occupied writes raise
    with pytest.raises(KeyError):
        t.observe("c", 3.0)
    with pytest.raises(KeyError):
        t.insert("a / b", cls())
    # remove prunes empty intermediates
    sub = t.remove("a / b")
    assert sub.inner() == 1.5
    assert t.search("a") is None
    assert t.remove("a / b") is None


@pytest.mark.parametrize("cls", CLASSES)
def test_inner_value_ops(cls):
    t = cls()
    assert t.inner() is None and t.take_inner() is None
    assert t.replace_inner(7) is None
    assert t.replace_inner(8) == 7
    assert t.has_inner() and t.inner() == 8
    assert t.take_inner() == 8 and not t.has_inner()
    with pytest.raises(KeyError):
        t.expect_inner("boom")


@pytest.mark.parametrize("cls", CLASSES)
def test_weight_with_array_leaves(cls):
    t = cls()
    t.w_observe("x", jnp.ones(3), jnp.array([-1.0, -2.0, -3.0]))
    t.w_observe("y", 0.0, -0.5)
    assert float(t.weight()) == pytest.approx(-6.5)


@pytest.mark.parametrize("cls", CLASSES)
def test_merge_schema_collect_roundtrip(cls):
    t = cls()
    t.w_observe("a", 1.0, -1.0)
    t.w_observe("s / x", 2.0, -2.0)
    t.w_observe("s / y", 3.0, -3.0)
    other = cls()
    other.w_observe("b", 4.0, -4.0)
    t.merge(other)
    assert t.addresses() == ["a", "b", "s / x", "s / y"]

    from modppl_tpu.core.address import select
    kept, collected, w = t.collect(select("s / x"))
    assert float(w) == pytest.approx(-2.0)
    assert collected.read("s / x") == 2.0
    assert kept.addresses() == ["a", "b", "s / y"]


@pytest.mark.parametrize("cls", CLASSES)
def test_pytree_roundtrip_and_vmap(cls):
    t = cls()
    t.w_observe("m", jnp.zeros(()), jnp.zeros(()))
    leaves, treedef = jax.tree_util.tree_flatten(t)
    t2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert type(t2) is cls and t2 == t

    def f(k):
        tt = cls()
        tt.w_observe("m", jax.random.normal(k, ()), jnp.zeros(()))
        return tt

    batched = jax.vmap(f)(jax.random.split(jax.random.PRNGKey(0), 8))
    assert batched.read("m").shape == (8,)


def test_native_and_pure_agree_on_gfi_flow():
    """The same model run with both trie classes gives identical traces."""
    from modppl_tpu import gen, normal

    @gen
    def m(h):
        a = h.sample(normal, (0.0, 1.0), "a")
        h.sample(normal, (a, 1.0), "obs / y")
        return a

    k = jax.random.PRNGKey(3)
    tr = m.simulate(k, ())
    # rebuild the same constraints in both classes; generate must agree
    cons_n = Trie.from_dict({"obs": {"y": 0.7}})
    cons_p = PurePythonTrie.from_dict({"obs": {"y": 0.7}})
    tr_n, w_n = m.generate(k, (), cons_n)
    tr_p, w_p = m.generate(k, (), cons_p)
    assert float(w_n) == float(w_p)
    assert float(tr_n.logjp) == float(tr_p.logjp)
    assert tr_n.data.addresses() == tr_p.data.addresses()


def test_native_speedup_smoke():
    """Native walks shouldn't be slower than pure Python (smoke, not a perf gate)."""
    import time

    def bench(cls, n=2000):
        t0 = time.perf_counter()
        t = cls()
        for i in range(n):
            t.w_observe(f"grp{i % 50} / x{i}", float(i), -0.1)
        for i in range(n):
            t.read(f"grp{i % 50} / x{i}")
        return time.perf_counter() - t0

    bench(Trie, 200), bench(PurePythonTrie, 200)  # warm caches
    native = min(bench(Trie) for _ in range(3))
    pure = min(bench(PurePythonTrie) for _ in range(3))
    if HAVE_NATIVE_TRIE:
        assert native < pure * 1.5  # generous: just prove no regression
