"""Trie invariants, ported from modppl/tests/trie.rs.

insert/remove inverse (trie.rs:6-20), search (24-54), weight accounting
(59-81), occupied-address errors (85-90), merge/schema/collect semantics
(trie.rs:187-247).
"""

import pytest

from modppl_tpu.core.address import select
from modppl_tpu.core.trie import Trie


def test_insert_remove_inverse():
    t = Trie()
    t.observe("a/b/c", 1.0)
    sub = t.remove("a/b/c")
    assert sub.is_leaf() and sub.inner() == 1.0
    assert t.is_empty()  # empty intermediate nodes pruned (trie.rs:171-175)


def test_search():
    t = Trie()
    t.observe("x", 1.0)
    t.observe("a / b", 2.0)
    assert t.search("x").inner() == 1.0
    assert t.search("a/b").inner() == 2.0
    assert t.search("a / b").inner() == 2.0
    assert t.search("nope") is None
    assert t.read("a/b") == 2.0
    with pytest.raises(KeyError):
        t.read("nope")


def test_weight_accounting():
    t = Trie()
    t.w_observe("x", 1.0, -0.5)
    t.w_observe("a/b", 2.0, -1.5)
    assert float(t.weight()) == pytest.approx(-2.0)
    sub = t.remove("a")
    assert float(t.weight()) == pytest.approx(-0.5)
    assert float(sub.weight()) == pytest.approx(-1.5)
    t2 = Trie()
    t2.insert("z", sub)
    assert float(t2.weight()) == pytest.approx(-1.5)


def test_occupied_address_raises():
    t = Trie()
    t.observe("x", 1.0)
    with pytest.raises(KeyError):
        t.observe("x", 2.0)
    with pytest.raises(KeyError):
        t.insert("x", Trie.leaf(3.0))


def test_merge_prefers_other():
    a = Trie()
    a.w_observe("x", 1.0, -1.0)
    a.w_observe("sub/y", 2.0, -2.0)
    b = Trie()
    b.w_observe("sub/z", 3.0, -3.0)
    a.merge(b)
    assert a.read("sub/z") == 3.0
    assert float(a.weight()) == pytest.approx(-6.0)


def test_schema_and_collect():
    t = Trie()
    t.w_observe("a", 1.0, -1.0)
    t.w_observe("s/b", 2.0, -2.0)
    t.w_observe("s/c", 3.0, -4.0)
    schema = t.schema()
    assert schema == select("a", "s/b", "s/c")

    kept, collected, w = t.collect(select("s/b"))
    assert collected.read("s/b") == 2.0
    assert float(w) == pytest.approx(-2.0)
    assert kept.read("a") == 1.0
    assert kept.read("s/c") == 3.0
    assert kept.search("s/b") is None

    # full-schema collect moves everything (trie.rs:227-230)
    t2 = Trie()
    t2.w_observe("a", 1.0, -1.0)
    kept2, collected2, w2 = t2.collect(collected_mask := t2.schema())
    assert kept2.is_empty()
    assert collected2.read("a") == 1.0
    assert float(w2) == pytest.approx(-1.0)


def test_inner_value():
    t = Trie()
    t.observe("sub/x", 1.0)
    node = t.search("sub")
    assert node.inner() is None
    node.replace_inner((4.0, 5.0))
    assert t.search("sub").inner() == (4.0, 5.0)
    assert not node.is_leaf()  # has children
    assert node.take_inner() == (4.0, 5.0)
    assert node.inner() is None


def test_pytree_roundtrip():
    import jax

    t = Trie()
    t.w_observe("a", 1.0, -1.0)
    t.w_observe("s/b", 2.0, -2.0)
    t.search("s").replace_inner(7.0)
    leaves, treedef = jax.tree_util.tree_flatten(t)
    t2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert t2 == t
    doubled = jax.tree_util.tree_map(lambda x: x * 2, t)
    assert doubled.read("a") == 2.0
    assert doubled.search("s").inner() == 14.0
