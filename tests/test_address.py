"""Address parsing and Selection tests.

Ports the reference's `test_split_addr` (modppl/src/address.rs:148-174) and
exercises the AddrMap-equivalent Selection ops (address.rs:51-146).
"""

from modppl_tpu.core.address import Selection, normalize_addr, select, split_addr


def test_split_addr():
    assert split_addr("test") == ("test",)
    assert split_addr("(tuple, test)") == ("(tuple, test)",)
    assert split_addr("1/2") == ("1", "2")

    hard_addr = " 1/ 21f23/432 / 132  /   (  y?A1 , grexxy )   "
    key = split_addr(hard_addr)
    assert key == ("1", " 21f23/432 / 132  /   (  y?A1 , grexxy )   ")
    while key != ("(  y?A1 , grexxy )",):
        assert len(key) == 2, f"expected term, got {key}"
        key = split_addr(key[1])

    equiv_addr = "1/   21f23  / 432/132 / (  y?A1 , grexxy ) "
    normalized_addr = "1 / 21f23 / 432 / 132 / (  y?A1 , grexxy )"
    assert normalize_addr(hard_addr) == normalized_addr
    assert normalize_addr(equiv_addr) == normalized_addr


def test_selection_visit_search():
    s = Selection()
    s.visit("a/b/c")
    s.visit("a/d")
    s.visit("e")
    assert s.search("a/b/c") is not None
    assert s.search("a / b / c") is not None  # normalization-equivalent
    assert s.search("a/b/c").is_leaf()
    assert not s.search("a/b").is_leaf()
    assert s.search("zzz") is None
    assert "a/d" in s
    assert "a/x" not in s


def test_selection_all_visited():
    visitor = select("x", "y/a", "y/b")
    other = select("x", "y/a")
    assert visitor.all_visited(other)
    assert not other.all_visited(visitor)
    # an ancestor leaf covers its subtree
    cover = select("y")
    assert cover.all_visited(select("y/a", "y/b"))


def test_selection_complement():
    s = select("a", "b/c", "b/d", "e/f")
    mask = select("a", "b/c")
    comp = s.complement(mask)
    assert "b" in comp and comp.search("b/d") is not None
    assert comp.search("b/c") is None
    assert "a" not in comp
    # a wholly-unmasked subtree complements to a covering leaf (address.rs:127-129)
    assert comp.search("e") is not None and comp.search("e").is_leaf()
    # complement against itself is empty
    assert s.complement(s).is_leaf()


def test_selection_eq():
    assert select("a/b", "c") == select("c", "a / b")
    assert select("a") != select("a/b")
