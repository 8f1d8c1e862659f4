"""Native (C) runtime components with pure-Python fallbacks.

``_addrops``: the address-layer fast path for the eager interpreter
(memoized parse/normalize/hash). ``_ctrie``: the choice-map node core —
the C counterpart of the reference's compiled-Rust trie (trie.rs), which
``core.trie.Trie`` subclasses for interpreter-dispatch-free walks and
mutations in the eager tier. Build both in-place with::

    python -m modppl_tpu.native.build

Import `addrops` from here — it resolves to the compiled module when the
shared object is present, else to the Python fallback in
modppl_tpu.core.address (identical semantics, asserted by
tests/test_native.py).
"""

try:
    from modppl_tpu.native import _addrops as addrops  # type: ignore

    HAVE_NATIVE = True
except ImportError:
    addrops = None
    HAVE_NATIVE = False

try:
    from modppl_tpu.native import _ctrie as ctrie  # type: ignore

    HAVE_NATIVE_TRIE = True
except ImportError:
    ctrie = None
    HAVE_NATIVE_TRIE = False
