"""Core layer: addresses, choice-map tries, and the GFI."""

from modppl_tpu.core.address import Selection, normalize_addr, select, split_addr
from modppl_tpu.core.gfi import ArgDiff, GenFn, Trace
from modppl_tpu.core.trie import Trie

__all__ = [
    "Selection", "normalize_addr", "select", "split_addr",
    "ArgDiff", "GenFn", "Trace", "Trie",
]
