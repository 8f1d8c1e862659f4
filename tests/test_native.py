"""Native address-ops extension: build, parity with the Python fallback."""

import subprocess
import sys

import pytest

from modppl_tpu.core import address as A

HARD = [
    "test",
    "(tuple, test)",
    "1/2",
    " 1/ 21f23/432 / 132  /   (  y?A1 , grexxy )   ",
    "1/   21f23  / 432/132 / (  y?A1 , grexxy ) ",
    "coeffs/a",
    "ys / 3",
    "a / b / c / d / e",
    "",
    "  spaced  ",
    "trailing/",
    "/leading",
]


def _built():
    from modppl_tpu.native import HAVE_NATIVE

    return HAVE_NATIVE


def test_build_native():
    # the toolchain is part of the environment; build in-place
    r = subprocess.run([sys.executable, "-m", "modppl_tpu.native.build"],
                       capture_output=True)
    assert r.returncode == 0, r.stderr.decode()


def test_native_python_parity():
    if not _built():
        pytest.skip("native extension not built")
    from modppl_tpu.native import addrops

    for addr in HARD:
        assert addrops.split_addr(addr) == A._py_split_addr(addr), addr
        assert addrops.normalize_addr(addr) == A._py_normalize_addr(addr), addr
        assert tuple(addrops.addr_components(addr)) == A._py_components(addr), addr
        assert addrops.addr_hash(addr) == A._py_addr_hash(addr), addr


def test_native_cache_grows():
    if not _built():
        pytest.skip("native extension not built")
    from modppl_tpu.native import addrops

    before = addrops.cache_size()
    addrops.addr_hash(f"unique-{before}-address/x")
    assert addrops.cache_size() == before + 1
    # repeated lookups don't grow the cache
    addrops.addr_hash(f"unique-{before}-address/x")
    assert addrops.cache_size() == before + 1
