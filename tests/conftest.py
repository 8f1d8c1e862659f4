"""Test configuration.

The suite runs on a virtual 8-device CPU mesh (multi-chip sharding tests run
here; the driver separately dry-runs the multi-chip path on real hardware)
with float64 enabled so the GFI regression constants from the reference
test-suite (modppl/tests/dyngenfn.rs) can be checked at 1e-6.

Note: in this environment jax is pre-imported via PYTHONPATH sitecustomize
with JAX_PLATFORMS=axon (the TPU tunnel), so the platform must be forced to
cpu via jax.config — env vars alone are read too early/late.
"""

import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# build the native C extensions in-place if missing (cheap; pure-Python
# fallbacks cover failure, but the suite should exercise the native path)
try:
    import importlib.util as _ilu

    if (_ilu.find_spec("modppl_tpu.native._addrops") is None
            or _ilu.find_spec("modppl_tpu.native._ctrie") is None):
        from modppl_tpu.native.build import build as _build_native

        _build_native()
except Exception:
    pass

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

assert jax.devices()[0].platform == "cpu", "tests must run on the CPU backend"
assert len(jax.devices()) == 8, "tests expect an 8-device virtual CPU mesh"
