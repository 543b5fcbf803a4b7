"""Test configuration: force an 8-device virtual CPU mesh.

Must set XLA flags before jax initializes; pytest imports conftest before
any test module, so this is the single chokepoint.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Keep compilation deterministic and quiet on the single-core CI host.
os.environ.setdefault("JAX_ENABLE_X64", "0")
