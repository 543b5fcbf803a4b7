"""Test configuration: force an 8-device virtual CPU mesh.

Must set XLA flags before jax initializes; pytest imports conftest before
any test module, so this is the single chokepoint.  JAX_PLATFORMS is forced
(not defaulted) to cpu: the host env may point at the real TPU, but tests
need determinism, f32 matmuls, and the 8-device virtual mesh.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# jax is pre-imported at interpreter startup in this image (axon plugin), so
# the JAX_PLATFORMS env var above may be read too late; force via config.
# Backends initialize lazily, so XLA_FLAGS still takes effect.
jax.config.update("jax_platforms", "cpu")
# Parity tests against torch need true f32 matmuls, not bf16-emulating ones.
jax.config.update("jax_default_matmul_precision", "highest")

import pytest


@pytest.fixture(autouse=True)
def _reset_kernel_mesh():
    """build_mesh arms the Pallas kernels' ambient shard_map mesh; reset it
    after every test so mesh tests don't leak sharding into kernel tests."""
    yield
    from iadr1_tpu.core.mesh import set_kernel_mesh

    set_kernel_mesh(None)
