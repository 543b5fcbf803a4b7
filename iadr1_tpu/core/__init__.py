"""Core TPU runtime: device mesh, sharding rules, precision, config, RNG.

Replaces the reference's distributed stack (torchrun + accelerate +
DeepSpeed ZeRO-3 + NCCL, SURVEY.md section 2.4) with a single-program SPMD
design: one jit-compiled program over a named (dp, fsdp, tp) mesh, with XLA
collectives over ICI inserted from NamedSharding annotations.
"""

from iadr1_tpu.core.mesh import (
    MeshConfig,
    build_mesh,
    logical_to_mesh_axes,
    named_sharding,
    shard_pytree,
)
from iadr1_tpu.core.precision import Precision, DEFAULT_PRECISION
from iadr1_tpu.core.config import load_config, dataclass_from_dict
