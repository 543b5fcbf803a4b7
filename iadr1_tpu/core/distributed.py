"""Multi-host bootstrap: jax.distributed init + per-host data sharding.

The TPU replacement for the reference's torchrun / Ray / DeepSpeed launcher
layer (scripts/train/*.sh torchrun --nproc_per_node, tuner.py:83-90 Ray
path, NCCL env in SC_GRPO_*.sh): on TPU pods each *host* runs the same
program, ``jax.distributed.initialize`` wires the processes together, and
a single jit program spans every chip over ICI/DCN.

Launch recipe (documented for v5e-64 = 16 hosts x 4 chips):

    # via GKE/xpk the three env vars are injected automatically; manual:
    COORDINATOR_ADDRESS=host0:8476 NUM_PROCESSES=16 PROCESS_ID=$i \
        python -m iadr1_tpu.cli.train_sft --config ...

``maybe_initialize_distributed()`` is a no-op for single-process runs, so
every CLI calls it unconditionally.
"""

from __future__ import annotations

import dataclasses
import os

import jax
import numpy as np


_ENV_COORD = ("COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS")
_ENV_NPROC = ("NUM_PROCESSES", "JAX_NUM_PROCESSES")
_ENV_PID = ("PROCESS_ID", "JAX_PROCESS_ID")


def detect_distributed_mode(env: "dict[str, str] | None" = None):
    """Pure decision table for the bootstrap (testable without touching
    the real runtime): returns ("explicit", kwargs), ("auto", {}), or
    None for single-process.

    Explicit COORDINATOR_ADDRESS/NUM_PROCESSES/PROCESS_ID wins (manual /
    test launches).  The TPU-pod auto path needs a marker naming MULTIPLE
    workers: single-host runtimes (including tunneled single-chip setups)
    also export TPU_WORKER_HOSTNAMES with one entry, and a no-arg
    jax.distributed.initialize() would fail there.
    """
    env = os.environ if env is None else env

    def pick(names):
        for n in names:
            if env.get(n):
                return env[n]
        return None

    coord = pick(_ENV_COORD)
    nproc = pick(_ENV_NPROC)
    pid = pick(_ENV_PID)
    if coord and nproc is not None and pid is not None:
        return "explicit", dict(
            coordinator_address=coord,
            num_processes=int(nproc),
            process_id=int(pid),
        )
    hostnames = env.get("TPU_WORKER_HOSTNAMES", "")
    if len(hostnames.split(",")) > 1 or env.get(
        "MEGASCALE_COORDINATOR_ADDRESS"
    ):
        return "auto", {}
    return None


def maybe_initialize_distributed() -> bool:
    """Call jax.distributed.initialize when launched multi-process.

    Returns True when a multi-process runtime was initialized; the
    decision table lives in detect_distributed_mode (the explicit path is
    executed for real by tests/test_multiprocess.py).
    """
    mode = detect_distributed_mode()
    if mode is None:
        return False
    jax.distributed.initialize(**mode[1])
    return True


@dataclasses.dataclass(frozen=True)
class ProcessTopology:
    """What this process sees of the global device space."""

    process_index: int
    process_count: int
    local_device_count: int
    global_device_count: int

    @property
    def is_primary(self) -> bool:
        return self.process_index == 0


def topology() -> ProcessTopology:
    return ProcessTopology(
        process_index=jax.process_index(),
        process_count=jax.process_count(),
        local_device_count=jax.local_device_count(),
        global_device_count=jax.device_count(),
    )


def host_batch_slice(global_batch: int) -> slice:
    """The rows of the global batch this host should feed.

    Data loading is per-host: every host materializes only its slice and
    ``make_global_batch`` assembles the logically-global array (the
    torchrun-DistributedSampler analogue).
    """
    topo = topology()
    if global_batch % topo.process_count:
        raise ValueError(
            f"global batch {global_batch} not divisible by "
            f"{topo.process_count} processes"
        )
    per_host = global_batch // topo.process_count
    start = topo.process_index * per_host
    return slice(start, start + per_host)


def make_global_batch(local_arrays, mesh, batch_axes=("dp", "fsdp")):
    """Assemble per-host arrays into global jax.Arrays on a multi-host mesh.

    ``local_arrays``: pytree of numpy arrays holding only this host's rows
    (see host_batch_slice).  Batch dim 0 is sharded over ``batch_axes``;
    all other dims are replicated.  Single-process meshes pass through
    jax.device_put directly.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    def put(x):
        x = np.asarray(x)
        spec = P(batch_axes, *([None] * (x.ndim - 1)))
        sharding = NamedSharding(mesh, spec)
        if jax.process_count() == 1:
            return jax.device_put(x, sharding)
        global_shape = (x.shape[0] * jax.process_count(),) + x.shape[1:]
        return jax.make_array_from_process_local_data(
            sharding, x, global_shape
        )

    return jax.tree.map(put, local_arrays)
