"""Device mesh construction and logical-axis sharding.

The parallelism menu (SURVEY.md section 2.4): the reference runs DP (DDP) +
ZeRO-3 sharded DP for training and Megatron TP inside vLLM for inference.
Here all of it is one mesh with three named axes:

* ``dp``   -- pure data parallelism (batch split, params replicated)
* ``fsdp`` -- ZeRO-3 analogue: batch split AND params/optimizer sharded
* ``tp``   -- tensor parallelism for >=7B models and rollout

Parameters carry *logical* axis names (e.g. ``("embed", "mlp")``); a rule
table maps logical names to mesh axes.  ``jit`` + ``NamedSharding`` then
inserts all-gathers / reduce-scatters over ICI automatically -- the XLA
replacement for DeepSpeed's gather/partition machinery
(scripts/train/zero3.json in the reference).
"""

from __future__ import annotations

import contextlib
import dataclasses
from typing import Any, Mapping, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

MESH_AXES = ("dp", "fsdp", "tp")

# Ambient mesh consulted by the Pallas kernels (kernels/flash_attention.py,
# kernels/decode_attention.py) at trace time: a pallas_call has no GSPMD
# partitioning rule, so under a >1-device mesh the kernels wrap themselves
# in jax.shard_map (batch -> dp/fsdp, heads -> tp) against this mesh.
# build_mesh() sets it; tests scope it with kernel_mesh_scope().
_KERNEL_MESH: Mesh | None = None


def set_kernel_mesh(mesh: Mesh | None) -> Mesh | None:
    """Set the ambient kernel mesh; returns the previous value."""
    global _KERNEL_MESH
    prev = _KERNEL_MESH
    _KERNEL_MESH = mesh
    return prev


def kernel_mesh() -> Mesh | None:
    return _KERNEL_MESH


@contextlib.contextmanager
def kernel_mesh_scope(mesh: Mesh | None):
    """Temporarily set (or clear, with None) the ambient kernel mesh."""
    prev = set_kernel_mesh(mesh)
    try:
        yield mesh
    finally:
        set_kernel_mesh(prev)

# Default logical-axis -> mesh-axis rules.  "embed"-sharded over fsdp gives
# the ZeRO-3 analogue; vocab/mlp/heads over tp gives Megatron-style TP.
DEFAULT_RULES: dict[str, str | None] = {
    "batch": "dp",          # leading batch dim of activations
    "fsdp_batch": "fsdp",   # batch dims may also split over fsdp
    "embed": "fsdp",        # param hidden dim -> ZeRO-3 style shard
    "vocab": "tp",
    "mlp": "tp",
    "heads": "tp",
    "kv_heads": "tp",
    "qkv": "tp",
    "seq": None,            # sequence axis unsharded (no CP in the recipe)
    "head_dim": None,
    "patch": None,
    "norm": None,
    # MoE expert axis rides the tp submesh (expert parallelism: each tp
    # shard holds E/tp experts; the dispatch all-to-all is XLA's to insert)
    "expert": "tp",
}


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Sizes of the three mesh axes; -1 on at most one axis means "fill"."""

    dp: int = 1
    fsdp: int = -1
    tp: int = 1

    def resolve(self, n_devices: int) -> tuple[int, int, int]:
        sizes = [self.dp, self.fsdp, self.tp]
        fill = [i for i, s in enumerate(sizes) if s == -1]
        if len(fill) > 1:
            raise ValueError("at most one mesh axis may be -1")
        if fill:
            known = int(np.prod([s for s in sizes if s != -1]))
            if n_devices % known:
                raise ValueError(
                    f"{n_devices} devices not divisible by fixed axes {known}"
                )
            sizes[fill[0]] = n_devices // known
        if int(np.prod(sizes)) != n_devices:
            raise ValueError(
                f"mesh {tuple(sizes)} does not cover {n_devices} devices"
            )
        return tuple(sizes)


def build_mesh(
    config: MeshConfig | None = None, devices: Sequence[jax.Device] | None = None
) -> Mesh:
    """Build the (dp, fsdp, tp) mesh over the given (default: all) devices.

    Axis order matters for ICI locality: tp innermost so tensor-parallel
    collectives ride the fastest links, dp outermost.
    """
    config = config or MeshConfig()
    if devices is None:
        shape = config.resolve(jax.device_count())
        try:
            # ICI/DCN-aware assignment (multi-host: contiguous local chips
            # land on the inner axes so tp/fsdp collectives stay on-host/ICI)
            from jax.experimental import mesh_utils

            dev_array = mesh_utils.create_device_mesh(shape)
        except Exception:
            dev_array = np.asarray(jax.devices()).reshape(shape)
    else:
        devices = list(devices)
        shape = config.resolve(len(devices))
        dev_array = np.asarray(devices).reshape(shape)
    mesh = Mesh(dev_array, MESH_AXES)
    # Building a mesh declares intent to run on it: arm the Pallas kernels'
    # shard_map wrapping so flash/decode attention partition over it instead
    # of falling into GSPMD's no-rule replication path.
    set_kernel_mesh(mesh)
    return mesh


def logical_to_mesh_axes(
    logical: Sequence[str | None], rules: Mapping[str, str | None] | None = None
) -> P:
    """Translate a tuple of logical axis names to a PartitionSpec."""
    rules = rules or DEFAULT_RULES
    mesh_axes = []
    for name in logical:
        if name is None:
            mesh_axes.append(None)
        else:
            if name not in rules:
                raise KeyError(f"no sharding rule for logical axis {name!r}")
            mesh_axes.append(rules[name])
    return P(*mesh_axes)


def named_sharding(
    mesh: Mesh,
    logical: Sequence[str | None],
    rules: Mapping[str, str | None] | None = None,
) -> NamedSharding:
    return NamedSharding(mesh, logical_to_mesh_axes(logical, rules))


def shard_pytree(
    tree: Any,
    logical_tree: Any,
    mesh: Mesh,
    rules: Mapping[str, str | None] | None = None,
) -> Any:
    """Device-put every leaf of ``tree`` with the sharding derived from the
    parallel ``logical_tree`` of logical-axis tuples."""
    shardings = jax.tree.map(
        lambda logical: named_sharding(mesh, logical, rules),
        logical_tree,
        is_leaf=lambda x: isinstance(x, tuple),
    )
    return jax.device_put(tree, shardings)


def pytree_shardings(
    logical_tree: Any, mesh: Mesh, rules: Mapping[str, str | None] | None = None
) -> Any:
    """NamedSharding pytree (for jit in_shardings/out_shardings) from a
    logical-axis pytree."""
    return jax.tree.map(
        lambda logical: named_sharding(mesh, logical, rules),
        logical_tree,
        is_leaf=lambda x: isinstance(x, tuple),
    )


# Batch keys whose LEADING dim is the example batch (split over dp x fsdp).
# Everything else -- the host-precomputed vision index plans (patch stream,
# rotary tables, window permutations, scatter indices) -- replicates: they
# are small, consumed by gathers/scatters that would otherwise force XLA to
# guess a layout per program, and inconsistent guesses across consecutive
# programs trigger SPMD involuntary full rematerialization (observed on the
# f32[1,8,64] vision rotary tables entering prefill vs update with
# incompatible auto-shardings).
_BATCH_LEADING_KEYS = frozenset({
    "input_ids", "labels", "segment_ids", "attention_mask",
    "prompt_ids", "prompt_segments", "prompt_positions",
    "completion_ids", "completion_mask", "completion_positions",
    "advantages", "old_logps", "ref_logps", "rewards",
    "chosen_ids", "rejected_ids", "chosen_labels", "rejected_labels",
    "mrope_deltas",
})


def batch_shardings(mesh: Mesh, batch: Mapping[str, Any]) -> dict:
    """Explicit NamedShardings for a training/rollout batch dict.

    Token-shaped arrays split their batch dim over (dp, fsdp) when it
    divides evenly (falling back to replication otherwise -- tiny smoke
    batches); ``position_ids`` may carry a leading M-RoPE section axis
    [3, B, T] whose batch dim is axis 1; all vision auxiliaries replicate.
    """
    n_batch_devs = mesh.shape["dp"] * mesh.shape["fsdp"]
    data = P(("dp", "fsdp"))
    rep = P()

    def spec_for(key, v):
        shape = getattr(v, "shape", None)
        if shape is None:
            return rep
        if key == "position_ids":
            if len(shape) == 3:  # [sections, B, T] M-RoPE layout
                if shape[1] % n_batch_devs == 0:
                    return P(None, ("dp", "fsdp"))
                return rep
            key = "input_ids"  # fall through to batch-leading handling
        if key in _BATCH_LEADING_KEYS and shape and \
                shape[0] % n_batch_devs == 0:
            return data
        return rep

    return {k: NamedSharding(mesh, spec_for(k, v)) for k, v in batch.items()}


def constrain_replicated(x):
    """Pin a small aux array to a fully-replicated sharding under the
    ambient kernel mesh (no-op without one, or when
    IADR1_DISABLE_AUX_CONSTRAINTS is set -- the 72B-shape CPU dryrun leg
    disables them: each constraint-induced reshard is an extra collective
    rendezvous, and XLA CPU hard-aborts any collective whose skew exceeds
    a hardcoded 40 s on the single-core virtual mesh).

    Use inside rematerialized regions on host-precomputed index plans
    (vision rotary tables, scatter plans): XLA otherwise auto-picks a
    sharding per program side of the jax.checkpoint boundary, and a
    fwd-vs-replay mismatch forces SPMD involuntary full rematerialization
    (observed on f32[1,8,64] rotary tables at the 8-device dryrun)."""
    import os as _os

    if _os.environ.get("IADR1_DISABLE_AUX_CONSTRAINTS"):
        return x
    mesh = kernel_mesh()
    if mesh is None or x is None:
        return x
    try:
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, P()))
    except Exception:  # outside jit, or incompatible context
        return x


def constrain_batch_aux(x):
    """Pin a batch-leading derived array (rope cos/sin tables) to an
    explicit sharding under the ambient kernel mesh: batch dim over
    (dp, fsdp) when divisible, replicated otherwise.  Same motivation as
    constrain_replicated -- the fwd and the jax.checkpoint replay
    otherwise auto-pick different shardings for these small tensors and
    SPMD inserts an involuntary full rematerialization between them."""
    import os as _os

    if _os.environ.get("IADR1_DISABLE_AUX_CONSTRAINTS"):
        return x
    mesh = kernel_mesh()
    shape = getattr(x, "shape", None)
    if mesh is None or not shape:
        return x
    n = mesh.shape["dp"] * mesh.shape["fsdp"]
    if shape[0] >= n and shape[0] % n == 0:
        spec = P(("dp", "fsdp"), *([None] * (len(shape) - 1)))
    else:
        spec = P()
    try:
        return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))
    except Exception:  # outside jit or incompatible trace context
        return x


def constrain_scan_chunks(x):
    """Pin a [n_chunks, chunk, ...] scan input (chunked-CE / chunked-logp
    token blocks) to a consistent sharding: chunk rows over (dp, fsdp)
    when divisible, replicated otherwise.  Each chunk crosses a
    jax.checkpoint boundary per scan step; without the constraint the fwd
    and the replay auto-pick different layouts (SPMD involuntary full
    rematerialization, observed on the MoE chunked-CE and shared-prompt
    GRPO logp legs of the 8-device dryrun)."""
    import os as _os

    if _os.environ.get("IADR1_DISABLE_AUX_CONSTRAINTS"):
        return x
    mesh = kernel_mesh()
    shape = getattr(x, "shape", None)
    if mesh is None or not shape or len(shape) < 2:
        return x
    n = mesh.shape["dp"] * mesh.shape["fsdp"]
    if shape[1] >= n and shape[1] % n == 0:
        spec = P(None, ("dp", "fsdp"), *([None] * (len(shape) - 2)))
    else:
        spec = P()
    try:
        return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))
    except Exception:  # outside jit or incompatible trace context
        return x


def shard_batch(mesh: Mesh, batch: Mapping[str, Any]) -> dict:
    """device_put the batch with batch_shardings -- call before feeding a
    jit program so consecutive programs (prefill/update, xla/flash) see one
    consistent layout instead of per-program auto-sharding guesses."""
    shardings = batch_shardings(mesh, batch)
    return {k: jax.device_put(v, shardings[k]) for k, v in batch.items()}
