"""Int8 weight-only quantization for serving/eval.

Counterpart of the reference's quantization hooks (model/patcher.py
quantization config + model_utils/quantization.py, bitsandbytes/GPTQ on
GPU).  TPU-native design: per-output-channel symmetric int8 with f32
scales, dequantized on the fly inside the matmul producer -- XLA fuses
``qvalues * scales`` into the tile load, so weight HBM traffic halves
(the binding constraint of autoregressive decode) while the MXU still
runs its native bf16 pipeline.  Quantized kernels are plain pytree dicts
``{"qvalues": int8 [..., in, out], "scales": f32 [..., 1, out]}`` --
models.common.dense consumes either layout transparently, and stacked
[L, in, out] decoder kernels quantize per layer per channel.

Weight-only (activations stay bf16): no calibration data needed, exact
for the memory-bound decode regime it targets.  lm_head and embeddings
stay full precision (logit fidelity; tied weights).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp


def quantize_kernel(w: jax.Array) -> dict:
    """[..., in, out] float kernel -> int8 qvalues + per-channel scales."""
    absmax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=-2, keepdims=True)
    scales = jnp.where(absmax == 0, 1.0, absmax / 127.0)
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scales), -127, 127)
    return {"qvalues": q.astype(jnp.int8), "scales": scales}


def dequantize_kernel(qk: dict, dtype=jnp.float32) -> jax.Array:
    return (qk["qvalues"].astype(jnp.float32) * qk["scales"]).astype(dtype)


def is_quantized(kernel) -> bool:
    return isinstance(kernel, dict) and "qvalues" in kernel


def default_quant_predicate(path: str, leaf) -> bool:
    """Quantize decoder/tower linear kernels; keep lm_head + embeddings
    (and every 1-D leaf) full precision."""
    return (
        path.endswith("kernel")
        and leaf.ndim >= 2
        and "lm_head" not in path
        and "embed" not in path
    )


def quantize_tree(
    params: Any,
    predicate: Callable[[str, Any], bool] = default_quant_predicate,
) -> Any:
    """Replace targeted kernel leaves with {"qvalues", "scales"} dicts."""

    def _path_str(path) -> str:
        return "/".join(
            str(getattr(k, "key", getattr(k, "idx", k))) for k in path
        )

    def per_leaf(path, leaf):
        if predicate(_path_str(path), leaf):
            return quantize_kernel(leaf)
        return leaf

    return jax.tree_util.tree_map_with_path(per_leaf, params)


def quantized_bytes(tree: Any) -> tuple[int, int]:
    """(bytes now, bytes if everything were bf16) -- for reporting."""
    now = sum(
        leaf.size * leaf.dtype.itemsize
        for leaf in jax.tree_util.tree_leaves(tree)
    )
    bf16 = sum(
        leaf.size * 2 for leaf in jax.tree_util.tree_leaves(tree)
    )
    return now, bf16
