"""Weight-only quantization: int8 (serving) + int4/NF4 (QLoRA-class).

Counterpart of the reference's quantization hooks (model/patcher.py
quantization config + model_utils/quantization.py: bitsandbytes 4-bit /
GPTQ / AWQ on GPU, and adapter.py's QLoRA path -- frozen quantized base +
LoRA adapters).  TPU-native design:

* **int8**: per-output-channel symmetric, f32 scales, dequantized on the
  fly inside the matmul producer -- XLA fuses ``qvalues * scales`` into
  the tile load, so weight HBM traffic halves (the binding constraint of
  autoregressive decode) while the MXU runs its native bf16 pipeline.
* **int4 / nf4**: blockwise along the contraction axis (default block 64,
  bnb's default), two values packed per uint8 byte -- a quarter of the
  bf16 weight bytes.  ``nf4`` stores 4-bit indices into the bitsandbytes
  NormalFloat codebook (information-optimal for N(0,1) weights, the QLoRA
  paper's format); ``int4`` is symmetric round-to-nearest.  The jnp.int4
  dtype is deliberately NOT used: eager int4 arrays break on the tunneled
  TPU runtime in this image, and explicit nibble unpacking lowers to the
  same handful of fused elementwise ops.

Quantized kernels are plain pytree dicts -- ``models.common.dense``
consumes any of the layouts transparently, and stacked [L, in, out]
decoder kernels quantize per layer:

    int8:  {"qvalues": int8 [..., in, out],  "scales": f32 [..., 1, out]}
    int4:  {"q4":  uint8 [..., in/2, out],   "scales": f32 [..., nb, out]}
    nf4:   {"nf4": uint8 [..., in/2, out],   "scales": f32 [..., nb, out]}

Weight-only (activations stay bf16): no calibration data needed, exact
for the memory-bound decode regime int8 targets; int4/nf4 trade ~1e-2
relative weight error for 4x HBM, recovered by training LoRA adapters on
top (``train/adapters.py`` composes: the base path of ``_lora_dense``
dequantizes in-graph, gradients flow only to the factored A/B).  lm_head
and embeddings stay full precision (logit fidelity; tied weights).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

# bitsandbytes NF4 codebook (QLoRA paper appendix E / bnb functional.py):
# quantiles of N(0, 1) renormalized to [-1, 1], zero exactly representable.
NF4_CODE = (
    -1.0, -0.6961928009986877, -0.5250730514526367, -0.39491748809814453,
    -0.28444138169288635, -0.18477343022823334, -0.09105003625154495, 0.0,
    0.07958029955625534, 0.16093020141124725, 0.24611230194568634,
    0.33791524171829224, 0.44070982933044434, 0.5626170039176941,
    0.7229568362236023, 1.0,
)


def quantize_kernel(w: jax.Array, fmt: str = "int8",
                    block_size: int = 64) -> dict:
    """[..., in, out] float kernel -> quantized dict (see module layouts)."""
    if fmt == "int8":
        absmax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=-2,
                         keepdims=True)
        scales = jnp.where(absmax == 0, 1.0, absmax / 127.0)
        q = jnp.clip(jnp.round(w.astype(jnp.float32) / scales), -127, 127)
        return {"qvalues": q.astype(jnp.int8), "scales": scales}
    if fmt not in ("int4", "nf4"):
        raise ValueError(f"unknown quant format {fmt!r}")

    if w.ndim > 2:
        # stacked [L, ..., in, out] kernels quantize layer by layer:
        # the whole-leaf path materializes ~3 f32 copies (reshape, absmax
        # broadcast, normed) -- ~19 GB transient for a 7B stacked MLP
        # kernel, an observed HBM OOM.  Blocks run along the contraction
        # axis, so per-slice quantization is bit-identical.
        return jax.lax.map(
            lambda ws: quantize_kernel(ws, fmt=fmt, block_size=block_size), w
        )

    *lead, in_dim, out_dim = w.shape
    if in_dim % 2:
        raise ValueError(
            f"int4/nf4 packing needs an even contraction dim, got {in_dim}")
    if in_dim % block_size:
        # shrink to the largest even divisor <= block_size so any in_dim
        # quantizes (power-of-2 hidden sizes hit the fast path)
        block_size = next(b for b in range(min(block_size, in_dim), 0, -1)
                          if in_dim % b == 0 and (b % 2 == 0 or b == 1))
    nb = in_dim // block_size
    w32 = w.astype(jnp.float32).reshape(*lead, nb, block_size, out_dim)
    absmax = jnp.max(jnp.abs(w32), axis=-2)                # [..., nb, out]
    scales = jnp.where(absmax == 0, 1.0, absmax)
    normed = w32 / scales[..., :, None, :]                 # in [-1, 1]
    if fmt == "int4":
        # symmetric RTN: codes 0..14 represent -7..7 (code = q + 7 with a
        # scale of absmax/7); code 15 unused, keeping the grid symmetric
        q = jnp.clip(jnp.round(normed * 7.0), -7, 7) + 7
    else:
        code = jnp.asarray(NF4_CODE, jnp.float32)
        # nearest codebook entry via midpoint bisection (searchsorted):
        # no 16-wide broadcast, so 7B kernels quantize without a 16x
        # intermediate blowup
        mids = (code[:-1] + code[1:]) / 2.0
        q = jnp.searchsorted(mids, normed, side="left")
    q = q.reshape(*lead, in_dim, out_dim).astype(jnp.uint8)
    lo = q[..., 0::2, :]
    hi = q[..., 1::2, :]
    packed = (lo | (hi << 4)).astype(jnp.uint8)            # [..., in/2, out]
    return {("q4" if fmt == "int4" else "nf4"): packed, "scales": scales}


def _unpack_nibbles(packed: jax.Array) -> jax.Array:
    """uint8 [..., in/2, out] -> int32 [..., in, out] (even idx = low)."""
    lo = (packed & 0xF).astype(jnp.int32)
    hi = (packed >> 4).astype(jnp.int32)
    x = jnp.stack([lo, hi], axis=-2)                # [..., in/2, 2, out]
    return x.reshape(*packed.shape[:-2], -1, packed.shape[-1])


def dequantize_kernel(qk: dict, dtype=jnp.float32) -> jax.Array:
    """Quant dict -> dense [..., in, out] kernel (any supported layout).

    This is the in-graph producer ``dense()`` calls: a handful of
    elementwise ops XLA fuses into the consuming matmul's operand read.

    Layouts: first-party symmetric int8 ({qvalues, scales}), symmetric
    int4 ({q4, scales}), NF4 ({nf4, scales}), and the asymmetric uint4
    layout imported from GPTQ/AWQ hub checkpoints ({q4, zeros, scales}:
    w = (q - z) * s blockwise along in -- params_io.convert GPTQ/AWQ)."""
    scales = qk["scales"].astype(jnp.float32)
    if "qvalues" in qk:
        return (qk["qvalues"].astype(jnp.float32) * scales).astype(dtype)
    if "q4" in qk and "zeros" in qk:
        q = _unpack_nibbles(qk["q4"]).astype(jnp.float32)
        *lead, in_dim, out_dim = q.shape
        nb = scales.shape[-2]
        q = q.reshape(*lead, nb, in_dim // nb, out_dim)
        zeros = qk["zeros"].astype(jnp.float32)
        w = (q - zeros[..., :, None, :]) * scales[..., :, None, :]
        return w.reshape(*lead, in_dim, out_dim).astype(dtype)
    if "q4" in qk:
        vals = (_unpack_nibbles(qk["q4"]) - 7).astype(jnp.float32) / 7.0
    elif "nf4" in qk:
        idx = _unpack_nibbles(qk["nf4"])
        vals = jnp.take(jnp.asarray(NF4_CODE, jnp.float32), idx, axis=0)
    else:
        raise ValueError(f"unrecognized quant dict keys {sorted(qk)}")
    *lead, in_dim, out_dim = vals.shape
    nb = scales.shape[-2]
    vals = vals.reshape(*lead, nb, in_dim // nb, out_dim)
    w = vals * scales[..., :, None, :]
    return w.reshape(*lead, in_dim, out_dim).astype(dtype)


def is_quantized(kernel) -> bool:
    return isinstance(kernel, dict) and (
        "qvalues" in kernel or "q4" in kernel or "nf4" in kernel
    )


def quantized_shape(qk: dict) -> tuple[int, ...]:
    """Logical [..., in, out] shape of a quant dict (adapter init needs
    the unpacked dimensions)."""
    if "qvalues" in qk:
        return tuple(qk["qvalues"].shape)
    packed = qk.get("q4", qk.get("nf4"))
    *lead, half, out = packed.shape
    return (*lead, half * 2, out)


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
    fmt: str = "int8",
    block_size: int = 64,
) -> Any:
    """Replace targeted kernel leaves with quantized dicts."""

    def _path_str(path) -> str:
        return "/".join(
            str(getattr(k, "key", getattr(k, "idx", k))) for k in path
        )

    def per_leaf(path, leaf):
        if predicate(_path_str(path), leaf):
            return quantize_kernel(leaf, fmt=fmt, block_size=block_size)
        return leaf

    return jax.tree_util.tree_map_with_path(per_leaf, params)


def dequantize_tree(tree: Any, dtype=jnp.bfloat16) -> Any:
    """Replace every quant dict in ``tree`` with a dense kernel carrying
    the quantization rounding error — the base QLoRA adapters actually
    trained against (export path; reference: peft merge_and_unload keeps
    the bnb base's error in the merged model)."""
    if is_quantized(tree):
        return dequantize_kernel(tree, dtype)
    if isinstance(tree, dict):
        return {k: dequantize_tree(v, dtype) for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        return type(tree)(dequantize_tree(v, dtype) for v in tree)
    return tree


def quantized_bytes(tree: Any) -> tuple[int, int]:
    """(bytes now, bytes if everything were bf16) -- for reporting."""
    now = sum(
        leaf.size * leaf.dtype.itemsize
        for leaf in jax.tree_util.tree_leaves(tree)
    )
    bf16 = 0
    for qk in _iter_quant_dicts_and_leaves(tree):
        if is_quantized(qk):
            import math

            bf16 += 2 * math.prod(quantized_shape(qk))
        else:
            bf16 += qk.size * 2
    return now, bf16


def _iter_quant_dicts_and_leaves(tree):
    if is_quantized(tree):
        yield tree
        return
    if isinstance(tree, dict):
        for v in tree.values():
            yield from _iter_quant_dicts_and_leaves(v)
    elif isinstance(tree, (list, tuple)):
        for v in tree:
            yield from _iter_quant_dicts_and_leaves(v)
    else:
        yield tree
