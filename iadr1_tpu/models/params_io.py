"""HF safetensors checkpoint -> JAX param pytree converters.

The reference loads models with AutoModelForVision2Seq.from_pretrained
(llamafactory/model/loader.py:186-194); here each family gets an explicit
weight mapping with stacking of the per-layer tensors onto a leading layer
axis (for scan-over-layers).  Dense kernels are transposed from HF's
[out, in] to our [in, out].
"""

from __future__ import annotations

import json
import os
import re
from typing import Callable, Mapping

import jax.numpy as jnp
import numpy as np


def load_safetensors_path(path: str) -> dict[str, np.ndarray]:
    """Load one .safetensors file, a sharded checkpoint dir, or a dir with a
    single file; returns a flat name -> array dict (numpy, zero-copy).

    GPTQ/AWQ checkpoints (packed ``.qweight`` tensors) are rewritten into
    in-repo quant dicts transparently (convert_prequantized_state), so the
    family converters and the QLoRA path consume them unchanged."""
    from safetensors.numpy import load_file

    if os.path.isfile(path):
        return _maybe_prequantized(load_file(path))
    index = os.path.join(path, "model.safetensors.index.json")
    state: dict[str, np.ndarray] = {}
    if os.path.exists(index):
        with open(index) as f:
            weight_map = json.load(f)["weight_map"]
        for shard in sorted(set(weight_map.values())):
            state.update(load_file(os.path.join(path, shard)))
        return _maybe_prequantized(state)
    files = [f for f in os.listdir(path) if f.endswith(".safetensors")]
    if not files:
        raise FileNotFoundError(f"no safetensors found under {path}")
    for f in sorted(files):
        state.update(load_file(os.path.join(path, f)))
    return _maybe_prequantized(state)


def _maybe_prequantized(state: dict) -> dict:
    if any(k.endswith(".qweight") for k in state):
        return convert_prequantized_state(state)
    return state


def _stack_layers(
    state: Mapping[str, np.ndarray],
    template: str,
    num_layers: int,
    transpose: bool = False,
    dtype=jnp.float32,
):
    entries = [state[template.format(i=i)] for i in range(num_layers)]
    if isinstance(entries[0], dict):
        # pre-quantized linears: stack each quant-dict field onto the
        # layer axis (the blockwise layout supports leading dims)
        return {
            k: jnp.asarray(np.stack([np.asarray(e[k]) for e in entries]))
            for k in entries[0]
        }
    arrs = []
    for a in entries:
        a = np.asarray(a)
        arrs.append(a.T if transpose else a)
    return jnp.asarray(np.stack(arrs), dtype=dtype)


def _get(state, name, transpose=False, dtype=jnp.float32):
    a = state[name]
    if isinstance(a, dict):
        # pre-quantized linear imported by convert_prequantized_state:
        # already in the in-repo [in, out] quant-dict layout -- the HF
        # [out, in] transpose does not apply
        return {k: jnp.asarray(v) for k, v in a.items()}
    a = np.asarray(a)
    return jnp.asarray(a.T if transpose else a, dtype=dtype)


def convert_qwen2(
    state: Mapping[str, np.ndarray],
    cfg,
    prefix: str = "model.",
    dtype=jnp.float32,
) -> dict:
    """HF Qwen2ForCausalLM (or the text half of Qwen2-VL) -> param pytree.

    Accepts both flat CausalLM checkpoints (prefix "model.") and the text
    submodule of VLM checkpoints (e.g. prefix "model.language_model." for
    new-style Qwen2-VL, or "language_model.model.").
    """
    L = cfg.num_hidden_layers
    lt = prefix + "layers.{i}."
    params = {
        "embed": {"weight": _get(state, prefix + "embed_tokens.weight", dtype=dtype)},
        "layers": {
            "input_norm": _stack_layers(state, lt + "input_layernorm.weight", L, dtype=dtype),
            "post_attn_norm": _stack_layers(
                state, lt + "post_attention_layernorm.weight", L, dtype=dtype
            ),
            "attn": {
                "q": {"kernel": _stack_layers(state, lt + "self_attn.q_proj.weight", L, True, dtype)},
                "k": {"kernel": _stack_layers(state, lt + "self_attn.k_proj.weight", L, True, dtype)},
                "v": {"kernel": _stack_layers(state, lt + "self_attn.v_proj.weight", L, True, dtype)},
                "o": {"kernel": _stack_layers(state, lt + "self_attn.o_proj.weight", L, True, dtype)},
            },
            "mlp": {
                "gate": {"kernel": _stack_layers(state, lt + "mlp.gate_proj.weight", L, True, dtype)},
                "up": {"kernel": _stack_layers(state, lt + "mlp.up_proj.weight", L, True, dtype)},
                "down": {"kernel": _stack_layers(state, lt + "mlp.down_proj.weight", L, True, dtype)},
            },
        },
        "final_norm": _get(state, prefix + "norm.weight", dtype=dtype),
    }
    if cfg.attention_bias and (lt.format(i=0) + "self_attn.q_proj.bias") in state:
        params["layers"]["attn"]["q"]["bias"] = _stack_layers(
            state, lt + "self_attn.q_proj.bias", L, dtype=dtype
        )
        params["layers"]["attn"]["k"]["bias"] = _stack_layers(
            state, lt + "self_attn.k_proj.bias", L, dtype=dtype
        )
        params["layers"]["attn"]["v"]["bias"] = _stack_layers(
            state, lt + "self_attn.v_proj.bias", L, dtype=dtype
        )
    if not cfg.tie_word_embeddings:
        # lm_head may live at top level regardless of prefix
        head_name = "lm_head.weight"
        if head_name not in state:
            head_name = prefix.split(".")[0] + ".lm_head.weight"
        params["lm_head"] = {"kernel": _get(state, head_name, True, dtype)}
    return params


def hf_state_from_torch(model) -> dict[str, np.ndarray]:
    """torch module -> name -> numpy dict (for parity tests)."""
    return {k: v.detach().cpu().float().numpy() for k, v in model.state_dict().items()}


# ---------------------------------------------------------------------------
# pre-quantized checkpoint import (GPTQ / AWQ)
# ---------------------------------------------------------------------------
# The reference loads already-quantized hub checkpoints through bnb/optimum
# (llamafactory/model_utils/quantization.py:131-158 configure_quantization,
# "quantization_config" in model config).  Here the packed GPTQ/AWQ tensors
# are rewritten EXACTLY (no requantization error) into the in-repo
# asymmetric-uint4 blockwise layout ({q4, zeros, scales},
# models/quant.py dequantize_kernel), which the QLoRA training path and
# merge_lora already consume.

# AWQ packs 8 uint4 values per int32 in the interleaved column order
# [0, 2, 4, 6, 1, 3, 5, 7] (awq/utils/packing_utils.py); GPTQ packs 8
# consecutive rows per int32, low nibble first.
_AWQ_ORDER = np.array([0, 2, 4, 6, 1, 3, 5, 7])


def _unpack_rows_le(packed: np.ndarray) -> np.ndarray:
    """GPTQ qweight int32 [in/8, out] -> uint8 [in, out] (low nibble =
    first row of the word)."""
    shifts = (4 * np.arange(8)).astype(np.uint32)
    vals = (packed[:, None, :].astype(np.uint32) >> shifts[None, :, None]) & 0xF
    return vals.reshape(-1, packed.shape[-1]).astype(np.uint8)


def _unpack_cols_awq(packed: np.ndarray) -> np.ndarray:
    """AWQ qweight/qzeros int32 [..., out/8] -> uint8 [..., out]
    (interleaved nibble order)."""
    shifts = (4 * np.arange(8)).astype(np.uint32)
    vals = (packed[..., :, None].astype(np.uint32) >> shifts) & 0xF
    out = np.empty_like(vals)
    out[..., _AWQ_ORDER] = vals
    return out.reshape(*packed.shape[:-1], -1).astype(np.uint8)


def _pack_uint4_pairs(q: np.ndarray) -> np.ndarray:
    """uint8 [in, out] (values 0..15) -> uint8 [in/2, out] nibble-packed
    (models/quant.py _unpack_nibbles layout: even rows in the low nibble)."""
    if q.shape[0] % 2:
        raise ValueError(f"odd in_dim {q.shape[0]} cannot nibble-pack")
    return (q[0::2] | (q[1::2] << 4)).astype(np.uint8)


def gptq_layer_to_quant(qweight, qzeros, scales, g_idx=None) -> dict:
    """AutoGPTQ 4-bit tensors -> in-repo asymmetric quant dict.

    qweight int32 [in/8, out], qzeros int32 [nb, out/8] storing zero-1
    (classic AutoGPTQ convention: dequant subtracts qzeros+1), scales
    f16 [nb, out].  desc_act checkpoints (non-trivial g_idx row
    permutations) are rejected -- the scan-stacked kernels need uniform
    per-block rows."""
    qweight = np.asarray(qweight)
    qzeros = np.asarray(qzeros)
    scales = np.asarray(scales, np.float32)
    q = _unpack_rows_le(qweight)                       # [in, out]
    in_dim = q.shape[0]
    nb = scales.shape[0]
    if g_idx is not None:
        expect = np.arange(in_dim) // (in_dim // nb)
        if not np.array_equal(np.asarray(g_idx), expect):
            raise NotImplementedError(
                "GPTQ desc_act=True (permuted g_idx) is unsupported; "
                "re-export the checkpoint with desc_act=False")
    shifts = (4 * np.arange(8)).astype(np.uint32)
    z = (qzeros[:, :, None].astype(np.uint32) >> shifts) & 0xF
    zeros = z.reshape(nb, -1).astype(np.float32) + 1.0  # the GPTQ +1
    return {"q4": _pack_uint4_pairs(q), "zeros": zeros, "scales": scales}


def awq_layer_to_quant(qweight, qzeros, scales) -> dict:
    """AWQ GEMM 4-bit tensors -> in-repo asymmetric quant dict.

    qweight int32 [in, out/8], qzeros int32 [nb, out/8], scales
    f16 [nb, out]; columns interleaved by _AWQ_ORDER."""
    q = _unpack_cols_awq(np.asarray(qweight))          # [in, out]
    zeros = _unpack_cols_awq(np.asarray(qzeros)).astype(np.float32)
    return {"q4": _pack_uint4_pairs(q), "zeros": zeros,
            "scales": np.asarray(scales, np.float32)}


def convert_prequantized_state(state: dict) -> dict:
    """Rewrite every packed GPTQ/AWQ linear in a flat HF state dict into
    an in-repo quant dict stored under ``<name>.weight`` so the family
    converters (convert_qwen2 & co.) pick it up transparently.

    Format detection is per-tensor: GPTQ packs along in (qweight columns
    == scales columns), AWQ packs along out (qweight columns * 8)."""
    out = dict(state)
    for key in [k for k in state if k.endswith(".qweight")]:
        base = key[: -len("qweight")]
        qweight = state[key]
        qzeros = state[base + "qzeros"]
        scales = state[base + "scales"]
        if qweight.shape[-1] == scales.shape[-1]:
            qd = gptq_layer_to_quant(qweight, qzeros, scales,
                                     g_idx=state.get(base + "g_idx"))
        else:
            qd = awq_layer_to_quant(qweight, qzeros, scales)
        out[base + "weight"] = qd
        for suffix in ("qweight", "qzeros", "scales", "g_idx"):
            out.pop(base + suffix, None)
    return out
