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
    single file; returns a flat name -> array dict (numpy, zero-copy)."""
    from safetensors.numpy import load_file

    if os.path.isfile(path):
        return load_file(path)
    index = os.path.join(path, "model.safetensors.index.json")
    state: dict[str, np.ndarray] = {}
    if os.path.exists(index):
        with open(index) as f:
            weight_map = json.load(f)["weight_map"]
        for shard in sorted(set(weight_map.values())):
            state.update(load_file(os.path.join(path, shard)))
        return state
    files = [f for f in os.listdir(path) if f.endswith(".safetensors")]
    if not files:
        raise FileNotFoundError(f"no safetensors found under {path}")
    for f in sorted(files):
        state.update(load_file(os.path.join(path, f)))
    return state


def _stack_layers(
    state: Mapping[str, np.ndarray],
    template: str,
    num_layers: int,
    transpose: bool = False,
    dtype=jnp.float32,
):
    arrs = []
    for i in range(num_layers):
        a = np.asarray(state[template.format(i=i)])
        arrs.append(a.T if transpose else a)
    return jnp.asarray(np.stack(arrs), dtype=dtype)


def _get(state, name, transpose=False, dtype=jnp.float32):
    a = np.asarray(state[name])
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
