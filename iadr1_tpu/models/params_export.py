"""Param pytree -> HF safetensors export.

The reverse of params_io/convert_* and the counterpart of the reference's
model export/merge (llamafactory/train/tuner.py export_model:95-173): after
PA-SFT or SC-GRPO, write an HF-layout checkpoint so the next stage (or any
HF/vLLM consumer) can load it.  Layer-stacked leaves are unstacked to
``layers.{i}.`` entries and kernels transposed back to [out, in].
"""

from __future__ import annotations

import json
import os

import numpy as np


def _put(state: dict, name: str, arr, transpose=False):
    a = np.asarray(arr, np.float32)
    state[name] = a.T.copy() if transpose else a


def _unstack(state: dict, template: str, arr, transpose=False):
    a = np.asarray(arr, np.float32)
    for i in range(a.shape[0]):
        x = a[i]
        state[template.format(i=i)] = x.T.copy() if transpose else x.copy()


def export_qwen2(params: dict, cfg, prefix: str = "model.") -> dict:
    """Qwen2 decoder pytree -> HF state dict (numpy)."""
    state: dict = {}
    lt = prefix + "layers.{i}."
    _put(state, prefix + "embed_tokens.weight", params["embed"]["weight"])
    layers = params["layers"]
    _unstack(state, lt + "input_layernorm.weight", layers["input_norm"])
    _unstack(state, lt + "post_attention_layernorm.weight",
             layers["post_attn_norm"])
    for name in ("q", "k", "v", "o"):
        _unstack(state, lt + f"self_attn.{name}_proj.weight",
                 layers["attn"][name]["kernel"], transpose=True)
        if "bias" in layers["attn"][name]:
            _unstack(state, lt + f"self_attn.{name}_proj.bias",
                     layers["attn"][name]["bias"])
    for name in ("gate", "up", "down"):
        _unstack(state, lt + f"mlp.{name}_proj.weight",
                 layers["mlp"][name]["kernel"], transpose=True)
    _put(state, prefix + "norm.weight", params["final_norm"])
    if not cfg.tie_word_embeddings:
        _put(state, "lm_head.weight", params["lm_head"]["kernel"],
             transpose=True)
    return state


def export_qwen2_vl_vision(params: dict, vcfg, prefix: str = "visual.") -> dict:
    state: dict = {}
    bt = prefix + "blocks.{i}."
    pk = np.asarray(params["patch_embed"]["kernel"], np.float32).T
    state[prefix + "patch_embed.proj.weight"] = pk.reshape(
        pk.shape[0], vcfg.in_channels, vcfg.temporal_patch_size,
        vcfg.patch_size, vcfg.patch_size,
    ).copy()
    blocks = params["blocks"]
    if isinstance(blocks["norm1"], dict):  # qwen2-vl LayerNorm
        _unstack(state, bt + "norm1.weight", blocks["norm1"]["scale"])
        _unstack(state, bt + "norm1.bias", blocks["norm1"]["bias"])
        _unstack(state, bt + "norm2.weight", blocks["norm2"]["scale"])
        _unstack(state, bt + "norm2.bias", blocks["norm2"]["bias"])
    else:  # qwen2.5-vl RMSNorm
        _unstack(state, bt + "norm1.weight", blocks["norm1"])
        _unstack(state, bt + "norm2.weight", blocks["norm2"])
    _unstack(state, bt + "attn.qkv.weight", blocks["attn"]["qkv"]["kernel"], True)
    _unstack(state, bt + "attn.qkv.bias", blocks["attn"]["qkv"]["bias"])
    _unstack(state, bt + "attn.proj.weight", blocks["attn"]["proj"]["kernel"], True)
    _unstack(state, bt + "attn.proj.bias", blocks["attn"]["proj"]["bias"])
    if "fc1" in blocks["mlp"]:  # qwen2-vl
        _unstack(state, bt + "mlp.fc1.weight", blocks["mlp"]["fc1"]["kernel"], True)
        _unstack(state, bt + "mlp.fc1.bias", blocks["mlp"]["fc1"]["bias"])
        _unstack(state, bt + "mlp.fc2.weight", blocks["mlp"]["fc2"]["kernel"], True)
        _unstack(state, bt + "mlp.fc2.bias", blocks["mlp"]["fc2"]["bias"])
    else:  # qwen2.5-vl swiglu
        for name in ("gate", "up", "down"):
            _unstack(state, bt + f"mlp.{name}_proj.weight",
                     blocks["mlp"][name]["kernel"], True)
            _unstack(state, bt + f"mlp.{name}_proj.bias",
                     blocks["mlp"][name]["bias"])
    merger = params["merger"]
    if isinstance(merger["ln_q"], dict):
        _put(state, prefix + "merger.ln_q.weight", merger["ln_q"]["scale"])
        _put(state, prefix + "merger.ln_q.bias", merger["ln_q"]["bias"])
    else:
        _put(state, prefix + "merger.ln_q.weight", merger["ln_q"])
    _put(state, prefix + "merger.mlp.0.weight", merger["fc1"]["kernel"], True)
    _put(state, prefix + "merger.mlp.0.bias", merger["fc1"]["bias"])
    _put(state, prefix + "merger.mlp.2.weight", merger["fc2"]["kernel"], True)
    _put(state, prefix + "merger.mlp.2.bias", merger["fc2"]["bias"])
    return state


def export_params(bundle, params: dict) -> dict:
    """Family dispatch -> HF state dict."""
    family = bundle.family
    if family == "qwen2":
        return export_qwen2(params, bundle.cfg)
    if family in ("qwen2_vl", "qwen2_5_vl"):
        state = export_qwen2(params["text"], bundle.cfg.text,
                             prefix="model.language_model.")
        state.update(export_qwen2_vl_vision(
            params["vision"], bundle.cfg.vision, prefix="model.visual."))
        return state
    raise ValueError(f"export not implemented for family {family!r}")


def save_pretrained(bundle, params: dict, out_dir: str,
                    source_dir: str | None = None) -> None:
    """Write model.safetensors (+ config/tokenizer copied from source)."""
    from safetensors.numpy import save_file

    os.makedirs(out_dir, exist_ok=True)
    state = export_params(bundle, params)
    save_file(state, os.path.join(out_dir, "model.safetensors"))
    if source_dir:
        import shutil

        for name in ("config.json", "generation_config.json",
                     "tokenizer_config.json", "tokenizer.json",
                     "vocab.json", "merges.txt", "special_tokens_map.json",
                     "preprocessor_config.json", "chat_template.json"):
            src = os.path.join(source_dir, name)
            if os.path.exists(src):
                shutil.copy(src, os.path.join(out_dir, name))
