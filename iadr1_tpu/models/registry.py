"""Model family registry: config resolution, loaders, forward adapters.

The TPU counterpart of the reference's model loader layer
(llamafactory/model/loader.py load_model + AutoModelForVision2Seq routing,
sc_grpo_trainer.py:116-137 family dispatch).  Each family exposes a uniform
bundle: config from an HF config.json dict, param init / HF conversion,
logical sharding axes, and a ``forward(params, batch) -> logits`` adapter
consumed by the SFT/GRPO steps and the rollout engine.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Callable

import jax.numpy as jnp

from iadr1_tpu.core.precision import Precision, DEFAULT_PRECISION
from iadr1_tpu.models import qwen2, qwen2_vl
from iadr1_tpu.models.attention import default_attention


@dataclasses.dataclass
class ModelBundle:
    family: str
    cfg: Any
    multimodal: bool
    init_params: Callable
    convert_hf: Callable
    logical_axes: Callable
    forward: Callable        # (params, batch, **kw) -> logits [B,T,V]
    template: str = "chatml"


def _qwen2_text_cfg(hf: dict) -> qwen2.Qwen2Config:
    return qwen2.Qwen2Config(
        vocab_size=hf["vocab_size"],
        hidden_size=hf["hidden_size"],
        intermediate_size=hf["intermediate_size"],
        num_hidden_layers=hf["num_hidden_layers"],
        num_attention_heads=hf["num_attention_heads"],
        num_key_value_heads=hf.get("num_key_value_heads", hf["num_attention_heads"]),
        head_dim=hf.get("head_dim"),
        rms_norm_eps=hf.get("rms_norm_eps", 1e-6),
        rope_theta=hf.get("rope_theta", 1000000.0),
        max_position_embeddings=hf.get("max_position_embeddings", 32768),
        tie_word_embeddings=hf.get("tie_word_embeddings", False),
        mrope_section=tuple(hf["rope_scaling"]["mrope_section"])
        if hf.get("rope_scaling") and "mrope_section" in hf["rope_scaling"]
        else None,
    )


def make_qwen2_bundle(hf_config: dict, attention: str = "auto",
                      precision: Precision = DEFAULT_PRECISION) -> ModelBundle:
    cfg = _qwen2_text_cfg(hf_config)
    attn = default_attention(attention)

    def forward(params, batch, remat=True):
        h, _ = qwen2.apply(
            params, cfg, batch["input_ids"],
            position_ids=batch["position_ids"],
            segment_ids=batch.get("segment_ids"),
            precision=precision, attention_fn=attn, remat=remat,
        )
        return qwen2.logits(params, cfg, h, precision)

    return ModelBundle(
        family="qwen2", cfg=cfg, multimodal=False,
        init_params=lambda key, dtype=jnp.float32: qwen2.init_params(key, cfg, dtype),
        convert_hf=lambda state, dtype=jnp.float32: __import__(
            "iadr1_tpu.models.params_io", fromlist=["convert_qwen2"]
        ).convert_qwen2(state, cfg, dtype=dtype),
        logical_axes=lambda: qwen2.logical_axes(cfg),
        forward=forward,
        template="chatml",
    )


def make_qwen2_vl_bundle(hf_config: dict, attention: str = "auto",
                         precision: Precision = DEFAULT_PRECISION) -> ModelBundle:
    text_hf = hf_config.get("text_config", hf_config)
    vis_hf = hf_config["vision_config"]
    tcfg = _qwen2_text_cfg(text_hf)
    vcfg = qwen2_vl.Qwen2VLVisionConfig(
        depth=vis_hf.get("depth", 32),
        embed_dim=vis_hf.get("embed_dim", 1280),
        hidden_size=vis_hf.get("hidden_size", tcfg.hidden_size),
        num_heads=vis_hf.get("num_heads", 16),
        patch_size=vis_hf.get("patch_size", 14),
        spatial_merge_size=vis_hf.get("spatial_merge_size", 2),
        temporal_patch_size=vis_hf.get("temporal_patch_size", 2),
        mlp_ratio=vis_hf.get("mlp_ratio", 4.0),
    )
    cfg = qwen2_vl.Qwen2VLConfig(
        text=tcfg, vision=vcfg,
        image_token_id=hf_config.get("image_token_id", 151655),
        video_token_id=hf_config.get("video_token_id", 151656),
        vision_start_token_id=hf_config.get("vision_start_token_id", 151652),
        vision_end_token_id=hf_config.get("vision_end_token_id", 151653),
    )
    attn = default_attention(attention)

    def forward(params, batch, remat=True):
        h, _ = qwen2_vl.apply(
            params, cfg, batch["input_ids"], batch["position_ids"],
            patches=batch.get("patches"),
            rot_cos=batch.get("rot_cos"), rot_sin=batch.get("rot_sin"),
            vision_segments=batch.get("vision_segments"),
            scatter_rows=batch.get("scatter_rows"),
            scatter_cols=batch.get("scatter_cols"),
            segment_ids=batch.get("segment_ids"),
            precision=precision, attention_fn=attn,
            vision_attention_fn=attn, remat=remat,
        )
        return qwen2_vl.logits(params, cfg, h, precision)

    return ModelBundle(
        family="qwen2_vl", cfg=cfg, multimodal=True,
        init_params=lambda key, dtype=jnp.float32: qwen2_vl.init_params(key, cfg, dtype),
        convert_hf=lambda state, dtype=jnp.float32: qwen2_vl.convert_hf(state, cfg, dtype),
        logical_axes=lambda: qwen2_vl.logical_axes(cfg),
        forward=forward,
        template="qwen2_vl",
    )


FAMILY_BUILDERS = {
    "Qwen2ForCausalLM": make_qwen2_bundle,
    "Qwen2VLForConditionalGeneration": make_qwen2_vl_bundle,
    "qwen2": make_qwen2_bundle,
    "qwen2_vl": make_qwen2_vl_bundle,
}


def bundle_from_hf_config(hf_config: dict, **kw) -> ModelBundle:
    archs = hf_config.get("architectures") or []
    for arch in archs:
        if arch in FAMILY_BUILDERS:
            return FAMILY_BUILDERS[arch](hf_config, **kw)
    mt = hf_config.get("model_type")
    if mt in FAMILY_BUILDERS:
        return FAMILY_BUILDERS[mt](hf_config, **kw)
    raise ValueError(f"unsupported model family: {archs or mt}")


def bundle_from_pretrained(path: str, **kw) -> ModelBundle:
    """Resolve a bundle from a local HF checkpoint directory."""
    with open(os.path.join(path, "config.json")) as f:
        hf_config = json.load(f)
    return bundle_from_hf_config(hf_config, **kw)
