"""Model family registry: config resolution, loaders, forward adapters.

The TPU counterpart of the reference's model loader layer
(llamafactory/model/loader.py load_model + AutoModelForVision2Seq routing,
sc_grpo_trainer.py:116-137 family dispatch).  Each family exposes a uniform
bundle:

* ``forward(params, batch) -> logits``        (training steps)
* ``apply(params, batch, cache) -> (h, cache)`` (rollout prefill/decode)
* ``logits_fn(params, hidden) -> logits``
* ``vision_arrays(input_ids, patches, grids, budget) -> dict``
  (host-side family-specific vision precompute: rotary tables, segment
  arrays, window permutations, scatter indices)
* config/init/convert/logical_axes.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from iadr1_tpu.core.precision import Precision, DEFAULT_PRECISION
from iadr1_tpu.models import qwen2, qwen2_vl
from iadr1_tpu.models.attention import default_attention, default_decode_attention


@dataclasses.dataclass
class ModelBundle:
    family: str
    cfg: Any
    multimodal: bool
    init_params: Callable
    convert_hf: Callable
    logical_axes: Callable
    forward: Callable        # (params, batch, **kw) -> logits [B,T,V]
    apply: Callable          # (params, batch, cache=None) -> (hidden, cache)
    logits_fn: Callable      # (params, hidden) -> logits
    vision_arrays: Callable | None = None
    # (pil_image, min_pixels=..., max_pixels=...) -> (patches, grid, seqlen):
    # family-specific preprocessing; ``seqlen`` is the number of image tokens
    # the placeholder expands to.
    preprocess_image: Callable | None = None
    # (pil_frames,) -> (frame_patches [F, g*g, patch_dim], meta, seqlen):
    # video-capable families only (llava_next_video, video_llava)
    preprocess_video: Callable | None = None
    template: str = "chatml"
    # shared-prompt GRPO scoring (models/shared_prompt.py): (params, batch,
    # group_size, remat=..., lora=..., lora_scale=...) -> pred hidden
    # [n*G, N, hid]; None when the family has no factored path
    shared_pred_fn: Callable | None = None

    # memory-efficient training path: final hidden states + LM-head kernel
    # for the chunked CE loss (train/sft.py chunked_sft_loss); extra kwargs
    # (lora=, lora_scale=) pass through to apply
    def hidden_fn(self, params, batch, remat=True, **kw):
        h, _ = self.apply(params, batch, remat=remat, **kw)
        return h

    def head_kernel_fn(self, params):
        from iadr1_tpu.models import qwen2 as _q

        tcfg = getattr(self.cfg, "text", self.cfg)
        tparams = params.get("text", params)
        return _q.head_kernel(tparams, tcfg)


def _parse_rope_scaling(hf: dict) -> "qwen2.RopeScaling | None":
    rs = hf.get("rope_scaling")
    if not rs:
        return None
    rtype = rs.get("rope_type", rs.get("type"))
    if rtype in (None, "mrope", "default"):
        return None  # mrope is handled via mrope_section
    if rtype == "dynamic":
        # HF's _compute_dynamic_ntk_parameters keys the NTK base off
        # config.max_position_embeddings, NOT the rope_scaling dict's
        # original_max_position_embeddings (which it ignores) -- parity
        # requires matching that
        orig = int(hf.get("max_position_embeddings", 32768))
    else:
        orig = int(rs.get("original_max_position_embeddings",
                          hf.get("max_position_embeddings", 32768)))
    return qwen2.RopeScaling(
        type=rtype,
        factor=float(rs.get("factor", 1.0)),
        original_max_position_embeddings=orig,
        low_freq_factor=float(rs.get("low_freq_factor", 1.0)),
        high_freq_factor=float(rs.get("high_freq_factor", 4.0)),
    )


def configure_rope_scaling(hf_config: dict, rope_scaling: str,
                           model_max_length: int | None) -> dict:
    """Mutate an HF config dict for context extension, mirroring the
    reference's configure_rope (model_utils/rope.py:34-71): the factor is
    ceil(model_max_length / max_position_embeddings) when extending, else
    a fixed 2.0."""
    import math

    out = dict(hf_config)
    current_max = out.get("max_position_embeddings", 32768)
    rs: dict = {"rope_type": rope_scaling}
    if model_max_length:
        if model_max_length > current_max:
            rs["factor"] = float(math.ceil(model_max_length / current_max))
            out["max_position_embeddings"] = model_max_length
        else:
            rs["factor"] = 1.0
        if rope_scaling in ("dynamic", "llama3"):
            rs["original_max_position_embeddings"] = current_max
        if rope_scaling == "llama3":
            rs["low_freq_factor"] = 1.0
            rs["high_freq_factor"] = 4.0
    else:
        rs["factor"] = 2.0
        if rope_scaling in ("dynamic", "llama3"):
            rs["original_max_position_embeddings"] = current_max
    out["rope_scaling"] = rs
    return out


def _vlm_shared_pred(module, cfg, precision, attention: str):
    """Shared-prompt GRPO scoring for decoder VLMs whose apply() builds
    inputs_embeds via ``module.compute_embeds`` (llava, llava-onevision,
    internvl): vision tower + scatter run once per unique prompt."""
    use_flash = (attention == "flash"
                 or (attention == "auto" and jax.default_backend() == "tpu"))

    def shared_pred(params, batch, group_size, remat=True, lora=None,
                    lora_scale=1.0):
        from iadr1_tpu.models.shared_prompt import shared_prompt_pred_hidden

        video_kw = {
            k: batch[k]
            for k in ("video_tiles", "video_scatter_rows",
                      "video_scatter_cols")
            if k in batch
        }
        embeds = module.compute_embeds(
            params, cfg, batch["prompt_ids"],
            tiles=batch.get("tiles"), pack_src=batch.get("pack_src"),
            pack_weights=batch.get("pack_weights"),
            newline_mask=batch.get("newline_mask"),
            scatter_rows=batch.get("scatter_rows"),
            scatter_cols=batch.get("scatter_cols"),
            precision=precision, remat=bool(remat), **video_kw,
        )
        return shared_prompt_pred_hidden(
            params["text"], cfg.text, batch, group_size,
            precision=precision, use_flash=use_flash, remat=remat,
            lora=lora.get("text") if lora else None, lora_scale=lora_scale,
            prompt_embeds=embeds,
        )

    return shared_pred


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
        rope_scaling=_parse_rope_scaling(hf),
    )


def _qwen_preprocess_image(vcfg):
    def preprocess(pil, min_pixels=56 * 56, max_pixels=480000):
        from iadr1_tpu.vision.preprocess import qwen2vl_preprocess

        flat, grid = qwen2vl_preprocess(
            pil, patch_size=vcfg.patch_size,
            merge_size=vcfg.spatial_merge_size,
            temporal_patch_size=vcfg.temporal_patch_size,
            min_pixels=min_pixels, max_pixels=max_pixels,
        )
        seqlen = int(np.prod(grid)) // (vcfg.spatial_merge_size ** 2)
        return flat, grid, seqlen

    return preprocess


def _scatter_indices(input_ids: np.ndarray, image_token_id: int,
                     n_feat_budget: int, feature_order=None,
                     video_token_id: int | None = None,
                     n_expected: int | None = None):
    """Feature -> (row, col) scatter indices; padded features target the
    sentinel row B (dropped by merge_image_features).  Video tokens scatter
    through the same path (features must be supplied in placeholder
    reading order); they are only matched when image tokens alone don't
    account for ``n_expected`` features -- some checkpoints reuse ordinary
    token ids as video_token_id and matching unconditionally would
    misscatter."""
    B = input_ids.shape[0]
    match = input_ids == image_token_id
    if (video_token_id is not None and video_token_id != image_token_id
            and n_expected is not None and int(match.sum()) < n_expected):
        match = match | (input_ids == video_token_id)
    rows_idx, cols_idx = np.nonzero(match)
    if feature_order is not None:
        rows_idx = rows_idx[feature_order]
        cols_idx = cols_idx[feature_order]
    srows = np.full(n_feat_budget, B, np.int32)
    scols = np.zeros(n_feat_budget, np.int32)
    srows[: len(rows_idx)] = rows_idx
    scols[: len(cols_idx)] = cols_idx
    return srows, scols


# ---------------------------------------------------------------------------
# qwen2 (text)
# ---------------------------------------------------------------------------


def make_qwen2_bundle(hf_config: dict, attention: str = "auto",
                      precision: Precision = DEFAULT_PRECISION) -> ModelBundle:
    cfg = _qwen2_text_cfg(hf_config)
    attn = default_attention(attention)
    decode_attn = default_decode_attention(attention)

    def forward(params, batch, remat=True):
        h, _ = qwen2.apply(
            params, cfg, batch["input_ids"],
            position_ids=batch["position_ids"],
            segment_ids=batch.get("segment_ids"),
            precision=precision, attention_fn=attn, remat=remat,
        )
        return qwen2.logits(params, cfg, h, precision)

    def apply(params, batch, cache=None, remat=False, cache_mode="extend",
              lora=None, lora_scale=1.0):
        return qwen2.apply(
            params, cfg, batch["input_ids"],
            position_ids=batch["position_ids"],
            segment_ids=batch.get("segment_ids"),
            cache=cache, cache_mode=cache_mode, precision=precision,
            attention_fn=attn, decode_attention_fn=decode_attn, remat=remat,
            lora=lora, lora_scale=lora_scale,
        )

    from iadr1_tpu.models.params_io import convert_qwen2

    use_flash = (attention == "flash"
                 or (attention == "auto" and jax.default_backend() == "tpu"))

    def shared_pred(params, batch, group_size, remat=True, lora=None,
                    lora_scale=1.0):
        from iadr1_tpu.models.shared_prompt import shared_prompt_pred_hidden

        return shared_prompt_pred_hidden(
            params, cfg, batch, group_size, precision=precision,
            use_flash=use_flash, remat=remat, lora=lora,
            lora_scale=lora_scale)

    return ModelBundle(
        family="qwen2", cfg=cfg, multimodal=False,
        init_params=lambda key, dtype=jnp.float32: qwen2.init_params(key, cfg, dtype),
        convert_hf=lambda state, dtype=jnp.float32: convert_qwen2(state, cfg, dtype=dtype),
        logical_axes=lambda: qwen2.logical_axes(cfg),
        forward=forward,
        apply=apply,
        logits_fn=lambda params, h: qwen2.logits(params, cfg, h, precision),
        template="chatml",
        shared_pred_fn=shared_pred,
    )


def make_qwen2_moe_bundle(hf_config: dict, attention: str = "auto",
                          precision: Precision = DEFAULT_PRECISION) -> ModelBundle:
    """Qwen2-MoE (Qwen1.5-MoE-A2.7B): sparse-MoE decoder
    (models/qwen2_moe.py; reference counterpart model_utils/moe.py +
    transformers Qwen2MoeForCausalLM)."""
    from iadr1_tpu.models import qwen2_moe

    cfg = qwen2_moe.config_from_hf(hf_config)
    attn = default_attention(attention)
    decode_attn = default_decode_attention(attention)

    def forward(params, batch, remat=True):
        h, _ = qwen2_moe.apply(
            params, cfg, batch["input_ids"],
            position_ids=batch["position_ids"],
            segment_ids=batch.get("segment_ids"),
            precision=precision, attention_fn=attn, remat=remat,
        )
        return qwen2_moe.logits(params, cfg, h, precision)

    def apply(params, batch, cache=None, remat=False, cache_mode="extend",
              lora=None, lora_scale=1.0, return_aux=False):
        return qwen2_moe.apply(
            params, cfg, batch["input_ids"],
            position_ids=batch["position_ids"],
            segment_ids=batch.get("segment_ids"),
            cache=cache, cache_mode=cache_mode, precision=precision,
            attention_fn=attn, decode_attention_fn=decode_attn, remat=remat,
            lora=lora, lora_scale=lora_scale, return_aux=return_aux,
        )

    return ModelBundle(
        family="qwen2_moe", cfg=cfg, multimodal=False,
        init_params=lambda key, dtype=jnp.float32: qwen2_moe.init_params(
            key, cfg, dtype),
        convert_hf=lambda state, dtype=jnp.float32: qwen2_moe.convert_hf(
            state, cfg, dtype=dtype),
        logical_axes=lambda: qwen2_moe.logical_axes(cfg),
        forward=forward,
        apply=apply,
        logits_fn=lambda params, h: qwen2_moe.logits(params, cfg, h, precision),
        template="chatml",
    )


# ---------------------------------------------------------------------------
# qwen2-vl
# ---------------------------------------------------------------------------


def make_qwen2_vl_bundle(hf_config: dict, attention: str = "auto",
                         precision: Precision = DEFAULT_PRECISION) -> ModelBundle:
    from iadr1_tpu.vision import preprocess as vp

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
    decode_attn = default_decode_attention(attention)
    vision_keys = ("patches", "rot_cos", "rot_sin", "vision_segments",
                   "scatter_rows", "scatter_cols")

    def apply(params, batch, cache=None, remat=False, cache_mode="extend",
              lora=None, lora_scale=1.0, tower_remat=None):
        return qwen2_vl.apply(
            params, cfg, batch["input_ids"], batch["position_ids"],
            patches=batch.get("patches"),
            rot_cos=batch.get("rot_cos"), rot_sin=batch.get("rot_sin"),
            vision_segments=batch.get("vision_segments"),
            scatter_rows=batch.get("scatter_rows"),
            scatter_cols=batch.get("scatter_cols"),
            segment_ids=batch.get("segment_ids"), cache=cache,
            cache_mode=cache_mode, decode_attention_fn=decode_attn,
            lora=lora, lora_scale=lora_scale,
            precision=precision, attention_fn=attn,
            vision_attention_fn=attn, remat=remat,
            tower_remat=tower_remat,
        )

    def forward(params, batch, remat=True):
        h, _ = apply(params, batch, remat=remat)
        return qwen2_vl.logits(params, cfg, h, precision)

    def vision_arrays(input_ids, patches_list, grids, patch_budget):
        grid_thw = np.asarray(grids, np.int64).reshape(-1, 3)
        flat = (
            np.concatenate(patches_list, axis=0)
            if patches_list else np.zeros((0, vcfg.patch_dim), np.float32)
        )
        n = flat.shape[0]
        if n > patch_budget:
            raise ValueError(f"patch stream {n} exceeds budget {patch_budget}")
        pad = patch_budget - n
        flat = np.concatenate([flat, np.zeros((pad, vcfg.patch_dim), np.float32)])
        cos, sin = vp.vision_rotary_tables(grid_thw, vcfg.head_dim)
        cos = np.concatenate([cos, np.ones((pad, cos.shape[1]), np.float32)])
        sin = np.concatenate([sin, np.zeros((pad, sin.shape[1]), np.float32)])
        vsegs = vp.vision_segment_ids(grid_thw, pad_to=patch_budget)
        merge_unit = vcfg.spatial_merge_size ** 2
        srows, scols = _scatter_indices(
            input_ids, cfg.image_token_id, patch_budget // merge_unit,
            video_token_id=cfg.video_token_id,
            n_expected=n // merge_unit,
        )
        return {
            "patches": flat, "rot_cos": cos, "rot_sin": sin,
            "vision_segments": vsegs,
            "scatter_rows": srows, "scatter_cols": scols,
        }

    use_flash = (attention == "flash"
                 or (attention == "auto" and jax.default_backend() == "tpu"))

    def shared_pred(params, batch, group_size, remat=True, lora=None,
                    lora_scale=1.0):
        """Shared-prompt GRPO scoring: vision tower + scatter run once per
        UNIQUE prompt; completions attend the shared prompt KV."""
        from iadr1_tpu.models import common as _c
        from iadr1_tpu.models.shared_prompt import shared_prompt_pred_hidden

        embeds = _c.embed_lookup(
            params["text"]["embed"]["weight"], batch["prompt_ids"]
        ).astype(precision.compute_dtype)
        if batch.get("patches") is not None:
            feats = qwen2_vl.apply_vision(
                params["vision"], cfg.vision, batch["patches"],
                batch["rot_cos"], batch["rot_sin"],
                batch["vision_segments"], precision=precision,
                attention_fn=attn, remat=bool(remat),
            )
            embeds = qwen2_vl.merge_image_features(
                embeds, feats, batch["scatter_rows"], batch["scatter_cols"])
        return shared_prompt_pred_hidden(
            params["text"], cfg.text, batch, group_size,
            precision=precision, use_flash=use_flash, remat=remat,
            lora=lora.get("text") if lora else None, lora_scale=lora_scale,
            prompt_embeds=embeds,
        )

    return ModelBundle(
        family="qwen2_vl", cfg=cfg, multimodal=True,
        init_params=lambda key, dtype=jnp.float32: qwen2_vl.init_params(key, cfg, dtype),
        convert_hf=lambda state, dtype=jnp.float32: qwen2_vl.convert_hf(state, cfg, dtype),
        logical_axes=lambda: qwen2_vl.logical_axes(cfg),
        forward=forward,
        apply=apply,
        logits_fn=lambda params, h: qwen2_vl.logits(params, cfg, h, precision),
        vision_arrays=vision_arrays,
        preprocess_image=_qwen_preprocess_image(vcfg),
        template="qwen2_vl",
        shared_pred_fn=shared_pred,
    )


# ---------------------------------------------------------------------------
# qwen2.5-vl
# ---------------------------------------------------------------------------


def make_qwen25_vl_bundle(hf_config: dict, attention: str = "auto",
                          precision: Precision = DEFAULT_PRECISION) -> ModelBundle:
    from iadr1_tpu.models import qwen25_vl

    text_hf = hf_config.get("text_config", hf_config)
    vis_hf = hf_config["vision_config"]
    tcfg = _qwen2_text_cfg(text_hf)
    vcfg = qwen25_vl.Qwen25VLVisionConfig(
        depth=vis_hf.get("depth", 32),
        hidden_size=vis_hf.get("hidden_size", 1280),
        intermediate_size=vis_hf.get("intermediate_size", 3420),
        out_hidden_size=vis_hf.get("out_hidden_size", tcfg.hidden_size),
        num_heads=vis_hf.get("num_heads", 16),
        patch_size=vis_hf.get("patch_size", 14),
        spatial_merge_size=vis_hf.get("spatial_merge_size", 2),
        temporal_patch_size=vis_hf.get("temporal_patch_size", 2),
        window_size=vis_hf.get("window_size", 112),
        fullatt_block_indexes=tuple(
            vis_hf.get("fullatt_block_indexes", (7, 15, 23, 31))
        ),
    )
    cfg = qwen25_vl.Qwen25VLConfig(
        text=tcfg, vision=vcfg,
        image_token_id=hf_config.get("image_token_id", 151655),
        video_token_id=hf_config.get("video_token_id", 151656),
        vision_start_token_id=hf_config.get("vision_start_token_id", 151652),
        vision_end_token_id=hf_config.get("vision_end_token_id", 151653),
    )
    attn = default_attention(attention)
    decode_attn = default_decode_attention(attention)

    def apply(params, batch, cache=None, remat=False, cache_mode="extend",
              lora=None, lora_scale=1.0, tower_remat=None):
        return qwen25_vl.apply(
            params, cfg, batch["input_ids"], batch["position_ids"],
            patches=batch.get("patches"),
            rot_cos=batch.get("rot_cos"), rot_sin=batch.get("rot_sin"),
            full_segs=batch.get("full_segs"),
            window_segs=batch.get("window_segs"),
            scatter_rows=batch.get("scatter_rows"),
            scatter_cols=batch.get("scatter_cols"),
            segment_ids=batch.get("segment_ids"), cache=cache,
            cache_mode=cache_mode, decode_attention_fn=decode_attn,
            lora=lora, lora_scale=lora_scale,
            precision=precision, attention_fn=attn,
            vision_attention_fn=attn, remat=remat,
            tower_remat=tower_remat,
        )

    def forward(params, batch, remat=True):
        h, _ = apply(params, batch, remat=remat)
        return qwen25_vl.logits(params, cfg, h, precision)

    def vision_arrays(input_ids, patches_list, grids, patch_budget):
        grid_thw = np.asarray(grids, np.int64).reshape(-1, 3)
        flat = (
            np.concatenate(patches_list, axis=0)
            if patches_list else np.zeros((0, vcfg.patch_dim), np.float32)
        )
        n = flat.shape[0]
        if n > patch_budget:
            raise ValueError(f"patch stream {n} exceeds budget {patch_budget}")
        merge_unit = vcfg.spatial_merge_size ** 2
        if n:
            arrs = qwen25_vl.qwen25vl_vision_arrays(
                grid_thw, vcfg, pad_to=patch_budget
            )
            flat = flat[arrs["patch_perm"]]
            flat = np.concatenate(
                [flat, np.zeros((patch_budget - n, vcfg.patch_dim), np.float32)]
            )
            srows, scols = _scatter_indices(
                input_ids, cfg.image_token_id, patch_budget // merge_unit,
                feature_order=arrs["feature_order"],
                video_token_id=cfg.video_token_id,
                n_expected=n // merge_unit,
            )
            return {
                "patches": flat,
                "rot_cos": arrs["rot_cos"], "rot_sin": arrs["rot_sin"],
                "full_segs": arrs["full_segs"],
                "window_segs": arrs["window_segs"],
                "scatter_rows": srows, "scatter_cols": scols,
            }
        head = vcfg.head_dim
        return {
            "patches": np.zeros((patch_budget, vcfg.patch_dim), np.float32),
            "rot_cos": np.ones((patch_budget, head), np.float32),
            "rot_sin": np.zeros((patch_budget, head), np.float32),
            "full_segs": np.zeros(patch_budget, np.int32),
            "window_segs": np.zeros(patch_budget, np.int32),
            "scatter_rows": np.full(patch_budget // merge_unit,
                                    input_ids.shape[0], np.int32),
            "scatter_cols": np.zeros(patch_budget // merge_unit, np.int32),
        }

    use_flash = (attention == "flash"
                 or (attention == "auto" and jax.default_backend() == "tpu"))

    def shared_pred(params, batch, group_size, remat=True, lora=None,
                    lora_scale=1.0):
        """Shared-prompt GRPO scoring (see make_qwen2_vl_bundle)."""
        from iadr1_tpu.models import common as _c
        from iadr1_tpu.models.qwen2_vl import merge_image_features
        from iadr1_tpu.models.shared_prompt import shared_prompt_pred_hidden

        embeds = _c.embed_lookup(
            params["text"]["embed"]["weight"], batch["prompt_ids"]
        ).astype(precision.compute_dtype)
        if batch.get("patches") is not None:
            feats = qwen25_vl.apply_vision(
                params["vision"], cfg.vision, batch["patches"],
                batch["rot_cos"], batch["rot_sin"],
                batch["full_segs"], batch["window_segs"],
                precision=precision, attention_fn=attn, remat=bool(remat),
            )
            embeds = merge_image_features(
                embeds, feats, batch["scatter_rows"], batch["scatter_cols"])
        return shared_prompt_pred_hidden(
            params["text"], cfg.text, batch, group_size,
            precision=precision, use_flash=use_flash, remat=remat,
            lora=lora.get("text") if lora else None, lora_scale=lora_scale,
            prompt_embeds=embeds,
        )

    return ModelBundle(
        family="qwen2_5_vl", cfg=cfg, multimodal=True,
        init_params=lambda key, dtype=jnp.float32: qwen25_vl.init_params(key, cfg, dtype),
        convert_hf=lambda state, dtype=jnp.float32: qwen25_vl.convert_hf(state, cfg, dtype),
        logical_axes=lambda: qwen25_vl.logical_axes(cfg),
        forward=forward,
        apply=apply,
        logits_fn=lambda params, h: qwen25_vl.logits(params, cfg, h, precision),
        vision_arrays=vision_arrays,
        preprocess_image=_qwen_preprocess_image(vcfg),
        template="qwen2_vl",
        shared_pred_fn=shared_pred,
    )


# ---------------------------------------------------------------------------
# llava-onevision
# ---------------------------------------------------------------------------


def make_llava_onevision_bundle(hf_config: dict, attention: str = "auto",
                                precision: Precision = DEFAULT_PRECISION) -> ModelBundle:
    from iadr1_tpu.models import llava_onevision, siglip
    from iadr1_tpu.vision import anyres

    text_hf = hf_config["text_config"]
    vis_hf = hf_config["vision_config"]
    tcfg = _qwen2_text_cfg(text_hf)
    vcfg = siglip.SiglipVisionConfig(
        hidden_size=vis_hf.get("hidden_size", 1152),
        intermediate_size=vis_hf.get("intermediate_size", 4304),
        num_hidden_layers=vis_hf.get("num_hidden_layers", 27),
        num_attention_heads=vis_hf.get("num_attention_heads", 16),
        image_size=vis_hf.get("image_size", 384),
        patch_size=vis_hf.get("patch_size", 14),
        layer_norm_eps=vis_hf.get("layer_norm_eps", 1e-6),
    )
    cfg = llava_onevision.LlavaOnevisionConfig(
        text=tcfg, vision=vcfg,
        image_token_id=hf_config.get("image_token_index",
                                     hf_config.get("image_token_id", 151646)),
        image_grid_pinpoints=tuple(
            tuple(p) for p in hf_config.get("image_grid_pinpoints", [])
        ) or ((384, 384), (384, 768), (768, 384), (768, 768),
              (1152, 384), (384, 1152)),
        vision_aspect_ratio=hf_config.get("vision_aspect_ratio", "anyres_max_9"),
    )
    attn = default_attention(attention)
    decode_attn = default_decode_attention(attention)
    g = vcfg.grid

    # XLA dense attention in the SigLIP tower: at 729 patches per tile the
    # flash kernel pads to 2x512 blocks and measures SLOWER than the dense
    # [729,729] path on v5e (12,606 vs 12,685 tok/s full-step; the gap
    # widens under save_acts remat: 12,949 vs 13,239 -- round-5
    # tools/probe_vlm_perf.py, docs/validation_r5.md).  Overridable per
    # call (tower_attention_fn/tower_remat).
    tower_attn = None

    def apply(params, batch, cache=None, remat=False, cache_mode="extend",
              lora=None, lora_scale=1.0, tower_attention_fn="default",
              tower_remat=None):
        return llava_onevision.apply(
            params, cfg, batch["input_ids"], batch["position_ids"],
            tiles=batch.get("tiles"),
            pack_src=batch.get("pack_src"),
            pack_weights=batch.get("pack_weights"),
            newline_mask=batch.get("newline_mask"),
            scatter_rows=batch.get("scatter_rows"),
            scatter_cols=batch.get("scatter_cols"),
            segment_ids=batch.get("segment_ids"), cache=cache,
            cache_mode=cache_mode, decode_attention_fn=decode_attn,
            lora=lora, lora_scale=lora_scale,
            precision=precision, attention_fn=attn, remat=remat,
            tower_attention_fn=(tower_attn
                                if tower_attention_fn == "default"
                                else tower_attention_fn),
            tower_remat=tower_remat,
        )

    def forward(params, batch, remat=True):
        h, _ = apply(params, batch, remat=remat)
        return llava_onevision.logits(params, cfg, h, precision)

    def preprocess_image(pil, min_pixels=None, max_pixels=None):
        tiles, grid = anyres.onevision_tiles(
            pil, cfg.image_grid_pinpoints, vcfg.image_size
        )
        patches = anyres.patchify_tiles(tiles, vcfg.patch_size)
        full_grid = (grid[0], grid[1], pil.height, pil.width)
        seqlen = anyres.onevision_feature_len(
            (pil.height, pil.width), grid, g, cfg.max_tiles
        )
        return patches, full_grid, seqlen

    def vision_arrays(input_ids, patches_list, grids, patch_budget):
        """patches_list: [n_tiles_i, g^2, patch_dim] per image; grids:
        (n_h, n_w, orig_h, orig_w) per image.  patch_budget counts patch
        vectors, i.e. tile budget = patch_budget // g^2."""
        B = input_ids.shape[0]
        tile_budget = patch_budget // (g * g)
        feat_budget = tile_budget * (g * g + g)   # + newline headroom
        patch_dim = vcfg.patch_dim
        tiles = np.zeros((tile_budget, g * g, patch_dim), np.float32)
        src = np.zeros((feat_budget, 4), np.int64)
        wts = np.zeros((feat_budget, 4), np.float32)
        newline = np.zeros(feat_budget, bool)
        srows = np.full(feat_budget, B, np.int32)
        scols = np.zeros(feat_budget, np.int32)

        rows_idx, cols_idx = np.nonzero(input_ids == cfg.image_token_id)
        tile_off, feat_off, tok_off = 0, 0, 0
        for p, grid in zip(patches_list, grids):
            n_h, n_w, oh, ow = grid
            n = p.shape[0]
            if tile_off + n > tile_budget:
                raise ValueError("tile stream exceeds budget")
            tiles[tile_off : tile_off + n] = p
            plan = anyres.onevision_pack_plan((oh, ow), (n_h, n_w), g,
                                              cfg.max_tiles)
            F = plan["length"]
            if feat_off + F > feat_budget:
                raise ValueError("feature stream exceeds budget")
            src[feat_off : feat_off + F] = plan["src"] + tile_off * g * g
            wts[feat_off : feat_off + F] = plan["weights"]
            newline[feat_off : feat_off + F] = plan["newline"]
            srows[feat_off : feat_off + F] = rows_idx[tok_off : tok_off + F]
            scols[feat_off : feat_off + F] = cols_idx[tok_off : tok_off + F]
            tile_off += n
            feat_off += F
            tok_off += F
        return {
            "tiles": tiles, "pack_src": src, "pack_weights": wts,
            "newline_mask": newline,
            "scatter_rows": srows, "scatter_cols": scols,
        }

    return ModelBundle(
        family="llava_onevision", cfg=cfg, multimodal=True,
        shared_pred_fn=_vlm_shared_pred(llava_onevision, cfg, precision,
                                        attention),
        init_params=lambda key, dtype=jnp.float32: llava_onevision.init_params(key, cfg, dtype),
        convert_hf=lambda state, dtype=jnp.float32: llava_onevision.convert_hf(state, cfg, dtype),
        logical_axes=lambda: llava_onevision.logical_axes(cfg),
        forward=forward,
        apply=apply,
        logits_fn=lambda params, h: llava_onevision.logits(params, cfg, h, precision),
        vision_arrays=vision_arrays,
        preprocess_image=preprocess_image,
        template="llava_next_qwen",
    )


# ---------------------------------------------------------------------------
# llava-1.5 / llava-next
# ---------------------------------------------------------------------------


def make_llava_bundle(hf_config: dict, attention: str = "auto",
                      precision: Precision = DEFAULT_PRECISION) -> ModelBundle:
    from iadr1_tpu.models import clip_vit, llava
    from iadr1_tpu.vision import anyres

    # HF ships Pixtral as LlavaForConditionalGeneration with a pixtral
    # vision_config -- a different tower (2-D rope, RMSNorm, variable
    # sizes) and decoder (Mistral), so it gets its own bundle
    if hf_config.get("vision_config", {}).get("model_type") == "pixtral":
        return make_pixtral_bundle(hf_config, attention=attention,
                                   precision=precision)

    archs = hf_config.get("architectures") or []
    mt = hf_config.get("model_type")
    lnv_mode = ("LlavaNextVideoForConditionalGeneration" in archs
                or mt == "llava_next_video")
    videollava_mode = ("VideoLlavaForConditionalGeneration" in archs
                       or mt == "video_llava")
    anyres_mode = lnv_mode or (
        "LlavaNextForConditionalGeneration" in archs or mt == "llava_next"
    )
    if lnv_mode and hf_config.get("spatial_pool_mode", "average") != "average":
        raise ValueError(
            "only spatial_pool_mode='average' is supported (every released "
            "LLaVA-NeXT-Video checkpoint uses it)")
    text_hf = hf_config["text_config"]
    vis_hf = hf_config["vision_config"]
    tcfg = dataclasses.replace(_qwen2_text_cfg(text_hf), attention_bias=False)
    vcfg = clip_vit.ClipVisionConfig(
        hidden_size=vis_hf.get("hidden_size", 1024),
        intermediate_size=vis_hf.get("intermediate_size", 4096),
        num_hidden_layers=vis_hf.get("num_hidden_layers", 24),
        num_attention_heads=vis_hf.get("num_attention_heads", 16),
        image_size=vis_hf.get("image_size", 336),
        patch_size=vis_hf.get("patch_size", 14),
        layer_norm_eps=vis_hf.get("layer_norm_eps", 1e-5),
    )
    cfg = llava.LlavaConfig(
        text=tcfg, vision=vcfg,
        image_token_id=hf_config.get("image_token_index",
                                     hf_config.get("image_token_id", 32000)),
        vision_feature_layer=hf_config.get("vision_feature_layer", -2),
        vision_feature_select_strategy=hf_config.get(
            "vision_feature_select_strategy", "default"),
        anyres=anyres_mode,
        image_grid_pinpoints=tuple(
            tuple(p) for p in hf_config.get("image_grid_pinpoints", [])
        ) or ((336, 672), (672, 336), (672, 672), (1008, 336), (336, 1008)),
        video_token_id=hf_config.get(
            "video_token_index", hf_config.get("video_token_id"))
        if (lnv_mode or videollava_mode) else None,
        video_pool_stride=(hf_config.get("spatial_pool_stride", 2)
                           if lnv_mode else 0),
        video_keep_cls=videollava_mode,
        separate_video_tower=videollava_mode,
    )
    attn = default_attention(attention)
    decode_attn = default_decode_attention(attention)
    g = vcfg.grid

    def apply(params, batch, cache=None, remat=False, cache_mode="extend",
              lora=None, lora_scale=1.0, tower_remat=None):
        return llava.apply(
            params, cfg, batch["input_ids"], batch["position_ids"],
            tiles=batch.get("tiles"),
            pack_src=batch.get("pack_src"),
            pack_weights=batch.get("pack_weights"),
            newline_mask=batch.get("newline_mask"),
            scatter_rows=batch.get("scatter_rows"),
            scatter_cols=batch.get("scatter_cols"),
            video_tiles=batch.get("video_tiles"),
            video_scatter_rows=batch.get("video_scatter_rows"),
            video_scatter_cols=batch.get("video_scatter_cols"),
            segment_ids=batch.get("segment_ids"), cache=cache,
            cache_mode=cache_mode, decode_attention_fn=decode_attn,
            lora=lora, lora_scale=lora_scale,
            precision=precision, attention_fn=attn, remat=remat,
            tower_remat=tower_remat,
        )

    def forward(params, batch, remat=True):
        h, _ = apply(params, batch, remat=remat)
        return llava.logits(params, cfg, h, precision)

    def preprocess_image(pil, min_pixels=None, max_pixels=None):
        if anyres_mode:
            tiles, grid = anyres.llava_next_tiles(
                pil, cfg.image_grid_pinpoints, vcfg.image_size
            )
            patches = anyres.patchify_tiles(tiles, vcfg.patch_size)
            seqlen = anyres.onevision_feature_len(
                (pil.height, pil.width), grid, g, max_tiles=None
            )
            return patches, (grid[0], grid[1], pil.height, pil.width), seqlen
        tile = anyres.clip_resize_center_crop(pil, vcfg.image_size)
        patches = anyres.patchify_tiles(tile[None], vcfg.patch_size)
        return patches, (1, 1, pil.height, pil.width), g * g

    def _video_arrays(input_ids, videos, patch_budget):
        """Pack per-video frame stacks [F, g*g, patch_dim] into one static
        frame stream + scatter indices over the video-token positions."""
        B = input_ids.shape[0]
        frame_budget = max(patch_budget // (g * g), 1)
        if cfg.video_pool_stride > 1:
            toks_per_frame = (g // cfg.video_pool_stride) ** 2
        elif cfg.video_keep_cls:
            toks_per_frame = g * g + 1
        else:
            toks_per_frame = g * g
        patch_dim = vcfg.patch_dim
        vtiles = np.zeros((frame_budget, g * g, patch_dim), np.float32)
        n_feats = frame_budget * toks_per_frame
        vrows = np.full(n_feats, B, np.int32)
        vcols = np.zeros(n_feats, np.int32)
        rows_idx, cols_idx = np.nonzero(input_ids == cfg.video_token_id)
        frame_off = tok_off = 0
        for frames in videos or ():
            F = frames.shape[0]
            if frame_off + F > frame_budget:
                raise ValueError("video frame stream exceeds patch budget")
            vtiles[frame_off : frame_off + F] = frames
            n = F * toks_per_frame
            lo = frame_off * toks_per_frame
            vrows[lo : lo + n] = rows_idx[tok_off : tok_off + n]
            vcols[lo : lo + n] = cols_idx[tok_off : tok_off + n]
            frame_off += F
            tok_off += n
        return {"video_tiles": vtiles, "video_scatter_rows": vrows,
                "video_scatter_cols": vcols}

    def vision_arrays(input_ids, patches_list, grids, patch_budget,
                      videos=None):
        B = input_ids.shape[0]
        tile_budget = patch_budget // (g * g)
        feat_budget = tile_budget * (g * g + g)
        patch_dim = vcfg.patch_dim
        tiles = np.zeros((tile_budget, g * g, patch_dim), np.float32)
        rows_idx, cols_idx = np.nonzero(input_ids == cfg.image_token_id)
        vid = (_video_arrays(input_ids, videos, patch_budget)
               if cfg.video_token_id is not None else {})

        if anyres_mode:
            src = np.zeros((feat_budget, 4), np.int64)
            wts = np.zeros((feat_budget, 4), np.float32)
            newline = np.zeros(feat_budget, bool)
            srows = np.full(feat_budget, B, np.int32)
            scols = np.zeros(feat_budget, np.int32)
            tile_off = feat_off = tok_off = 0
            for p, grid in zip(patches_list, grids):
                n_h, n_w, oh, ow = grid
                n = p.shape[0]
                if tile_off + n > tile_budget:
                    raise ValueError("tile stream exceeds budget")
                tiles[tile_off : tile_off + n] = p
                plan = anyres.onevision_pack_plan(
                    (oh, ow), (n_h, n_w), g, max_tiles=None
                )
                F = plan["length"]
                src[feat_off : feat_off + F] = plan["src"] + tile_off * g * g
                wts[feat_off : feat_off + F] = plan["weights"]
                newline[feat_off : feat_off + F] = plan["newline"]
                srows[feat_off : feat_off + F] = rows_idx[tok_off : tok_off + F]
                scols[feat_off : feat_off + F] = cols_idx[tok_off : tok_off + F]
                tile_off += n
                feat_off += F
                tok_off += F
            return {
                "tiles": tiles, "pack_src": src, "pack_weights": wts,
                "newline_mask": newline,
                "scatter_rows": srows, "scatter_cols": scols, **vid,
            }

        # llava-1.5: one tile per image, features map 1:1
        n_feats = tile_budget * g * g
        srows = np.full(n_feats, B, np.int32)
        scols = np.zeros(n_feats, np.int32)
        tile_off = tok_off = 0
        for p in patches_list:
            tiles[tile_off : tile_off + 1] = p
            F = g * g
            srows[tile_off * F : tile_off * F + F] = rows_idx[tok_off : tok_off + F]
            scols[tile_off * F : tile_off * F + F] = cols_idx[tok_off : tok_off + F]
            tile_off += 1
            tok_off += F
        return {"tiles": tiles, "scatter_rows": srows,
                "scatter_cols": scols, **vid}

    def preprocess_video(frames):
        arr = np.stack([
            anyres.clip_resize_center_crop(f, vcfg.image_size)
            for f in frames
        ])
        patches = anyres.patchify_tiles(arr, vcfg.patch_size)
        if cfg.video_pool_stride > 1:
            toks = (g // cfg.video_pool_stride) ** 2 * len(frames)
        elif cfg.video_keep_cls:
            toks = (g * g + 1) * len(frames)
        else:
            toks = g * g * len(frames)
        return patches, ("video", len(frames)), toks

    if lnv_mode:
        family, template = "llava_next_video", "llava_next_video"
    elif videollava_mode:
        family, template = "video_llava", "video_llava"
    elif anyres_mode:
        family, template = "llava_next", "llava_next"
    else:
        family, template = "llava", "llava"
    return ModelBundle(
        family=family, cfg=cfg,
        shared_pred_fn=_vlm_shared_pred(llava, cfg, precision, attention),
        multimodal=True,
        init_params=lambda key, dtype=jnp.float32: llava.init_params(key, cfg, dtype),
        convert_hf=lambda state, dtype=jnp.float32: llava.convert_hf(state, cfg, dtype),
        logical_axes=lambda: llava.logical_axes(cfg),
        forward=forward,
        apply=apply,
        logits_fn=lambda params, h: llava.logits(params, cfg, h, precision),
        vision_arrays=vision_arrays,
        preprocess_image=preprocess_image,
        preprocess_video=(preprocess_video
                          if cfg.video_token_id is not None else None),
        template=template,
    )


# ---------------------------------------------------------------------------
# internvl
# ---------------------------------------------------------------------------


def make_internvl_bundle(hf_config: dict, attention: str = "auto",
                         precision: Precision = DEFAULT_PRECISION) -> ModelBundle:
    from iadr1_tpu.models import internvl

    text_hf = hf_config["text_config"]
    vis_hf = hf_config["vision_config"]
    tcfg = _qwen2_text_cfg(text_hf)
    vcfg = internvl.InternVLVisionConfig(
        hidden_size=vis_hf.get("hidden_size", 1024),
        intermediate_size=vis_hf.get("intermediate_size", 4096),
        num_hidden_layers=vis_hf.get("num_hidden_layers", 24),
        num_attention_heads=vis_hf.get("num_attention_heads", 16),
        image_size=vis_hf.get("image_size", 448)
        if not isinstance(vis_hf.get("image_size"), (list, tuple))
        else vis_hf["image_size"][0],
        patch_size=vis_hf.get("patch_size", 14)
        if not isinstance(vis_hf.get("patch_size"), (list, tuple))
        else vis_hf["patch_size"][0],
        layer_norm_eps=vis_hf.get("layer_norm_eps", 1e-6),
        attention_bias=vis_hf.get("attention_bias", True),
        use_qk_norm=vis_hf.get("use_qk_norm", False),
        norm_type=vis_hf.get("norm_type", "layer_norm"),
    )
    cfg = internvl.InternVLConfig(
        text=tcfg, vision=vcfg,
        image_token_id=hf_config.get("image_token_id", 151667),
        downsample_ratio=hf_config.get("downsample_ratio", 0.5),
        max_tiles=hf_config.get("max_tiles", 12),
    )
    attn = default_attention(attention)
    decode_attn = default_decode_attention(attention)
    g = vcfg.grid

    def apply(params, batch, cache=None, remat=False, cache_mode="extend",
              lora=None, lora_scale=1.0, tower_remat=None):
        return internvl.apply(
            params, cfg, batch["input_ids"], batch["position_ids"],
            tiles=batch.get("tiles"),
            scatter_rows=batch.get("scatter_rows"),
            scatter_cols=batch.get("scatter_cols"),
            segment_ids=batch.get("segment_ids"), cache=cache,
            cache_mode=cache_mode, decode_attention_fn=decode_attn,
            lora=lora, lora_scale=lora_scale,
            precision=precision, attention_fn=attn, remat=remat,
            tower_remat=tower_remat,
        )

    def forward(params, batch, remat=True):
        h, _ = apply(params, batch, remat=remat)
        return internvl.logits(params, cfg, h, precision)

    def preprocess_image(pil, min_pixels=None, max_pixels=None):
        from iadr1_tpu.vision.anyres import patchify_tiles

        tiles, n = internvl.internvl_tiles(
            pil, vcfg.image_size, cfg.min_tiles, cfg.max_tiles
        )
        patches = patchify_tiles(tiles, vcfg.patch_size)
        seqlen = n * cfg.features_per_tile
        return patches, (n,), seqlen

    def vision_arrays(input_ids, patches_list, grids, patch_budget):
        B = input_ids.shape[0]
        tile_budget = patch_budget // (g * g)
        fpt = cfg.features_per_tile
        tiles = np.zeros((tile_budget, g * g, vcfg.patch_dim), np.float32)
        n_feats = tile_budget * fpt
        srows = np.full(n_feats, B, np.int32)
        scols = np.zeros(n_feats, np.int32)
        rows_idx, cols_idx = np.nonzero(input_ids == cfg.image_token_id)
        tile_off = tok_off = 0
        for p in patches_list:
            n = p.shape[0]
            if tile_off + n > tile_budget:
                raise ValueError("tile stream exceeds budget")
            tiles[tile_off : tile_off + n] = p
            F = n * fpt
            srows[tile_off * fpt : tile_off * fpt + F] = rows_idx[tok_off : tok_off + F]
            scols[tile_off * fpt : tile_off * fpt + F] = cols_idx[tok_off : tok_off + F]
            tile_off += n
            tok_off += F
        return {"tiles": tiles, "scatter_rows": srows, "scatter_cols": scols}

    return ModelBundle(
        family="internvl", cfg=cfg, multimodal=True,
        shared_pred_fn=_vlm_shared_pred(internvl, cfg, precision, attention),
        init_params=lambda key, dtype=jnp.float32: internvl.init_params(key, cfg, dtype),
        convert_hf=lambda state, dtype=jnp.float32: internvl.convert_hf(state, cfg, dtype),
        logical_axes=lambda: internvl.logical_axes(cfg),
        forward=forward,
        apply=apply,
        logits_fn=lambda params, h: internvl.logits(params, cfg, h, precision),
        vision_arrays=vision_arrays,
        preprocess_image=preprocess_image,
        template="intern_vl",
    )


# ---------------------------------------------------------------------------
# paligemma
# ---------------------------------------------------------------------------


def make_paligemma_bundle(hf_config: dict, attention: str = "auto",
                          precision: Precision = DEFAULT_PRECISION) -> ModelBundle:
    """PaliGemma (SigLIP + Gemma prefix-LM).  Reference consumes it via
    AutoModelForVision2Seq + the paligemma plugin (model/loader.py:186-189,
    data/mm_plugin.py:680-739); here the Gemma decoder is the qwen2 module
    with its Gemma knobs and the tower is the in-repo SigLIP."""
    from iadr1_tpu.models import paligemma, siglip
    from iadr1_tpu.vision import anyres

    text_hf = hf_config["text_config"]
    vis_hf = hf_config["vision_config"]
    tcfg = dataclasses.replace(
        _qwen2_text_cfg({**text_hf,
                         "rope_theta": text_hf.get("rope_theta", 10000.0),
                         "tie_word_embeddings": text_hf.get(
                             "tie_word_embeddings", True)}),
        attention_bias=bool(text_hf.get("attention_bias", False)),
        rms_norm_offset=1.0,
        hidden_act=text_hf.get("hidden_act",
                               text_hf.get("hidden_activation")) or
        "gelu_pytorch_tanh",
        scale_embeds=True,
    )
    vcfg = siglip.SiglipVisionConfig(
        hidden_size=vis_hf.get("hidden_size", 1152),
        intermediate_size=vis_hf.get("intermediate_size", 4304),
        num_hidden_layers=vis_hf.get("num_hidden_layers", 27),
        num_attention_heads=vis_hf.get("num_attention_heads", 16),
        image_size=vis_hf.get("image_size", 224),
        patch_size=vis_hf.get("patch_size", 14),
        layer_norm_eps=vis_hf.get("layer_norm_eps", 1e-6),
    )
    cfg = paligemma.PaliGemmaConfig(
        text=tcfg, vision=vcfg,
        image_token_id=hf_config.get("image_token_index",
                                     hf_config.get("image_token_id", 257152)),
        projection_dim=vis_hf.get("projection_dim",
                                  hf_config.get("projection_dim")),
    )
    # The prefix-LM mask always runs the dense XLA attention path (flash's
    # block structure assumes causal); only single-token decode uses the
    # ragged kernel.
    decode_attn = default_decode_attention(attention)
    g = vcfg.grid

    def apply(params, batch, cache=None, remat=False, cache_mode="extend",
              lora=None, lora_scale=1.0, tower_remat=None):
        return paligemma.apply(
            params, cfg, batch["input_ids"], batch["position_ids"],
            tiles=batch.get("tiles"),
            scatter_rows=batch.get("scatter_rows"),
            scatter_cols=batch.get("scatter_cols"),
            segment_ids=batch.get("segment_ids"), cache=cache,
            cache_mode=cache_mode, decode_attention_fn=decode_attn,
            lora=lora, lora_scale=lora_scale,
            precision=precision, remat=remat, tower_remat=tower_remat,
        )

    def forward(params, batch, remat=True):
        h, _ = apply(params, batch, remat=remat)
        return paligemma.logits(params, cfg, h, precision)

    def preprocess_image(pil, min_pixels=None, max_pixels=None):
        # SiglipImageProcessor: plain bicubic resize to the square input
        # (no center crop), rescale, normalize mean/std 0.5
        from iadr1_tpu.data.mm_plugins import _normalize, _to_array

        arr = _normalize(
            _to_array(pil, (vcfg.image_size, vcfg.image_size)),
            mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5),
        )
        patches = anyres.patchify_tiles(arr[None], vcfg.patch_size)
        return patches, (1, 1, pil.height, pil.width), g * g

    def vision_arrays(input_ids, patches_list, grids, patch_budget):
        # one fixed-size tile per image; features map 1:1 onto the
        # prepended image-token run
        B = input_ids.shape[0]
        tile_budget = max(patch_budget // (g * g), 1)
        n_feats = tile_budget * g * g
        tiles = np.zeros((tile_budget, g * g, vcfg.patch_dim), np.float32)
        srows = np.full(n_feats, B, np.int32)
        scols = np.zeros(n_feats, np.int32)
        rows_idx, cols_idx = np.nonzero(input_ids == cfg.image_token_id)
        tile_off = tok_off = 0
        for p in patches_list:
            if tile_off + 1 > tile_budget:
                raise ValueError("tile stream exceeds budget")
            tiles[tile_off : tile_off + 1] = p
            F = g * g
            srows[tile_off * F : tile_off * F + F] = rows_idx[tok_off : tok_off + F]
            scols[tile_off * F : tile_off * F + F] = cols_idx[tok_off : tok_off + F]
            tile_off += 1
            tok_off += F
        return {"tiles": tiles, "scatter_rows": srows, "scatter_cols": scols}

    return ModelBundle(
        family="paligemma", cfg=cfg, multimodal=True,
        init_params=lambda key, dtype=jnp.float32: paligemma.init_params(key, cfg, dtype),
        convert_hf=lambda state, dtype=jnp.float32: paligemma.convert_hf(state, cfg, dtype),
        logical_axes=lambda: paligemma.logical_axes(cfg),
        forward=forward,
        apply=apply,
        logits_fn=lambda params, h: paligemma.logits(params, cfg, h, precision),
        vision_arrays=vision_arrays,
        preprocess_image=preprocess_image,
        template="paligemma",
    )


# ---------------------------------------------------------------------------
# pixtral
# ---------------------------------------------------------------------------


def make_pixtral_bundle(hf_config: dict, attention: str = "auto",
                        precision: Precision = DEFAULT_PRECISION) -> ModelBundle:
    """Pixtral (2-D-RoPE tower + Mistral decoder); HF ships it as
    LlavaForConditionalGeneration with a pixtral vision_config
    (make_llava_bundle routes here on that model_type).  Reference path:
    AutoModelForVision2Seq + the pixtral plugin (model/loader.py:186-189,
    data/mm_plugin.py:742-805)."""
    import math

    from iadr1_tpu.models import pixtral
    from iadr1_tpu.vision import anyres

    text_hf = hf_config["text_config"]
    vis_hf = hf_config["vision_config"]
    tcfg = dataclasses.replace(_qwen2_text_cfg(text_hf), attention_bias=False)
    vcfg = pixtral.PixtralVisionConfig(
        hidden_size=vis_hf.get("hidden_size", 1024),
        intermediate_size=vis_hf.get("intermediate_size", 4096),
        num_hidden_layers=vis_hf.get("num_hidden_layers", 24),
        num_attention_heads=vis_hf.get("num_attention_heads", 16),
        image_size=vis_hf.get("image_size", 1024),
        patch_size=vis_hf.get("patch_size", 16),
        rope_theta=vis_hf.get("rope_theta", 10000.0),
    )
    cfg = pixtral.PixtralConfig(
        text=tcfg, vision=vcfg,
        image_token_id=hf_config.get("image_token_index",
                                     hf_config.get("image_token_id", 10)),
    )
    attn = default_attention(attention)
    decode_attn = default_decode_attention(attention)
    ps, max_side = vcfg.patch_size, vcfg.max_side

    def apply(params, batch, cache=None, remat=False, cache_mode="extend",
              lora=None, lora_scale=1.0, tower_remat=None):
        return pixtral.apply(
            params, cfg, batch["input_ids"], batch["position_ids"],
            patch_stream=batch.get("patch_stream"),
            patch_pos_ids=batch.get("patch_pos_ids"),
            patch_segments=batch.get("patch_segments"),
            scatter_rows=batch.get("scatter_rows"),
            scatter_cols=batch.get("scatter_cols"),
            segment_ids=batch.get("segment_ids"), cache=cache,
            cache_mode=cache_mode, decode_attention_fn=decode_attn,
            lora=lora, lora_scale=lora_scale,
            precision=precision, attention_fn=attn, remat=remat,
            tower_remat=tower_remat,
        )

    def forward(params, batch, remat=True):
        h, _ = apply(params, batch, remat=remat)
        return pixtral.logits(params, cfg, h, precision)

    def preprocess_image(pil, min_pixels=None, max_pixels=None):
        # PixtralImageProcessor: scale to fit longest_edge, round UP to
        # patch multiples, bicubic, CLIP mean/std
        from iadr1_tpu.data.mm_plugins import _normalize, _to_array

        h, w = pil.height, pil.width
        ratio = max(h / vcfg.image_size, w / vcfg.image_size)
        if ratio > 1:
            h = math.ceil(h / ratio)
            w = math.ceil(w / ratio)
        gh, gw = math.ceil(h / ps), math.ceil(w / ps)
        arr = _normalize(_to_array(pil, (gh * ps, gw * ps)))
        patches = anyres.patchify_tiles(arr[None], ps)[0]  # [gh*gw, pd]
        # seqlen is the (rows, cols) grid: the pixtral expansion is
        # structured ([IMG] rows + [IMG_BREAK]/[IMG_END]), not a flat run
        return patches, (gh, gw), (gh, gw)

    def vision_arrays(input_ids, patches_list, grids, patch_budget):
        B = input_ids.shape[0]
        stream = np.zeros((patch_budget, vcfg.patch_dim), np.float32)
        pos = np.zeros(patch_budget, np.int32)
        segs = np.zeros(patch_budget, np.int32)
        srows = np.full(patch_budget, B, np.int32)
        scols = np.zeros(patch_budget, np.int32)
        rows_idx, cols_idx = np.nonzero(input_ids == cfg.image_token_id)
        off = tok = 0
        for i, (p, grid) in enumerate(zip(patches_list, grids)):
            gh, gw = grid[0], grid[1]
            n = p.shape[0]
            if off + n > patch_budget:
                raise ValueError("patch stream exceeds budget")
            stream[off : off + n] = p
            pos[off : off + n] = (
                np.arange(gh)[:, None] * max_side + np.arange(gw)
            ).ravel()
            segs[off : off + n] = i + 1
            srows[off : off + n] = rows_idx[tok : tok + n]
            scols[off : off + n] = cols_idx[tok : tok + n]
            off += n
            tok += n
        return {"patch_stream": stream, "patch_pos_ids": pos,
                "patch_segments": segs,
                "scatter_rows": srows, "scatter_cols": scols}

    return ModelBundle(
        family="pixtral", cfg=cfg, multimodal=True,
        init_params=lambda key, dtype=jnp.float32: pixtral.init_params(key, cfg, dtype),
        convert_hf=lambda state, dtype=jnp.float32: pixtral.convert_hf(state, cfg, dtype),
        logical_axes=lambda: pixtral.logical_axes(cfg),
        forward=forward,
        apply=apply,
        logits_fn=lambda params, h: pixtral.logits(params, cfg, h, precision),
        vision_arrays=vision_arrays,
        preprocess_image=preprocess_image,
        template="pixtral",
    )


FAMILY_BUILDERS = {
    "Qwen2ForCausalLM": make_qwen2_bundle,
    "Qwen2MoeForCausalLM": make_qwen2_moe_bundle,
    "qwen2_moe": make_qwen2_moe_bundle,
    "Qwen2VLForConditionalGeneration": make_qwen2_vl_bundle,
    "Qwen2_5_VLForConditionalGeneration": make_qwen25_vl_bundle,
    "LlavaOnevisionForConditionalGeneration": make_llava_onevision_bundle,
    "LlavaForConditionalGeneration": make_llava_bundle,
    "LlavaNextForConditionalGeneration": make_llava_bundle,
    "LlavaNextVideoForConditionalGeneration": make_llava_bundle,
    "VideoLlavaForConditionalGeneration": make_llava_bundle,
    "llava": make_llava_bundle,
    "llava_next": make_llava_bundle,
    "llava_next_video": make_llava_bundle,
    "video_llava": make_llava_bundle,
    "InternVLForConditionalGeneration": make_internvl_bundle,
    "internvl": make_internvl_bundle,
    "PaliGemmaForConditionalGeneration": make_paligemma_bundle,
    "paligemma": make_paligemma_bundle,
    "pixtral": make_pixtral_bundle,
    "qwen2": make_qwen2_bundle,
    "qwen2_vl": make_qwen2_vl_bundle,
    "qwen2_5_vl": make_qwen25_vl_bundle,
    "llava_onevision": make_llava_onevision_bundle,
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
