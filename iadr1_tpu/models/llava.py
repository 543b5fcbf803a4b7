"""LLaVA-1.5 / LLaVA-NeXT (1.6) / LLaVA-NeXT-Video / Video-LLaVA:
CLIP tower(s) + MLP projector + llama-style decoder (our Qwen2 module with
attention_bias=False).

Semantics match HF ``LlavaForConditionalGeneration`` (single 336x336 image,
576 feature tokens, vision_feature_layer=-2, strategy "default" drops CLS),
``LlavaNextForConditionalGeneration`` (anyres tiles + unpad + newline,
same packing as OneVision but without the anyres_max downscale),
``LlavaNextVideoForConditionalGeneration`` (anyres images + video frames
through the same tower, spatially average-pooled stride 2 BEFORE the
projector -- LlavaNextVideoPooler), and
``VideoLlavaForConditionalGeneration`` (separate LanguageBind image/video
towers, video frames KEEP the CLS token).  These are the reference's
LLaVA-1.5-7B/13B and LLaVA-1.6-8B/34B recipe families (README.md:233-243;
templates "llava"/"llava_next", llamafactory/data/template.py:834-853) and
the llava_next_video/video_llava plugin families
(llamafactory/data/mm_plugin.py:382-448,912-978).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp

from iadr1_tpu.core.precision import Precision, DEFAULT_PRECISION
from iadr1_tpu.models import clip_vit, common, qwen2
from iadr1_tpu.models.common import dense
from iadr1_tpu.models.params_io import _get
from iadr1_tpu.models.qwen2_vl import merge_image_features


@dataclasses.dataclass(frozen=True)
class LlavaConfig:
    text: qwen2.Qwen2Config
    vision: clip_vit.ClipVisionConfig
    image_token_id: int = 32000
    vision_feature_layer: int = -2
    vision_feature_select_strategy: str = "default"
    # NeXT-only:
    anyres: bool = False
    image_grid_pinpoints: tuple = ()
    # video families:
    video_token_id: int | None = None
    # LLaVA-NeXT-Video: spatial AvgPool (stride 2) on each frame's feature
    # grid before the projector (LlavaNextVideoPooler); 0 = no pooling
    video_pool_stride: int = 0
    # Video-LLaVA: frames keep the CLS token (get_video_features never
    # applies the "default" CLS drop) and run a SEPARATE video tower
    video_keep_cls: bool = False
    separate_video_tower: bool = False

    @property
    def tower_layers(self) -> int:
        return self.vision.num_hidden_layers + 1 + self.vision_feature_layer


def init_params(key, cfg: LlavaConfig, dtype=jnp.float32) -> dict:
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    hid = cfg.text.hidden_size
    E = cfg.vision.hidden_size
    params = {
        "text": qwen2.init_params(k1, cfg.text, dtype),
        "vision": clip_vit.init_params(k2, cfg.vision, dtype),
        "projector": {
            "fc1": {"kernel": common.dense_init(k3, E, hid, dtype),
                    "bias": jnp.zeros((hid,), dtype)},
            "fc2": {"kernel": common.dense_init(k4, hid, hid, dtype),
                    "bias": jnp.zeros((hid,), dtype)},
        },
    }
    if cfg.anyres:
        params["image_newline"] = jnp.zeros((hid,), dtype)
    if cfg.separate_video_tower:
        params["video_tower"] = clip_vit.init_params(k5, cfg.vision, dtype)
    return params


def logical_axes(cfg: LlavaConfig) -> dict:
    axes = {
        "text": qwen2.logical_axes(cfg.text),
        "vision": clip_vit.logical_axes(cfg.vision),
        "projector": {
            "fc1": {"kernel": ("embed", "mlp"), "bias": ("mlp",)},
            "fc2": {"kernel": ("mlp", "embed"), "bias": ("norm",)},
        },
    }
    if cfg.anyres:
        axes["image_newline"] = ("norm",)
    if cfg.separate_video_tower:
        axes["video_tower"] = clip_vit.logical_axes(cfg.vision)
    return axes


def convert_hf(state, cfg: LlavaConfig, dtype=jnp.float32) -> dict:
    from iadr1_tpu.models.params_io import convert_qwen2

    # Video-LLaVA names its CLIP towers image_tower/video_tower
    # (modeling_video_llava.py); the single-tower families use
    # vision_tower
    tower = "image_tower" if cfg.separate_video_tower else "vision_tower"
    if any(k.startswith("model.language_model.") for k in state):
        lm_prefix = "model.language_model."
        vt_prefix = f"model.{tower}.vision_model."
        video_prefix = "model.video_tower.vision_model."
        proj_prefix = "model.multi_modal_projector."
        newline_key = "model.image_newline"
    else:
        lm_prefix = "language_model.model."
        vt_prefix = f"{tower}.vision_model."
        video_prefix = "video_tower.vision_model."
        proj_prefix = "multi_modal_projector."
        newline_key = "image_newline"
    params = {
        "text": convert_qwen2(state, cfg.text, prefix=lm_prefix, dtype=dtype),
        "vision": clip_vit.convert_hf(state, cfg.vision, prefix=vt_prefix, dtype=dtype),
        "projector": {
            "fc1": {"kernel": _get(state, proj_prefix + "linear_1.weight", True, dtype),
                    "bias": _get(state, proj_prefix + "linear_1.bias", dtype=dtype)},
            "fc2": {"kernel": _get(state, proj_prefix + "linear_2.weight", True, dtype),
                    "bias": _get(state, proj_prefix + "linear_2.bias", dtype=dtype)},
        },
    }
    if cfg.anyres:
        params["image_newline"] = _get(state, newline_key, dtype=dtype)
    if cfg.separate_video_tower:
        params["video_tower"] = clip_vit.convert_hf(
            state, cfg.vision, prefix=video_prefix, dtype=dtype)
    return params


def project(params, feats):
    p = params["projector"]
    h = dense(feats, p["fc1"]["kernel"], p["fc1"]["bias"])
    h = jax.nn.gelu(h, approximate=False)
    return dense(h, p["fc2"]["kernel"], p["fc2"]["bias"])


def pool_video_features(feats: jax.Array, stride: int) -> jax.Array:
    """Per-frame spatial AvgPool (kernel = stride, floor semantics) on a
    [F, g*g, E] feature grid -- HF LlavaNextVideoPooler (pooling happens
    BEFORE the projector, modeling_llava_next_video.py:107-137)."""
    F, n, E = feats.shape
    g = int(round(n ** 0.5))
    g2 = g // stride
    x = feats.reshape(F, g, g, E)[:, : g2 * stride, : g2 * stride]
    x = x.reshape(F, g2, stride, g2, stride, E).mean(axis=(2, 4))
    return x.reshape(F, g2 * g2, E)


def compute_embeds(params, cfg, input_ids, *, tiles=None, pack_src=None,
                   pack_weights=None, newline_mask=None, scatter_rows=None,
                   scatter_cols=None, video_tiles=None,
                   video_scatter_rows=None, video_scatter_cols=None,
                   precision=DEFAULT_PRECISION, remat=False,
                   tower_remat=None):
    tower_rm = remat if tower_remat is None else tower_remat
    """Token embeddings with CLIP/anyres image features (and per-frame
    video features) scattered in (shared by apply and the shared-prompt
    GRPO scoring path)."""
    embeds = common.embed_lookup(
        params["text"]["embed"]["weight"], input_ids
    ).astype(precision.compute_dtype)
    if tiles is not None:
        feats = clip_vit.apply(
            params["vision"], cfg.vision, tiles, precision=precision,
            remat=tower_rm, num_layers=cfg.tower_layers,
            keep_cls=cfg.vision_feature_select_strategy == "full",
        )
        feats = project(params, feats)
        if cfg.anyres:
            flat = feats.reshape(-1, feats.shape[-1])
            gathered = (
                flat[pack_src] * pack_weights[..., None].astype(flat.dtype)
            ).sum(1)
            newline = params["image_newline"].astype(gathered.dtype)
            packed = jnp.where(
                newline_mask[:, None], newline[None, :], gathered
            )
        else:
            packed = feats.reshape(-1, feats.shape[-1])
        embeds = merge_image_features(embeds, packed, scatter_rows, scatter_cols)
    if video_tiles is not None:
        # frames [F, g*g, patch_dim] -> tower -> (pool | keep CLS) ->
        # projector -> scatter into the video-token positions
        tower = params.get("video_tower", params["vision"])
        vfeats = clip_vit.apply(
            tower, cfg.vision, video_tiles, precision=precision,
            remat=tower_rm, num_layers=cfg.tower_layers,
            keep_cls=(cfg.video_keep_cls
                      or cfg.vision_feature_select_strategy == "full"),
        )
        if cfg.video_pool_stride > 1:
            vfeats = pool_video_features(vfeats, cfg.video_pool_stride)
        vfeats = project(params, vfeats)
        embeds = merge_image_features(
            embeds, vfeats.reshape(-1, vfeats.shape[-1]),
            video_scatter_rows, video_scatter_cols)
    return embeds


def apply(
    params: dict,
    cfg: LlavaConfig,
    input_ids: jax.Array,
    position_ids: jax.Array,
    *,
    tiles: jax.Array | None = None,          # [n, num_patches, patch_dim]
    pack_src: jax.Array | None = None,       # anyres only
    pack_weights: jax.Array | None = None,
    newline_mask: jax.Array | None = None,
    scatter_rows: jax.Array | None = None,
    scatter_cols: jax.Array | None = None,
    video_tiles: jax.Array | None = None,     # [n_frames, g*g, patch_dim]
    video_scatter_rows: jax.Array | None = None,
    video_scatter_cols: jax.Array | None = None,
    segment_ids: jax.Array | None = None,
    cache: dict | None = None,
    cache_mode: str = "extend",
    precision: Precision = DEFAULT_PRECISION,
    attention_fn: Callable | None = None,
    decode_attention_fn: Callable | None = None,
    lora: dict | None = None,
    lora_scale: float = 1.0,
    remat: bool = False,
    tower_remat=None,
) -> tuple[jax.Array, dict | None]:
    embeds = compute_embeds(
        params, cfg, input_ids, tiles=tiles, pack_src=pack_src,
        pack_weights=pack_weights, newline_mask=newline_mask,
        scatter_rows=scatter_rows, scatter_cols=scatter_cols,
        video_tiles=video_tiles, video_scatter_rows=video_scatter_rows,
        video_scatter_cols=video_scatter_cols,
        precision=precision, remat=remat, tower_remat=tower_remat,
    )
    return qwen2.apply(
        params["text"], cfg.text, inputs_embeds=embeds,
        position_ids=position_ids, segment_ids=segment_ids, cache=cache,
        cache_mode=cache_mode, precision=precision,
        attention_fn=attention_fn, decode_attention_fn=decode_attention_fn,
        remat=remat,
        lora=lora.get("text") if lora else None, lora_scale=lora_scale,
    )


def logits(params, cfg: LlavaConfig, hidden, precision=DEFAULT_PRECISION):
    return qwen2.logits(params["text"], cfg.text, hidden, precision)
