"""Qwen2-VL: dynamic-resolution ViT tower + patch merger + Qwen2 decoder.

Semantics match HF ``Qwen2VLForConditionalGeneration`` (the model family the
reference trains via its PA-SFT/SC-GRPO recipes, sc_grpo_trainer.py:116-137):
a window-free ViT over variable-size patch grids with 2-D rotary positions in
2x2-merge order, LayerNorm pre-norm blocks with QuickGELU MLPs, a 4-to-1
PatchMerger, and image features scattered into the token stream at
``<|image_pad|>`` positions with M-RoPE position grids.

TPU design: the patch stream is padded to a static budget and attention is
masked by per-image segment ids (one jit shape for any mix of image sizes);
rotary tables, segment ids, scatter indices, and M-RoPE grids are numpy
host-side precomputes (iadr1_tpu/vision/).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from iadr1_tpu.core.precision import Precision, DEFAULT_PRECISION
from iadr1_tpu.models import common, qwen2
from iadr1_tpu.models.common import dense, rotate_half
from iadr1_tpu.models.params_io import _get, _stack_layers


@dataclasses.dataclass(frozen=True)
class Qwen2VLVisionConfig:
    depth: int = 32
    embed_dim: int = 1280
    hidden_size: int = 1536            # output dim (text model hidden)
    num_heads: int = 16
    in_channels: int = 3
    patch_size: int = 14
    spatial_merge_size: int = 2
    temporal_patch_size: int = 2
    mlp_ratio: float = 4.0
    rope_theta: float = 10000.0

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads

    @property
    def patch_dim(self) -> int:
        return self.in_channels * self.temporal_patch_size * self.patch_size ** 2

    @property
    def mlp_dim(self) -> int:
        return int(self.embed_dim * self.mlp_ratio)

    @property
    def merge_dim(self) -> int:
        return self.embed_dim * self.spatial_merge_size ** 2


@dataclasses.dataclass(frozen=True)
class Qwen2VLConfig:
    text: qwen2.Qwen2Config
    vision: Qwen2VLVisionConfig
    image_token_id: int = 151655
    video_token_id: int = 151656
    vision_start_token_id: int = 151652
    vision_end_token_id: int = 151653


# ---------------------------------------------------------------------------
# vision tower
# ---------------------------------------------------------------------------


def layer_norm(x, scale, bias, eps=1e-6):
    dtype = x.dtype
    x = x.astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    x = (x - mean) * jax.lax.rsqrt(var + eps)
    return (x * scale + bias).astype(dtype)


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def init_vision_params(key, cfg: Qwen2VLVisionConfig, dtype=jnp.float32) -> dict:
    keys = jax.random.split(key, 8)
    L, E = cfg.depth, cfg.embed_dim

    def stack(k, i, o):
        ks = jax.random.split(k, L)
        return jnp.stack([common.dense_init(kk, i, o, dtype) for kk in ks])

    return {
        "patch_embed": {"kernel": common.dense_init(keys[0], cfg.patch_dim, E, dtype)},
        "blocks": {
            "norm1": {"scale": jnp.ones((L, E), dtype), "bias": jnp.zeros((L, E), dtype)},
            "norm2": {"scale": jnp.ones((L, E), dtype), "bias": jnp.zeros((L, E), dtype)},
            "attn": {
                "qkv": {"kernel": stack(keys[1], E, 3 * E), "bias": jnp.zeros((L, 3 * E), dtype)},
                "proj": {"kernel": stack(keys[2], E, E), "bias": jnp.zeros((L, E), dtype)},
            },
            "mlp": {
                "fc1": {"kernel": stack(keys[3], E, cfg.mlp_dim), "bias": jnp.zeros((L, cfg.mlp_dim), dtype)},
                "fc2": {"kernel": stack(keys[4], cfg.mlp_dim, E), "bias": jnp.zeros((L, E), dtype)},
            },
        },
        "merger": {
            "ln_q": {"scale": jnp.ones((E,), dtype), "bias": jnp.zeros((E,), dtype)},
            "fc1": {"kernel": common.dense_init(keys[5], cfg.merge_dim, cfg.merge_dim, dtype),
                    "bias": jnp.zeros((cfg.merge_dim,), dtype)},
            "fc2": {"kernel": common.dense_init(keys[6], cfg.merge_dim, cfg.hidden_size, dtype),
                    "bias": jnp.zeros((cfg.hidden_size,), dtype)},
        },
    }


def vision_logical_axes(cfg: Qwen2VLVisionConfig) -> dict:
    return {
        "patch_embed": {"kernel": ("patch", "embed")},
        "blocks": {
            "norm1": {"scale": (None, "norm"), "bias": (None, "norm")},
            "norm2": {"scale": (None, "norm"), "bias": (None, "norm")},
            "attn": {
                "qkv": {"kernel": (None, "embed", "qkv"), "bias": (None, "qkv")},
                "proj": {"kernel": (None, "heads", "embed"), "bias": (None, "norm")},
            },
            "mlp": {
                "fc1": {"kernel": (None, "embed", "mlp"), "bias": (None, "mlp")},
                "fc2": {"kernel": (None, "mlp", "embed"), "bias": (None, "norm")},
            },
        },
        "merger": {
            "ln_q": {"scale": ("norm",), "bias": ("norm",)},
            "fc1": {"kernel": ("embed", "mlp"), "bias": ("mlp",)},
            "fc2": {"kernel": ("mlp", "embed"), "bias": ("norm",)},
        },
    }


def apply_vision(
    params: dict,
    cfg: Qwen2VLVisionConfig,
    patches: jax.Array,          # [P, patch_dim] (padded to static budget)
    rot_cos: jax.Array,          # [P, head_dim]
    rot_sin: jax.Array,          # [P, head_dim]
    segment_ids: jax.Array,      # [P] 1-based per image, 0 = padding
    precision: Precision = DEFAULT_PRECISION,
    attention_fn: Callable | None = None,
    remat: bool = False,
) -> jax.Array:
    """Patch stream -> merged image features [P // merge**2, hidden_size].

    Attention is restricted within each image by segment ids (the TPU
    replacement for HF's cu_seqlens splitting).
    """
    P = patches.shape[0]
    H, D = cfg.num_heads, cfg.head_dim
    h = dense(
        patches.astype(precision.compute_dtype), params["patch_embed"]["kernel"]
    )
    # replicate the host-precomputed tables inside the remat region: XLA
    # otherwise picks different shardings for the fwd and the checkpoint
    # replay (SPMD involuntary full remat; core/mesh.constrain_replicated)
    from iadr1_tpu.core.mesh import constrain_replicated

    rot_cos = constrain_replicated(rot_cos)
    rot_sin = constrain_replicated(rot_sin)
    cos = rot_cos[None, :, None, :]
    sin = rot_sin[None, :, None, :]
    segs = segment_ids[None, :]

    seg_mask = (segs[:, :, None] == segs[:, None, :]) & (segs[:, None, :] != 0)
    seg_mask = seg_mask[:, None, :, :]
    if attention_fn is None:
        attn = lambda q, k, v: common.xla_attention(q, k, v, seg_mask)
    else:
        attn = functools.partial(
            attention_fn, mask=seg_mask, q_segments=segs, kv_segments=segs,
            causal=False,
        )

    from jax.ad_checkpoint import checkpoint_name

    def block(h, layer):
        x = layer_norm(h, layer["norm1"]["scale"], layer["norm1"]["bias"])
        # named for remat="save_acts" (see siglip.py: backward replays only
        # the proj matmul + rope/norms/gelu)
        qkv = checkpoint_name(
            dense(x, layer["attn"]["qkv"]["kernel"],
                  layer["attn"]["qkv"]["bias"]), "act_qkv")
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(1, P, H, D)
        k = k.reshape(1, P, H, D)
        v = v.reshape(1, P, H, D)
        qf = q.astype(jnp.float32) * cos + rotate_half(q.astype(jnp.float32)) * sin
        kf = k.astype(jnp.float32) * cos + rotate_half(k.astype(jnp.float32)) * sin
        q, k = qf.astype(h.dtype), kf.astype(h.dtype)
        attn_out = checkpoint_name(attn(q, k, v).reshape(P, H * D),
                                   "act_attn")
        h = h + dense(attn_out, layer["attn"]["proj"]["kernel"], layer["attn"]["proj"]["bias"])
        x = layer_norm(h, layer["norm2"]["scale"], layer["norm2"]["bias"])
        x = checkpoint_name(
            dense(x, layer["mlp"]["fc1"]["kernel"],
                  layer["mlp"]["fc1"]["bias"]), "act_fc1")
        x = quick_gelu(x)
        h = h + dense(x, layer["mlp"]["fc2"]["kernel"], layer["mlp"]["fc2"]["bias"])
        return h, None

    if remat == "save_acts":
        policy = jax.checkpoint_policies.save_only_these_names(
            "flash_out", "flash_lse", "act_qkv", "act_attn", "act_fc1")
        body = jax.checkpoint(block, policy=policy)
    else:
        body = jax.checkpoint(block) if remat else block
    h, _ = jax.lax.scan(body, h, params["blocks"])

    m = params["merger"]
    h = layer_norm(h, m["ln_q"]["scale"], m["ln_q"]["bias"])
    h = h.reshape(-1, cfg.merge_dim)
    h = dense(h, m["fc1"]["kernel"], m["fc1"]["bias"])
    h = jax.nn.gelu(h, approximate=False)
    return dense(h, m["fc2"]["kernel"], m["fc2"]["bias"])


# ---------------------------------------------------------------------------
# HF weight conversion
# ---------------------------------------------------------------------------


def convert_vision(state, cfg: Qwen2VLVisionConfig, prefix="visual.", dtype=jnp.float32):
    L = cfg.depth
    bt = prefix + "blocks.{i}."
    pe_w = np.asarray(state[prefix + "patch_embed.proj.weight"])  # [E, C, tps, ps, ps]
    patch_kernel = jnp.asarray(pe_w.reshape(pe_w.shape[0], -1).T, dtype=dtype)
    return {
        "patch_embed": {"kernel": patch_kernel},
        "blocks": {
            "norm1": {
                "scale": _stack_layers(state, bt + "norm1.weight", L, dtype=dtype),
                "bias": _stack_layers(state, bt + "norm1.bias", L, dtype=dtype),
            },
            "norm2": {
                "scale": _stack_layers(state, bt + "norm2.weight", L, dtype=dtype),
                "bias": _stack_layers(state, bt + "norm2.bias", L, dtype=dtype),
            },
            "attn": {
                "qkv": {
                    "kernel": _stack_layers(state, bt + "attn.qkv.weight", L, True, dtype),
                    "bias": _stack_layers(state, bt + "attn.qkv.bias", L, dtype=dtype),
                },
                "proj": {
                    "kernel": _stack_layers(state, bt + "attn.proj.weight", L, True, dtype),
                    "bias": _stack_layers(state, bt + "attn.proj.bias", L, dtype=dtype),
                },
            },
            "mlp": {
                "fc1": {
                    "kernel": _stack_layers(state, bt + "mlp.fc1.weight", L, True, dtype),
                    "bias": _stack_layers(state, bt + "mlp.fc1.bias", L, dtype=dtype),
                },
                "fc2": {
                    "kernel": _stack_layers(state, bt + "mlp.fc2.weight", L, True, dtype),
                    "bias": _stack_layers(state, bt + "mlp.fc2.bias", L, dtype=dtype),
                },
            },
        },
        "merger": {
            "ln_q": {
                "scale": _get(state, prefix + "merger.ln_q.weight", dtype=dtype),
                "bias": _get(state, prefix + "merger.ln_q.bias", dtype=dtype),
            },
            "fc1": {
                "kernel": _get(state, prefix + "merger.mlp.0.weight", True, dtype),
                "bias": _get(state, prefix + "merger.mlp.0.bias", dtype=dtype),
            },
            "fc2": {
                "kernel": _get(state, prefix + "merger.mlp.2.weight", True, dtype),
                "bias": _get(state, prefix + "merger.mlp.2.bias", dtype=dtype),
            },
        },
    }


# ---------------------------------------------------------------------------
# full VLM
# ---------------------------------------------------------------------------


def init_params(key, cfg: Qwen2VLConfig, dtype=jnp.float32) -> dict:
    k1, k2 = jax.random.split(key)
    return {
        "text": qwen2.init_params(k1, cfg.text, dtype),
        "vision": init_vision_params(k2, cfg.vision, dtype),
    }


def logical_axes(cfg: Qwen2VLConfig) -> dict:
    return {
        "text": qwen2.logical_axes(cfg.text),
        "vision": vision_logical_axes(cfg.vision),
    }


def convert_hf(state, cfg: Qwen2VLConfig, dtype=jnp.float32) -> dict:
    from iadr1_tpu.models.params_io import convert_qwen2

    # new-style checkpoints: model.language_model./model.visual.; older:
    # model./visual.
    if any(k.startswith("model.language_model.") for k in state):
        text_prefix, vis_prefix = "model.language_model.", "model.visual."
    elif any(k.startswith("language_model.") for k in state):
        text_prefix, vis_prefix = "language_model.model.", "visual."
    else:
        text_prefix, vis_prefix = "model.", "visual."
    return {
        "text": convert_qwen2(state, cfg.text, prefix=text_prefix, dtype=dtype),
        "vision": convert_vision(state, cfg.vision, prefix=vis_prefix, dtype=dtype),
    }


def merge_image_features(
    inputs_embeds: jax.Array,     # [B, T, hid]
    image_features: jax.Array,    # [F, hid] (merged patches, padded budget)
    scatter_rows: jax.Array,      # [F] batch index per feature (or B for pad)
    scatter_cols: jax.Array,      # [F] position per feature (0 for pad)
) -> jax.Array:
    """Scatter image features into the token stream at image-token slots.

    Index arrays are host-precomputed from input_ids == image_token_id;
    padded features carry row index B (one past the batch) and are dropped.
    """
    B, T, Hid = inputs_embeds.shape
    padded = jnp.zeros((B + 1, T, Hid), inputs_embeds.dtype)
    padded = padded.at[:B].set(inputs_embeds)
    padded = padded.at[scatter_rows, scatter_cols].set(
        image_features.astype(inputs_embeds.dtype)
    )
    return padded[:B]


def apply(
    params: dict,
    cfg: Qwen2VLConfig,
    input_ids: jax.Array,              # [B, T]
    position_ids: jax.Array,           # [3, B, T] M-RoPE grids
    *,
    patches: jax.Array | None = None,  # [P, patch_dim]
    rot_cos: jax.Array | None = None,
    rot_sin: jax.Array | None = None,
    vision_segments: jax.Array | None = None,  # [P]
    scatter_rows: jax.Array | None = None,     # [P // merge**2]
    scatter_cols: jax.Array | None = None,
    segment_ids: jax.Array | None = None,      # [B, T] text packing segments
    cache: dict | None = None,
    cache_mode: str = "extend",
    precision: Precision = DEFAULT_PRECISION,
    attention_fn: Callable | None = None,
    decode_attention_fn: Callable | None = None,
    lora: dict | None = None,
    lora_scale: float = 1.0,
    vision_attention_fn: Callable | None = None,
    remat: bool = False,
    tower_remat=None,
) -> tuple[jax.Array, dict | None]:
    """Full VLM forward -> (hidden [B, T, hid], new_cache)."""
    embeds = common.embed_lookup(params["text"]["embed"]["weight"], input_ids).astype(
        precision.compute_dtype
    )
    if patches is not None:
        feats = apply_vision(
            params["vision"], cfg.vision, patches, rot_cos, rot_sin,
            vision_segments, precision=precision,
            attention_fn=vision_attention_fn,
            remat=remat if tower_remat is None else tower_remat,
        )
        embeds = merge_image_features(embeds, feats, scatter_rows, scatter_cols)

    return qwen2.apply(
        params["text"], cfg.text,
        inputs_embeds=embeds, position_ids=position_ids,
        segment_ids=segment_ids, cache=cache, cache_mode=cache_mode,
        precision=precision, attention_fn=attention_fn,
        decode_attention_fn=decode_attention_fn, remat=remat,
        lora=lora.get("text") if lora else None, lora_scale=lora_scale,
    )


def logits(params, cfg: Qwen2VLConfig, hidden, precision=DEFAULT_PRECISION):
    return qwen2.logits(params["text"], cfg.text, hidden, precision)
