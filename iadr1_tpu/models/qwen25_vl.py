"""Qwen2.5-VL: windowed ViT + RMSNorm/SwiGLU blocks + Qwen2 decoder.

Semantics match HF ``Qwen2_5_VLForConditionalGeneration`` (the reference's
headline 3B/7B/72B family, sc_grpo_trainer.py:116-137).  Differences from
Qwen2-VL's tower: RMSNorm pre-norm, biased SwiGLU MLPs, and window attention
-- most blocks attend within window_size x window_size pixel windows, with a
few full-attention blocks (fullatt_block_indexes).

TPU design: HF permutes tokens into window order and switches cu_seqlens per
block; here the window permutation, both segment-id arrays (per-image and
per-window), and the feature-order reversal are *host precomputes*
(qwen25vl_vision_arrays), and each block just selects which segment array to
mask with -- a [P] select, not a tensor reshuffle, under one jit.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name
import numpy as np

from iadr1_tpu.core.precision import Precision, DEFAULT_PRECISION
from iadr1_tpu.models import common, qwen2
from iadr1_tpu.models.common import dense, rms_norm, rotate_half, swiglu
from iadr1_tpu.models.params_io import _get, _stack_layers


@dataclasses.dataclass(frozen=True)
class Qwen25VLVisionConfig:
    depth: int = 32
    hidden_size: int = 1280            # internal width
    intermediate_size: int = 3420
    out_hidden_size: int = 2048        # text model hidden
    num_heads: int = 16
    in_channels: int = 3
    patch_size: int = 14
    spatial_merge_size: int = 2
    temporal_patch_size: int = 2
    window_size: int = 112
    fullatt_block_indexes: tuple[int, ...] = (7, 15, 23, 31)
    rope_theta: float = 10000.0
    rms_norm_eps: float = 1e-6

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def patch_dim(self) -> int:
        return self.in_channels * self.temporal_patch_size * self.patch_size ** 2

    @property
    def merge_dim(self) -> int:
        return self.hidden_size * self.spatial_merge_size ** 2


@dataclasses.dataclass(frozen=True)
class Qwen25VLConfig:
    text: qwen2.Qwen2Config
    vision: Qwen25VLVisionConfig
    image_token_id: int = 151655
    video_token_id: int = 151656
    vision_start_token_id: int = 151652
    vision_end_token_id: int = 151653


# ---------------------------------------------------------------------------
# host precompute: window permutation + segment arrays
# ---------------------------------------------------------------------------


def window_partition(grid_thw, cfg: Qwen25VLVisionConfig):
    """-> (patch_perm [P], window_segs [P], feature_order [P//m^2]).

    ``patch_perm`` reorders the patch stream into window order (units of
    spatial_merge_unit patches move together, matching HF get_window_index);
    ``window_segs`` numbers each attention window 1..; ``feature_order``
    maps window-ordered merged features back to reading order (HF's
    reverse_indices argsort).
    """
    m = cfg.spatial_merge_size
    unit = m * m
    win = cfg.window_size // m // cfg.patch_size   # window side in features
    perm_units = []          # merged-feature indices in window order
    window_sizes = []        # features per window
    base = 0
    for t, h, w in grid_thw:
        gh, gw = int(h) // m, int(w) // m
        idx = np.arange(int(t) * gh * gw).reshape(int(t), gh, gw)
        pad_h = (-gh) % win
        pad_w = (-gw) % win
        padded = np.full((int(t), gh + pad_h, gw + pad_w), -1, np.int64)
        padded[:, :gh, :gw] = idx
        nh, nw = (gh + pad_h) // win, (gw + pad_w) // win
        padded = padded.reshape(int(t), nh, win, nw, win)
        padded = padded.transpose(0, 1, 3, 2, 4).reshape(int(t) * nh * nw, win * win)
        for row in padded:
            kept = row[row != -1]
            if len(kept):
                perm_units.append(kept + base)
                window_sizes.append(len(kept))
        base += int(t) * gh * gw
    feature_order = np.concatenate(perm_units)                    # [F]
    # patch-level permutation: each feature unit spans `unit` patches
    patch_perm = (feature_order[:, None] * unit + np.arange(unit)).reshape(-1)
    window_segs = np.repeat(
        np.arange(1, len(window_sizes) + 1),
        np.asarray(window_sizes) * unit,
    ).astype(np.int32)
    return patch_perm.astype(np.int64), window_segs, feature_order


def qwen25vl_vision_arrays(grid_thw, cfg: Qwen25VLVisionConfig,
                           pad_to: int | None = None):
    """All host-side arrays for the tower, in window-permuted order.

    Returns dict: patch_perm, rot_cos, rot_sin, full_segs, window_segs,
    feature_order; arrays padded to ``pad_to`` patches (features to
    pad_to // merge_unit).
    """
    from iadr1_tpu.vision import preprocess as vp

    patch_perm, window_segs, feature_order = window_partition(grid_thw, cfg)
    cos, sin = vp.vision_rotary_tables(
        grid_thw, cfg.head_dim, cfg.spatial_merge_size, cfg.rope_theta
    )
    full_segs = vp.vision_segment_ids(grid_thw)
    cos, sin = cos[patch_perm], sin[patch_perm]
    full_segs = full_segs[patch_perm]
    P = len(patch_perm)
    if pad_to is not None and pad_to > P:
        pad = pad_to - P
        cos = np.concatenate([cos, np.ones((pad, cos.shape[1]), np.float32)])
        sin = np.concatenate([sin, np.zeros((pad, sin.shape[1]), np.float32)])
        full_segs = np.concatenate([full_segs, np.zeros(pad, np.int32)])
        window_segs = np.concatenate([window_segs, np.zeros(pad, np.int32)])
    return {
        "patch_perm": patch_perm,
        "rot_cos": cos, "rot_sin": sin,
        "full_segs": full_segs, "window_segs": window_segs,
        "feature_order": feature_order,
    }


# ---------------------------------------------------------------------------
# params
# ---------------------------------------------------------------------------


def init_vision_params(key, cfg: Qwen25VLVisionConfig, dtype=jnp.float32) -> dict:
    keys = jax.random.split(key, 10)
    L, E, I = cfg.depth, cfg.hidden_size, cfg.intermediate_size

    def stack(k, i, o):
        ks = jax.random.split(k, L)
        return jnp.stack([common.dense_init(kk, i, o, dtype) for kk in ks])

    return {
        "patch_embed": {"kernel": common.dense_init(keys[0], cfg.patch_dim, E, dtype)},
        "blocks": {
            "norm1": jnp.ones((L, E), dtype),
            "norm2": jnp.ones((L, E), dtype),
            "attn": {
                "qkv": {"kernel": stack(keys[1], E, 3 * E), "bias": jnp.zeros((L, 3 * E), dtype)},
                "proj": {"kernel": stack(keys[2], E, E), "bias": jnp.zeros((L, E), dtype)},
            },
            "mlp": {
                "gate": {"kernel": stack(keys[3], E, I), "bias": jnp.zeros((L, I), dtype)},
                "up": {"kernel": stack(keys[4], E, I), "bias": jnp.zeros((L, I), dtype)},
                "down": {"kernel": stack(keys[5], I, E), "bias": jnp.zeros((L, E), dtype)},
            },
        },
        "merger": {
            "ln_q": jnp.ones((E,), dtype),
            "fc1": {"kernel": common.dense_init(keys[6], cfg.merge_dim, cfg.merge_dim, dtype),
                    "bias": jnp.zeros((cfg.merge_dim,), dtype)},
            "fc2": {"kernel": common.dense_init(keys[7], cfg.merge_dim, cfg.out_hidden_size, dtype),
                    "bias": jnp.zeros((cfg.out_hidden_size,), dtype)},
        },
    }


def vision_logical_axes(cfg: Qwen25VLVisionConfig) -> dict:
    return {
        "patch_embed": {"kernel": ("patch", "embed")},
        "blocks": {
            "norm1": (None, "norm"),
            "norm2": (None, "norm"),
            "attn": {
                "qkv": {"kernel": (None, "embed", "qkv"), "bias": (None, "qkv")},
                "proj": {"kernel": (None, "heads", "embed"), "bias": (None, "norm")},
            },
            "mlp": {
                "gate": {"kernel": (None, "embed", "mlp"), "bias": (None, "mlp")},
                "up": {"kernel": (None, "embed", "mlp"), "bias": (None, "mlp")},
                "down": {"kernel": (None, "mlp", "embed"), "bias": (None, "norm")},
            },
        },
        "merger": {
            "ln_q": ("norm",),
            "fc1": {"kernel": ("embed", "mlp"), "bias": ("mlp",)},
            "fc2": {"kernel": ("mlp", "embed"), "bias": ("norm",)},
        },
    }


def convert_vision(state, cfg: Qwen25VLVisionConfig, prefix="visual.",
                   dtype=jnp.float32) -> dict:
    L = cfg.depth
    bt = prefix + "blocks.{i}."
    pe_w = np.asarray(state[prefix + "patch_embed.proj.weight"])
    params = {
        "patch_embed": {"kernel": jnp.asarray(pe_w.reshape(pe_w.shape[0], -1).T, dtype)},
        "blocks": {
            "norm1": _stack_layers(state, bt + "norm1.weight", L, dtype=dtype),
            "norm2": _stack_layers(state, bt + "norm2.weight", L, dtype=dtype),
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
                "gate": {
                    "kernel": _stack_layers(state, bt + "mlp.gate_proj.weight", L, True, dtype),
                    "bias": _stack_layers(state, bt + "mlp.gate_proj.bias", L, dtype=dtype),
                },
                "up": {
                    "kernel": _stack_layers(state, bt + "mlp.up_proj.weight", L, True, dtype),
                    "bias": _stack_layers(state, bt + "mlp.up_proj.bias", L, dtype=dtype),
                },
                "down": {
                    "kernel": _stack_layers(state, bt + "mlp.down_proj.weight", L, True, dtype),
                    "bias": _stack_layers(state, bt + "mlp.down_proj.bias", L, dtype=dtype),
                },
            },
        },
        "merger": {
            "ln_q": _get(state, prefix + "merger.ln_q.weight", dtype=dtype),
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
    return params


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def apply_vision(
    params: dict,
    cfg: Qwen25VLVisionConfig,
    patches: jax.Array,         # [P, patch_dim] WINDOW-PERMUTED order
    rot_cos: jax.Array,
    rot_sin: jax.Array,
    full_segs: jax.Array,       # [P] per-image segments (permuted order)
    window_segs: jax.Array,     # [P] per-window segments
    precision: Precision = DEFAULT_PRECISION,
    attention_fn: Callable | None = None,
    remat: bool = False,
) -> jax.Array:
    """Window-permuted patch stream -> merged features (window order).

    The caller scatters features with window-order-aware indices (see
    qwen25vl_vision_arrays feature_order), so no device-side reversal.
    """
    P = patches.shape[0]
    H, D = cfg.num_heads, cfg.head_dim
    eps = cfg.rms_norm_eps
    h = dense(patches.astype(precision.compute_dtype), params["patch_embed"]["kernel"])
    # replicated inside the remat region (see qwen2_vl.apply_vision note)
    from iadr1_tpu.core.mesh import constrain_replicated

    rot_cos = constrain_replicated(rot_cos)
    rot_sin = constrain_replicated(rot_sin)
    cos = rot_cos[None, :, None, :]
    sin = rot_sin[None, :, None, :]

    def seg_mask(segs):
        m = (segs[:, None] == segs[None, :]) & (segs[None, :] != 0)
        return m[None, None, :, :]

    full_mask = seg_mask(full_segs)
    window_mask = seg_mask(window_segs)

    def block(h, xs):
        layer, use_full = xs
        use_full = use_full.astype(bool)
        segs = jnp.where(use_full, full_segs, window_segs)[None, :]
        x = rms_norm(h, layer["norm1"], eps)
        # named for remat="save_acts" (see siglip.py)
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
        if attention_fn is None:
            mask = jnp.where(use_full, full_mask, window_mask)
            attn_out = common.xla_attention(q, k, v, mask)
        else:
            attn_out = attention_fn(
                q, k, v, mask=None, q_segments=segs, kv_segments=segs,
                causal=False,
            )
        attn_out = checkpoint_name(attn_out.reshape(P, H * D), "act_attn")
        h = h + dense(attn_out,
                      layer["attn"]["proj"]["kernel"],
                      layer["attn"]["proj"]["bias"])
        x = rms_norm(h, layer["norm2"], eps)
        mlp = layer["mlp"]
        g = checkpoint_name(
            dense(x, mlp["gate"]["kernel"], mlp["gate"]["bias"]), "act_fc1")
        u = checkpoint_name(
            dense(x, mlp["up"]["kernel"], mlp["up"]["bias"]), "act_fc1")
        h = h + dense(jax.nn.silu(g) * u, mlp["down"]["kernel"], mlp["down"]["bias"])
        return h, None

    use_full_flags = jnp.zeros((cfg.depth,), jnp.int32)
    if cfg.fullatt_block_indexes:
        use_full_flags = use_full_flags.at[
            jnp.asarray(cfg.fullatt_block_indexes)
        ].set(1)
    if remat == "save_acts":
        policy = jax.checkpoint_policies.save_only_these_names(
            "flash_out", "flash_lse", "act_qkv", "act_attn", "act_fc1")
        body = jax.checkpoint(block, policy=policy)
    else:
        body = jax.checkpoint(block) if remat else block
    h, _ = jax.lax.scan(body, h, (params["blocks"], use_full_flags))

    m = params["merger"]
    h = rms_norm(h, m["ln_q"], eps)
    h = h.reshape(-1, cfg.merge_dim)
    h = dense(h, m["fc1"]["kernel"], m["fc1"]["bias"])
    h = jax.nn.gelu(h, approximate=False)
    return dense(h, m["fc2"]["kernel"], m["fc2"]["bias"])


# ---------------------------------------------------------------------------
# full VLM (shares the decoder + glue with qwen2_vl)
# ---------------------------------------------------------------------------


def init_params(key, cfg: Qwen25VLConfig, dtype=jnp.float32) -> dict:
    k1, k2 = jax.random.split(key)
    return {
        "text": qwen2.init_params(k1, cfg.text, dtype),
        "vision": init_vision_params(k2, cfg.vision, dtype),
    }


def logical_axes(cfg: Qwen25VLConfig) -> dict:
    return {
        "text": qwen2.logical_axes(cfg.text),
        "vision": vision_logical_axes(cfg.vision),
    }


def convert_hf(state, cfg: Qwen25VLConfig, dtype=jnp.float32) -> dict:
    from iadr1_tpu.models.params_io import convert_qwen2

    if any(k.startswith("model.language_model.") for k in state):
        text_prefix, vis_prefix = "model.language_model.", "model.visual."
    else:
        text_prefix, vis_prefix = "model.", "visual."
    return {
        "text": convert_qwen2(state, cfg.text, prefix=text_prefix, dtype=dtype),
        "vision": convert_vision(state, cfg.vision, prefix=vis_prefix, dtype=dtype),
    }


def apply(
    params: dict,
    cfg: Qwen25VLConfig,
    input_ids: jax.Array,
    position_ids: jax.Array,
    *,
    patches: jax.Array | None = None,
    rot_cos: jax.Array | None = None,
    rot_sin: jax.Array | None = None,
    full_segs: jax.Array | None = None,
    window_segs: jax.Array | None = None,
    scatter_rows: jax.Array | None = None,
    scatter_cols: jax.Array | None = None,
    segment_ids: jax.Array | None = None,
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
    from iadr1_tpu.models.qwen2_vl import merge_image_features

    embeds = common.embed_lookup(params["text"]["embed"]["weight"], input_ids).astype(
        precision.compute_dtype
    )
    if patches is not None:
        feats = apply_vision(
            params["vision"], cfg.vision, patches, rot_cos, rot_sin,
            full_segs, window_segs, precision=precision,
            attention_fn=vision_attention_fn,
            remat=remat if tower_remat is None else tower_remat,
        )
        embeds = merge_image_features(embeds, feats, scatter_rows, scatter_cols)
    return qwen2.apply(
        params["text"], cfg.text, inputs_embeds=embeds,
        position_ids=position_ids, segment_ids=segment_ids, cache=cache,
        cache_mode=cache_mode, precision=precision,
        attention_fn=attention_fn, decode_attention_fn=decode_attention_fn,
        remat=remat,
        lora=lora.get("text") if lora else None, lora_scale=lora_scale,
    )


def logits(params, cfg: Qwen25VLConfig, hidden, precision=DEFAULT_PRECISION):
    return qwen2.logits(params["text"], cfg.text, hidden, precision)
