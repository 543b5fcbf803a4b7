"""InternVL (2.5-class): InternViT tower + pixel-shuffle + MLP projector +
Qwen2 decoder.

Semantics match HF ``InternVLForConditionalGeneration`` (the reference's
InternVL-2.5-4B family, README.md:233-243; the reference carries a custom
InternVL mm_plugin + tokenizer patch, mm_plugin.py:980-1131,
model/loader.py:92-131):

* tower: conv patch embedding (with bias) + CLS + absolute position
  embeddings; pre/post layernorm blocks with layer-scale (lambda_1/2),
  optional QK-RMSNorm, gelu MLPs; no final norm (use_mean_pooling).
* features: drop CLS, reshape to the spatial grid, pixel-shuffle downsample
  (0.5 -> 4x channels), LayerNorm + 2-layer MLP projector.
* images: aspect-ratio-optimal dynamic tiling into 448x448 tiles (max 12)
  plus a thumbnail (GOT-OCR2 crop_to_patches semantics, which the HF
  InternVL processor delegates to).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from iadr1_tpu.core.precision import Precision, DEFAULT_PRECISION
from iadr1_tpu.models import common, qwen2
from iadr1_tpu.models.common import dense
from iadr1_tpu.models.params_io import _get, _stack_layers
from iadr1_tpu.models.qwen2_vl import layer_norm, merge_image_features


@dataclasses.dataclass(frozen=True)
class InternVLVisionConfig:
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    image_size: int = 448
    patch_size: int = 14
    layer_norm_eps: float = 1e-6
    attention_bias: bool = True
    use_qk_norm: bool = False
    norm_type: str = "layer_norm"

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid ** 2

    @property
    def patch_dim(self) -> int:
        return 3 * self.patch_size ** 2


@dataclasses.dataclass(frozen=True)
class InternVLConfig:
    text: qwen2.Qwen2Config
    vision: InternVLVisionConfig
    image_token_id: int = 151667
    downsample_ratio: float = 0.5
    min_tiles: int = 1
    max_tiles: int = 12

    @property
    def features_per_tile(self) -> int:
        side = int(self.vision.grid * self.downsample_ratio)
        return side * side


def _norm(params, x, cfg):
    if cfg.norm_type == "rms_norm":
        return common.rms_norm(x, params["scale"], cfg.layer_norm_eps)
    return layer_norm(x, params["scale"], params["bias"], cfg.layer_norm_eps)


def init_vision_params(key, cfg: InternVLVisionConfig, dtype=jnp.float32) -> dict:
    keys = jax.random.split(key, 10)
    L, E, I = cfg.num_hidden_layers, cfg.hidden_size, cfg.intermediate_size

    def stack(k, i, o):
        ks = jax.random.split(k, L)
        return jnp.stack([common.dense_init(kk, i, o, dtype) for kk in ks])

    def norm(n):
        out = {"scale": jnp.ones((L, n), dtype)}
        if cfg.norm_type == "layer_norm":
            out["bias"] = jnp.zeros((L, n), dtype)
        return out

    params = {
        "cls_token": jnp.zeros((E,), dtype),
        "patch_embed": {
            "kernel": common.dense_init(keys[0], cfg.patch_dim, E, dtype),
            "bias": jnp.zeros((E,), dtype),
        },
        "pos_embed": common.embed_init(keys[1], cfg.num_patches + 1, E, dtype),
        "layers": {
            "norm1": norm(E),
            "norm2": norm(E),
            "lambda1": jnp.full((L, E), 0.1, dtype),
            "lambda2": jnp.full((L, E), 0.1, dtype),
            "attn": {
                "q": {"kernel": stack(keys[2], E, E)},
                "k": {"kernel": stack(keys[3], E, E)},
                "v": {"kernel": stack(keys[4], E, E)},
                "o": {"kernel": stack(keys[5], E, E), "bias": jnp.zeros((L, E), dtype)},
            },
            "mlp": {
                "fc1": {"kernel": stack(keys[6], E, I), "bias": jnp.zeros((L, I), dtype)},
                "fc2": {"kernel": stack(keys[7], I, E), "bias": jnp.zeros((L, E), dtype)},
            },
        },
    }
    if cfg.attention_bias:
        for name in ("q", "k", "v"):
            params["layers"]["attn"][name]["bias"] = jnp.zeros((L, E), dtype)
    if cfg.use_qk_norm:
        params["layers"]["attn"]["q_norm"] = jnp.ones((L, E), dtype)
        params["layers"]["attn"]["k_norm"] = jnp.ones((L, E), dtype)
    return params


def vision_logical_axes(cfg: InternVLVisionConfig) -> dict:
    def norm():
        out = {"scale": (None, "norm")}
        if cfg.norm_type == "layer_norm":
            out["bias"] = (None, "norm")
        return out

    axes = {
        "cls_token": ("norm",),
        "patch_embed": {"kernel": ("patch", "embed"), "bias": ("norm",)},
        "pos_embed": (None, "embed"),
        "layers": {
            "norm1": norm(),
            "norm2": norm(),
            "lambda1": (None, "norm"),
            "lambda2": (None, "norm"),
            "attn": {
                "q": {"kernel": (None, "embed", "heads")},
                "k": {"kernel": (None, "embed", "heads")},
                "v": {"kernel": (None, "embed", "heads")},
                "o": {"kernel": (None, "heads", "embed"), "bias": (None, "norm")},
            },
            "mlp": {
                "fc1": {"kernel": (None, "embed", "mlp"), "bias": (None, "mlp")},
                "fc2": {"kernel": (None, "mlp", "embed"), "bias": (None, "norm")},
            },
        },
    }
    if cfg.attention_bias:
        for name in ("q", "k", "v"):
            axes["layers"]["attn"][name]["bias"] = (None, "heads")
    if cfg.use_qk_norm:
        axes["layers"]["attn"]["q_norm"] = (None, "norm")
        axes["layers"]["attn"]["k_norm"] = (None, "norm")
    return axes


def convert_vision(state, cfg: InternVLVisionConfig,
                   prefix: str = "model.vision_tower.", dtype=jnp.float32) -> dict:
    L = cfg.num_hidden_layers
    lt = prefix + "encoder.layer.{i}."
    pe = np.asarray(
        state[prefix + "embeddings.patch_embeddings.projection.weight"]
    )

    def norm(name):
        out = {"scale": _stack_layers(state, lt + name + ".weight", L, dtype=dtype)}
        if cfg.norm_type == "layer_norm":
            out["bias"] = _stack_layers(state, lt + name + ".bias", L, dtype=dtype)
        return out

    params = {
        "cls_token": jnp.asarray(
            np.asarray(state[prefix + "embeddings.cls_token"]).reshape(-1), dtype
        ),
        "patch_embed": {
            "kernel": jnp.asarray(pe.reshape(pe.shape[0], -1).T, dtype),
            "bias": _get(state, prefix + "embeddings.patch_embeddings.projection.bias", dtype=dtype),
        },
        "pos_embed": jnp.asarray(
            np.asarray(state[prefix + "embeddings.position_embeddings"])[0], dtype
        ),
        "layers": {
            "norm1": norm("layernorm_before"),
            "norm2": norm("layernorm_after"),
            "lambda1": _stack_layers(state, lt + "lambda_1", L, dtype=dtype),
            "lambda2": _stack_layers(state, lt + "lambda_2", L, dtype=dtype),
            "attn": {
                "q": {"kernel": _stack_layers(state, lt + "attention.q_proj.weight", L, True, dtype)},
                "k": {"kernel": _stack_layers(state, lt + "attention.k_proj.weight", L, True, dtype)},
                "v": {"kernel": _stack_layers(state, lt + "attention.v_proj.weight", L, True, dtype)},
                "o": {"kernel": _stack_layers(state, lt + "attention.projection_layer.weight", L, True, dtype),
                      "bias": _stack_layers(state, lt + "attention.projection_layer.bias", L, dtype=dtype)},
            },
            "mlp": {
                "fc1": {"kernel": _stack_layers(state, lt + "mlp.fc1.weight", L, True, dtype),
                        "bias": _stack_layers(state, lt + "mlp.fc1.bias", L, dtype=dtype)},
                "fc2": {"kernel": _stack_layers(state, lt + "mlp.fc2.weight", L, True, dtype),
                        "bias": _stack_layers(state, lt + "mlp.fc2.bias", L, dtype=dtype)},
            },
        },
    }
    if cfg.attention_bias:
        for name in ("q", "k", "v"):
            params["layers"]["attn"][name]["bias"] = _stack_layers(
                state, lt + f"attention.{name}_proj.bias", L, dtype=dtype
            )
    if cfg.use_qk_norm:
        params["layers"]["attn"]["q_norm"] = _stack_layers(
            state, lt + "attention.q_norm.weight", L, dtype=dtype
        )
        params["layers"]["attn"]["k_norm"] = _stack_layers(
            state, lt + "attention.k_norm.weight", L, dtype=dtype
        )
    return params


def apply_vision(
    params: dict,
    cfg: InternVLVisionConfig,
    tiles: jax.Array,                  # [N, num_patches, patch_dim]
    precision: Precision = DEFAULT_PRECISION,
    remat: bool = False,
) -> jax.Array:
    """Tile batch -> last hidden state [N, num_patches + 1, hidden]."""
    N, T, _ = tiles.shape
    H, D = cfg.num_attention_heads, cfg.head_dim
    h = dense(tiles.astype(precision.compute_dtype),
              params["patch_embed"]["kernel"], params["patch_embed"]["bias"])
    cls = jnp.broadcast_to(
        params["cls_token"].astype(h.dtype)[None, None, :], (N, 1, h.shape[-1])
    )
    h = jnp.concatenate([cls, h], axis=1)
    h = h + params["pos_embed"][None].astype(h.dtype)
    T1 = T + 1

    from jax.ad_checkpoint import checkpoint_name

    def block(h, layer):
        x = _norm(layer["norm1"], h, cfg)
        a = layer["attn"]
        # named for remat="save_acts" (see siglip.py)
        q = checkpoint_name(dense(x, a["q"]["kernel"], a["q"].get("bias")),
                            "act_qkv")
        k = checkpoint_name(dense(x, a["k"]["kernel"], a["k"].get("bias")),
                            "act_qkv")
        v = checkpoint_name(dense(x, a["v"]["kernel"], a["v"].get("bias")),
                            "act_qkv")
        if cfg.use_qk_norm:
            q = common.rms_norm(q, layer["attn"]["q_norm"], cfg.layer_norm_eps)
            k = common.rms_norm(k, layer["attn"]["k_norm"], cfg.layer_norm_eps)
        q = q.reshape(N, T1, H, D)
        k = k.reshape(N, T1, H, D)
        v = v.reshape(N, T1, H, D)
        attn = common.xla_attention(q, k, v, None)
        attn = checkpoint_name(attn.reshape(N, T1, H * D), "act_attn")
        attn = dense(attn, a["o"]["kernel"], a["o"]["bias"])
        h = h + attn * layer["lambda1"].astype(attn.dtype)
        x = _norm(layer["norm2"], h, cfg)
        x = checkpoint_name(
            dense(x, layer["mlp"]["fc1"]["kernel"],
                  layer["mlp"]["fc1"]["bias"]), "act_fc1")
        x = jax.nn.gelu(x, approximate=False)
        x = dense(x, layer["mlp"]["fc2"]["kernel"], layer["mlp"]["fc2"]["bias"])
        h = h + x * layer["lambda2"].astype(x.dtype)
        return h, None

    if remat == "save_acts":
        policy = jax.checkpoint_policies.save_only_these_names(
            "act_qkv", "act_attn", "act_fc1")
        body = jax.checkpoint(block, policy=policy)
    else:
        body = jax.checkpoint(block) if remat else block
    h, _ = jax.lax.scan(body, h, params["layers"])
    return h


def pixel_shuffle(features: jax.Array, scale: float = 0.5) -> jax.Array:
    """[N, W, H, C] -> [N, W*s, H*s, C/s^2] (HF InternVL ordering)."""
    N, W, H, C = features.shape
    x = features.reshape(N, W, int(H * scale), int(C / scale))
    x = x.transpose(0, 2, 1, 3)
    x = x.reshape(N, int(H * scale), int(W * scale), int(C / scale ** 2))
    return x.transpose(0, 2, 1, 3)


# ---------------------------------------------------------------------------
# full model
# ---------------------------------------------------------------------------


def init_params(key, cfg: InternVLConfig, dtype=jnp.float32) -> dict:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    hid = cfg.text.hidden_size
    E4 = cfg.vision.hidden_size * int(1 / cfg.downsample_ratio) ** 2
    return {
        "text": qwen2.init_params(k1, cfg.text, dtype),
        "vision": init_vision_params(k2, cfg.vision, dtype),
        "projector": {
            "norm": {"scale": jnp.ones((E4,), dtype), "bias": jnp.zeros((E4,), dtype)},
            "fc1": {"kernel": common.dense_init(k3, E4, hid, dtype),
                    "bias": jnp.zeros((hid,), dtype)},
            "fc2": {"kernel": common.dense_init(k4, hid, hid, dtype),
                    "bias": jnp.zeros((hid,), dtype)},
        },
    }


def logical_axes(cfg: InternVLConfig) -> dict:
    return {
        "text": qwen2.logical_axes(cfg.text),
        "vision": vision_logical_axes(cfg.vision),
        "projector": {
            "norm": {"scale": ("norm",), "bias": ("norm",)},
            "fc1": {"kernel": ("embed", "mlp"), "bias": ("mlp",)},
            "fc2": {"kernel": ("mlp", "embed"), "bias": ("norm",)},
        },
    }


def convert_hf(state, cfg: InternVLConfig, dtype=jnp.float32) -> dict:
    from iadr1_tpu.models.params_io import convert_qwen2

    if any(k.startswith("model.language_model.") for k in state):
        lm_prefix = "model.language_model."
        vt_prefix = "model.vision_tower."
        proj_prefix = "model.multi_modal_projector."
    else:
        lm_prefix = "language_model.model."
        vt_prefix = "vision_tower."
        proj_prefix = "multi_modal_projector."
    return {
        "text": convert_qwen2(state, cfg.text, prefix=lm_prefix, dtype=dtype),
        "vision": convert_vision(state, cfg.vision, prefix=vt_prefix, dtype=dtype),
        "projector": {
            "norm": {"scale": _get(state, proj_prefix + "layer_norm.weight", dtype=dtype),
                     "bias": _get(state, proj_prefix + "layer_norm.bias", dtype=dtype)},
            "fc1": {"kernel": _get(state, proj_prefix + "linear_1.weight", True, dtype),
                    "bias": _get(state, proj_prefix + "linear_1.bias", dtype=dtype)},
            "fc2": {"kernel": _get(state, proj_prefix + "linear_2.weight", True, dtype),
                    "bias": _get(state, proj_prefix + "linear_2.bias", dtype=dtype)},
        },
    }


def image_features(params, cfg: InternVLConfig, tiles, precision, remat=False):
    """Tiles -> projected features [N * features_per_tile, hid]."""
    h = apply_vision(params["vision"], cfg.vision, tiles, precision, remat)
    h = h[:, 1:]                                   # drop CLS
    N, C, E = h.shape
    f = int(C ** 0.5)
    h = h.reshape(N, f, f, E)
    h = pixel_shuffle(h, cfg.downsample_ratio)
    h = h.reshape(N, -1, h.shape[-1])
    p = params["projector"]
    h = layer_norm(h, p["norm"]["scale"], p["norm"]["bias"], 1e-5)
    h = dense(h, p["fc1"]["kernel"], p["fc1"]["bias"])
    h = jax.nn.gelu(h, approximate=False)
    h = dense(h, p["fc2"]["kernel"], p["fc2"]["bias"])
    return h.reshape(-1, h.shape[-1])


def compute_embeds(params, cfg, input_ids, *, tiles=None, scatter_rows=None,
                   scatter_cols=None, precision=DEFAULT_PRECISION,
                   remat=False, tower_remat=None, **_unused):
    """Token embeddings with InternViT features scattered in (shared by
    apply and the shared-prompt GRPO scoring path)."""
    embeds = common.embed_lookup(
        params["text"]["embed"]["weight"], input_ids
    ).astype(precision.compute_dtype)
    if tiles is not None:
        feats = image_features(
            params, cfg, tiles, precision,
            remat if tower_remat is None else tower_remat)
        embeds = merge_image_features(embeds, feats, scatter_rows, scatter_cols)
    return embeds


def apply(
    params: dict,
    cfg: InternVLConfig,
    input_ids: jax.Array,
    position_ids: jax.Array,
    *,
    tiles: jax.Array | None = None,
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
    remat: bool = False,
    tower_remat=None,
) -> tuple[jax.Array, dict | None]:
    embeds = compute_embeds(
        params, cfg, input_ids, tiles=tiles, scatter_rows=scatter_rows,
        scatter_cols=scatter_cols, precision=precision, remat=remat,
        tower_remat=tower_remat,
    )
    return qwen2.apply(
        params["text"], cfg.text, inputs_embeds=embeds,
        position_ids=position_ids, segment_ids=segment_ids, cache=cache,
        cache_mode=cache_mode, precision=precision,
        attention_fn=attention_fn, decode_attention_fn=decode_attention_fn,
        remat=remat,
        lora=lora.get("text") if lora else None, lora_scale=lora_scale,
    )


def logits(params, cfg: InternVLConfig, hidden, precision=DEFAULT_PRECISION):
    return qwen2.logits(params["text"], cfg.text, hidden, precision)


# ---------------------------------------------------------------------------
# dynamic tiling (host)
# ---------------------------------------------------------------------------


def optimal_tile_grid(height: int, width: int, tile: int,
                      min_tiles: int, max_tiles: int) -> tuple[int, int]:
    """(columns, rows) with aspect ratio closest to the image's
    (GOT-OCR2 get_optimal_tiled_canvas semantics incl. tie-breaking)."""
    grids = sorted(
        [
            (c, r)
            for c in range(1, max_tiles + 1)
            for r in range(1, max_tiles + 1)
            if min_tiles <= c * r <= max_tiles
        ],
        key=lambda g: g[0] * g[1],
    )
    aspect = width / height
    area = width * height
    best, best_diff = (1, 1), float("inf")
    for cols, rows in grids:
        diff = abs(aspect - cols / rows)
        if diff < best_diff:
            best_diff, best = diff, (cols, rows)
        elif diff == best_diff and area > 0.5 * tile * tile * cols * rows:
            best = (cols, rows)
    return best


def internvl_tiles(image, tile_size: int = 448, min_tiles: int = 1,
                   max_tiles: int = 12, use_thumbnail: bool = True,
                   mean=None, std=None):
    """PIL image -> (tiles [n, C, ts, ts] normalized, n_tiles).

    Aspect-optimal grid, squash-resize to the tile canvas, row-major crops,
    plus a squashed thumbnail appended last when more than one tile.
    """
    from PIL import Image

    from iadr1_tpu.vision.preprocess import OPENAI_CLIP_MEAN, OPENAI_CLIP_STD

    mean = OPENAI_CLIP_MEAN if mean is None else np.asarray(mean, np.float32)
    std = OPENAI_CLIP_STD if std is None else np.asarray(std, np.float32)
    if image.mode != "RGB":
        image = image.convert("RGB")
    cols, rows = optimal_tile_grid(image.height, image.width, tile_size,
                                   min_tiles, max_tiles)
    resized = image.resize((cols * tile_size, rows * tile_size),
                           resample=Image.Resampling.BICUBIC)
    arr = np.asarray(resized, np.float32) / 255.0
    tiles = []
    for i in range(cols * rows):
        c, r = i % cols, i // cols
        tiles.append(arr[r * tile_size : (r + 1) * tile_size,
                         c * tile_size : (c + 1) * tile_size])
    if use_thumbnail and len(tiles) != 1:
        thumb = image.resize((tile_size, tile_size),
                             resample=Image.Resampling.BICUBIC)
        tiles.append(np.asarray(thumb, np.float32) / 255.0)
    out = (np.stack(tiles) - mean) / std
    return out.transpose(0, 3, 1, 2), len(tiles)
