"""LLaVA-OneVision: SigLIP tower + 2-layer projector + Qwen2 decoder with
anyres feature packing and newline embeddings.

Semantics match HF ``LlavaOnevisionForConditionalGeneration`` (the
reference's LLaVA-OneVision-SI-0.5B/7B models, README.md:233-243; template
llava_next_qwen).  Feature path: SigLIP hidden states from the last encoder
layer (pre post-layernorm, vision_feature_select_strategy="full"), projected
to text width, then anyres-packed (base tile + unpadded spatial grid +
per-row newline vectors, anyres_max_9) -- executed on device as a
host-planned weighted gather (iadr1_tpu/vision/anyres.py), so it is one jit
program and differentiable into the tower.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from iadr1_tpu.core.precision import Precision, DEFAULT_PRECISION
from iadr1_tpu.models import common, qwen2, siglip
from iadr1_tpu.models.common import dense
from iadr1_tpu.models.params_io import _get
from iadr1_tpu.models.qwen2_vl import merge_image_features


@dataclasses.dataclass(frozen=True)
class LlavaOnevisionConfig:
    text: qwen2.Qwen2Config
    vision: siglip.SiglipVisionConfig
    image_token_id: int = 151646
    image_grid_pinpoints: tuple = ()
    vision_aspect_ratio: str = "anyres_max_9"
    vision_feature_layer: int = -1
    vision_feature_select_strategy: str = "full"

    @property
    def max_tiles(self) -> int:
        return int(self.vision_aspect_ratio.removeprefix("anyres_max_"))


def init_params(key, cfg: LlavaOnevisionConfig, dtype=jnp.float32) -> dict:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    hid = cfg.text.hidden_size
    E = cfg.vision.hidden_size
    return {
        "text": qwen2.init_params(k1, cfg.text, dtype),
        "vision": siglip.init_params(k2, cfg.vision, dtype),
        "projector": {
            "fc1": {"kernel": common.dense_init(k3, E, hid, dtype),
                    "bias": jnp.zeros((hid,), dtype)},
            "fc2": {"kernel": common.dense_init(k4, hid, hid, dtype),
                    "bias": jnp.zeros((hid,), dtype)},
        },
        "image_newline": jnp.zeros((hid,), dtype),
    }


def logical_axes(cfg: LlavaOnevisionConfig) -> dict:
    return {
        "text": qwen2.logical_axes(cfg.text),
        "vision": siglip.logical_axes(cfg.vision),
        "projector": {
            "fc1": {"kernel": ("embed", "mlp"), "bias": ("mlp",)},
            "fc2": {"kernel": ("mlp", "embed"), "bias": ("norm",)},
        },
        "image_newline": ("norm",),
    }


def convert_hf(state, cfg: LlavaOnevisionConfig, dtype=jnp.float32) -> dict:
    from iadr1_tpu.models.params_io import convert_qwen2

    if any(k.startswith("model.language_model.") for k in state):
        lm_prefix = "model.language_model."
        vt_prefix = "model.vision_tower.vision_model."
        proj_prefix = "model.multi_modal_projector."
        newline_key = "model.image_newline"
    else:
        lm_prefix = "language_model.model."
        vt_prefix = "vision_tower.vision_model."
        proj_prefix = "multi_modal_projector."
        newline_key = "image_newline"
    return {
        "text": convert_qwen2(state, cfg.text, prefix=lm_prefix, dtype=dtype),
        "vision": siglip.convert_hf(state, cfg.vision, prefix=vt_prefix, dtype=dtype),
        "projector": {
            "fc1": {"kernel": _get(state, proj_prefix + "linear_1.weight", True, dtype),
                    "bias": _get(state, proj_prefix + "linear_1.bias", dtype=dtype)},
            "fc2": {"kernel": _get(state, proj_prefix + "linear_2.weight", True, dtype),
                    "bias": _get(state, proj_prefix + "linear_2.bias", dtype=dtype)},
        },
        "image_newline": _get(state, newline_key, dtype=dtype),
    }


def project_and_pack(
    params: dict,
    cfg: LlavaOnevisionConfig,
    tile_features: jax.Array,       # [n_tiles, g^2, E] from the tower
    pack_src: jax.Array,            # [F, 4] into flattened [n_tiles*g^2]
    pack_weights: jax.Array,        # [F, 4]
    newline_mask: jax.Array,        # [F] bool
) -> jax.Array:
    """projector + anyres gather + newline substitution -> [F, hid]."""
    p = params["projector"]
    h = dense(tile_features, p["fc1"]["kernel"], p["fc1"]["bias"])
    h = jax.nn.gelu(h, approximate=False)
    h = dense(h, p["fc2"]["kernel"], p["fc2"]["bias"])
    flat = h.reshape(-1, h.shape[-1])
    gathered = (flat[pack_src] * pack_weights[..., None].astype(flat.dtype)).sum(1)
    newline = params["image_newline"].astype(gathered.dtype)
    return jnp.where(newline_mask[:, None], newline[None, :], gathered)


def compute_embeds(params, cfg, input_ids, *, tiles=None, pack_src=None,
                   pack_weights=None, newline_mask=None, scatter_rows=None,
                   scatter_cols=None, precision=DEFAULT_PRECISION,
                   remat=False, tower_attention_fn=None, tower_remat=None):
    """Token embeddings with anyres image features scattered in (shared by
    apply and the shared-prompt GRPO scoring path).

    ``tower_remat``: None follows ``remat``; False/"full"/policy strings
    override the SigLIP tower independently of the decoder (the tower's
    activations are a different memory/recompute trade than the text
    stack -- tools/probe_vlm_perf.py sweeps this)."""
    embeds = common.embed_lookup(
        params["text"]["embed"]["weight"], input_ids
    ).astype(precision.compute_dtype)
    if tiles is not None:
        feats = siglip.apply(
            params["vision"], cfg.vision, tiles, precision=precision,
            remat=remat if tower_remat is None else tower_remat,
            post_layernorm=False,
            attention_fn=tower_attention_fn,
        )
        packed = project_and_pack(
            params, cfg, feats, pack_src, pack_weights, newline_mask
        )
        embeds = merge_image_features(embeds, packed, scatter_rows, scatter_cols)
    return embeds


def apply(
    params: dict,
    cfg: LlavaOnevisionConfig,
    input_ids: jax.Array,
    position_ids: jax.Array,
    *,
    tiles: jax.Array | None = None,          # [n_tiles, g^2, patch_dim]
    pack_src: jax.Array | None = None,
    pack_weights: jax.Array | None = None,
    newline_mask: jax.Array | None = None,
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
    tower_attention_fn: Callable | None = None,
    tower_remat=None,
) -> tuple[jax.Array, dict | None]:
    embeds = compute_embeds(
        params, cfg, input_ids, tiles=tiles, pack_src=pack_src,
        pack_weights=pack_weights, newline_mask=newline_mask,
        scatter_rows=scatter_rows, scatter_cols=scatter_cols,
        precision=precision, remat=remat,
        tower_attention_fn=tower_attention_fn, tower_remat=tower_remat,
    )
    return qwen2.apply(
        params["text"], cfg.text, inputs_embeds=embeds,
        position_ids=position_ids, segment_ids=segment_ids, cache=cache,
        cache_mode=cache_mode, precision=precision,
        attention_fn=attention_fn, decode_attention_fn=decode_attention_fn,
        remat=remat,
        lora=lora.get("text") if lora else None, lora_scale=lora_scale,
    )


def logits(params, cfg: LlavaOnevisionConfig, hidden,
           precision=DEFAULT_PRECISION):
    return qwen2.logits(params["text"], cfg.text, hidden, precision)
