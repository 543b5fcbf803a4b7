"""PaliGemma: SigLIP tower + linear projector + Gemma decoder.

The decoder is the qwen2 module with its Gemma knobs (rms_norm_offset=1
-> (1 + w) norms with zero-init weights, gelu_pytorch_tanh MLPs,
sqrt(hidden) embedding scaling, tied embeddings, explicit head_dim, no
attention bias).  Semantics match HF ``PaliGemmaForConditionalGeneration``:

* image features = SigLIP last hidden state -> one linear projection ->
  divided by sqrt(text hidden) (get_image_features), scattered over the
  image-token run the processor PREPENDS to the text;
* prefix-LM attention: during training every query may attend KV columns
  whose token_type_ids == 0 -- exactly the image-token prefix in the
  reference's collation (llamafactory/data/mm_plugin.py:732) -- and at
  inference prefill the whole block is bidirectional
  (modeling_paligemma.py _update_causal_mask);
* positions are 1-indexed (prepare_inputs_for_generation adds 1).

The reference trains this family through AutoModelForVision2Seq + the
paligemma mm plugin (llamafactory/model/loader.py:186-189,
data/mm_plugin.py:680-739); this module is the first-party TPU tower.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp

from iadr1_tpu.core.precision import Precision, DEFAULT_PRECISION
from iadr1_tpu.models import common, qwen2, siglip
from iadr1_tpu.models.common import dense
from iadr1_tpu.models.params_io import _get
from iadr1_tpu.models.qwen2_vl import merge_image_features


@dataclasses.dataclass(frozen=True)
class PaliGemmaConfig:
    text: qwen2.Qwen2Config
    vision: siglip.SiglipVisionConfig
    image_token_id: int = 257152
    projection_dim: int | None = None     # defaults to text hidden size

    @property
    def projection_dim_(self) -> int:
        return self.projection_dim or self.text.hidden_size


def init_params(key, cfg: PaliGemmaConfig, dtype=jnp.float32) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)
    E, P = cfg.vision.hidden_size, cfg.projection_dim_
    return {
        "text": qwen2.init_params(k1, cfg.text, dtype),
        "vision": siglip.init_params(k2, cfg.vision, dtype),
        "projector": {
            "kernel": common.dense_init(k3, E, P, dtype),
            "bias": jnp.zeros((P,), dtype),
        },
    }


def logical_axes(cfg: PaliGemmaConfig) -> dict:
    return {
        "text": qwen2.logical_axes(cfg.text),
        "vision": siglip.logical_axes(cfg.vision),
        "projector": {"kernel": ("embed", "mlp"), "bias": ("norm",)},
    }


def convert_hf(state, cfg: PaliGemmaConfig, dtype=jnp.float32) -> dict:
    """HF PaliGemmaForConditionalGeneration state dict -> param pytree
    (both the new-style ``model.language_model.`` and the old-style
    ``language_model.model.`` key layouts)."""
    from iadr1_tpu.models.params_io import convert_qwen2

    if any(k.startswith("model.language_model.") for k in state):
        lm_prefix = "model.language_model."
        vt_prefix = "model.vision_tower.vision_model."
        proj_prefix = "model.multi_modal_projector."
    else:
        lm_prefix = "language_model.model."
        vt_prefix = "vision_tower.vision_model."
        proj_prefix = "multi_modal_projector."
    return {
        "text": convert_qwen2(state, cfg.text, prefix=lm_prefix, dtype=dtype),
        "vision": siglip.convert_hf(state, cfg.vision, prefix=vt_prefix,
                                    dtype=dtype),
        "projector": {
            "kernel": _get(state, proj_prefix + "linear.weight", True, dtype),
            "bias": _get(state, proj_prefix + "linear.bias", dtype=dtype),
        },
    }


def compute_embeds(params, cfg: PaliGemmaConfig, input_ids, *, tiles=None,
                   scatter_rows=None, scatter_cols=None,
                   precision=DEFAULT_PRECISION, remat=False,
                   tower_remat=None):
    """Token embeddings with projected SigLIP features scattered into the
    image-token slots.  Features are divided by sqrt(text hidden) here; the
    decoder multiplies the merged embeds back up by the same factor
    (cfg.text.scale_embeds), matching HF's get_image_features."""
    tower_rm = remat if tower_remat is None else tower_remat
    embeds = common.embed_lookup(
        params["text"]["embed"]["weight"], input_ids
    ).astype(precision.compute_dtype)
    if tiles is not None:
        feats = siglip.apply(params["vision"], cfg.vision, tiles,
                             precision=precision, remat=tower_rm)
        p = params["projector"]
        feats = dense(feats, p["kernel"], p["bias"])
        feats = feats * jnp.asarray(cfg.text.hidden_size ** -0.5, feats.dtype)
        embeds = merge_image_features(
            embeds, feats.reshape(-1, feats.shape[-1]),
            scatter_rows, scatter_cols)
    return embeds


def apply(
    params: dict,
    cfg: PaliGemmaConfig,
    input_ids: jax.Array,
    position_ids: jax.Array,
    *,
    tiles: jax.Array | None = None,          # [n, num_patches, patch_dim]
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
    # Prefix-LM flags: training/scoring (no cache) unmasks the image-token
    # prefix (reference token_type_ids==0 columns); generate prefill
    # unmasks the whole prompt block (HF eval-mode mask).  Decode steps
    # are causal over cache-slot order, which is already exact.
    if cache is None:
        bidir = (input_ids == cfg.image_token_id).astype(jnp.int32)
    elif cache_mode == "prefill":
        bidir = jnp.ones(input_ids.shape, jnp.int32)
    else:
        bidir = None
    return qwen2.apply(
        params["text"], cfg.text, inputs_embeds=embeds,
        position_ids=position_ids + 1,        # PaliGemma is 1-indexed
        segment_ids=segment_ids, bidirectional_mask=bidir,
        cache=cache, cache_mode=cache_mode, precision=precision,
        attention_fn=attention_fn, decode_attention_fn=decode_attention_fn,
        remat=remat,
        lora=lora.get("text") if lora else None, lora_scale=lora_scale,
    )


def logits(params, cfg: PaliGemmaConfig, hidden, precision=DEFAULT_PRECISION):
    return qwen2.logits(params["text"], cfg.text, hidden, precision)
