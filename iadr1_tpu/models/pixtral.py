"""Pixtral: variable-resolution RoPE vision tower + Mistral decoder.

Semantics match HF ``LlavaForConditionalGeneration`` with a
``PixtralVisionModel`` tower (modeling_pixtral.py): patch conv (no bias)
over arbitrary patch-multiple image sizes, RMSNorm (eps 1e-5) pre-norm
layers with unbiased qkv/o, 2-D rotary embeddings indexed by each patch's
(row, col) in a max_side meshgrid, silu-gated MLPs, NO final norm;
block-diagonal attention keeps each image attending within itself.  The
decoder is Mistral -- the qwen2 module with attention_bias=False.

TPU-native data plan: instead of HF's per-image conv + python-loop mask
(generate_block_attention_mask), the host packs all images into ONE static
patch stream with per-patch meshgrid position ids (rope table lookup) and
per-image segment ids (block-diagonal mask) -- the device sees only static
shapes.  Reference consumes this family via AutoModelForVision2Seq + the
pixtral mm plugin (llamafactory/model/loader.py:186-189,
data/mm_plugin.py:742-805).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from iadr1_tpu.core.precision import Precision, DEFAULT_PRECISION
from iadr1_tpu.models import common, qwen2
from iadr1_tpu.models.common import apply_rope, dense, rms_norm
from iadr1_tpu.models.params_io import _get, _stack_layers
from iadr1_tpu.models.qwen2_vl import merge_image_features

_NORM_EPS = 1e-5  # hardcoded in PixtralAttentionLayer / ln_pre


@dataclasses.dataclass(frozen=True)
class PixtralVisionConfig:
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    image_size: int = 1024        # max edge; actual inputs vary
    patch_size: int = 16
    rope_theta: float = 10000.0

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def max_side(self) -> int:
        return self.image_size // self.patch_size

    @property
    def patch_dim(self) -> int:
        return 3 * self.patch_size ** 2


@dataclasses.dataclass(frozen=True)
class PixtralConfig:
    text: qwen2.Qwen2Config
    vision: PixtralVisionConfig
    image_token_id: int = 10


# ---------------------------------------------------------------------------
# vision tower
# ---------------------------------------------------------------------------


def rope_half_table(cfg: PixtralVisionConfig) -> np.ndarray:
    """[max_side**2, head_dim//2] 2-D rotary half-frequencies.

    HF PixtralRotaryEmbedding: row positions drive the EVEN base
    frequencies, column positions the ODD ones, concatenated -- indexed by
    flat position id h * max_side + w."""
    d = cfg.head_dim
    freqs = 1.0 / cfg.rope_theta ** (np.arange(0, d, 2, np.float64) / d)
    s = cfg.max_side
    h = np.arange(s, dtype=np.float64)
    fh = np.outer(h, freqs[0::2])                     # [s, d/4]
    fw = np.outer(h, freqs[1::2])                     # [s, d/4]
    table = np.concatenate(
        [np.broadcast_to(fh[:, None, :], (s, s, fh.shape[1])),
         np.broadcast_to(fw[None, :, :], (s, s, fw.shape[1]))],
        axis=-1,
    ).reshape(s * s, d // 2)
    return table.astype(np.float32)


def init_tower_params(key, cfg: PixtralVisionConfig, dtype=jnp.float32) -> dict:
    keys = jax.random.split(key, 8)
    L, E, I = cfg.num_hidden_layers, cfg.hidden_size, cfg.intermediate_size

    def stack(k, i, o):
        ks = jax.random.split(k, L)
        return jnp.stack([common.dense_init(kk, i, o, dtype) for kk in ks])

    return {
        "patch_embed": {"kernel": common.dense_init(keys[0], cfg.patch_dim, E, dtype)},
        "ln_pre": jnp.ones((E,), dtype),
        "layers": {
            "attention_norm": jnp.ones((L, E), dtype),
            "ffn_norm": jnp.ones((L, E), dtype),
            "attn": {
                "q": {"kernel": stack(keys[1], E, E)},
                "k": {"kernel": stack(keys[2], E, E)},
                "v": {"kernel": stack(keys[3], E, E)},
                "o": {"kernel": stack(keys[4], E, E)},
            },
            "mlp": {
                "gate": {"kernel": stack(keys[5], E, I)},
                "up": {"kernel": stack(keys[6], E, I)},
                "down": {"kernel": stack(keys[7], I, E)},
            },
        },
    }


def tower_logical_axes(cfg: PixtralVisionConfig) -> dict:
    return {
        "patch_embed": {"kernel": ("patch", "embed")},
        "ln_pre": ("norm",),
        "layers": {
            "attention_norm": (None, "norm"),
            "ffn_norm": (None, "norm"),
            "attn": {
                "q": {"kernel": (None, "embed", "heads")},
                "k": {"kernel": (None, "embed", "heads")},
                "v": {"kernel": (None, "embed", "heads")},
                "o": {"kernel": (None, "heads", "embed")},
            },
            "mlp": {
                "gate": {"kernel": (None, "embed", "mlp")},
                "up": {"kernel": (None, "embed", "mlp")},
                "down": {"kernel": (None, "mlp", "embed")},
            },
        },
    }


def convert_tower_hf(state, cfg: PixtralVisionConfig,
                     prefix: str = "vision_tower.",
                     dtype=jnp.float32) -> dict:
    L = cfg.num_hidden_layers
    lt = prefix + "transformer.layers.{i}."
    pe = np.asarray(state[prefix + "patch_conv.weight"])
    # conv [E, C, ps, ps] stride=kernel no bias == dense over channel-first
    # [C*ps*ps] patches
    patch_kernel = jnp.asarray(pe.reshape(pe.shape[0], -1).T, dtype)
    return {
        "patch_embed": {"kernel": patch_kernel},
        "ln_pre": _get(state, prefix + "ln_pre.weight", dtype=dtype),
        "layers": {
            "attention_norm": _stack_layers(
                state, lt + "attention_norm.weight", L, dtype=dtype),
            "ffn_norm": _stack_layers(
                state, lt + "ffn_norm.weight", L, dtype=dtype),
            "attn": {
                "q": {"kernel": _stack_layers(state, lt + "attention.q_proj.weight", L, True, dtype)},
                "k": {"kernel": _stack_layers(state, lt + "attention.k_proj.weight", L, True, dtype)},
                "v": {"kernel": _stack_layers(state, lt + "attention.v_proj.weight", L, True, dtype)},
                "o": {"kernel": _stack_layers(state, lt + "attention.o_proj.weight", L, True, dtype)},
            },
            "mlp": {
                "gate": {"kernel": _stack_layers(state, lt + "feed_forward.gate_proj.weight", L, True, dtype)},
                "up": {"kernel": _stack_layers(state, lt + "feed_forward.up_proj.weight", L, True, dtype)},
                "down": {"kernel": _stack_layers(state, lt + "feed_forward.down_proj.weight", L, True, dtype)},
            },
        },
    }


def tower_apply(
    params: dict,
    cfg: PixtralVisionConfig,
    patch_stream: jax.Array,       # [N, patch_dim] packed patches (0 = pad)
    patch_pos_ids: jax.Array,      # [N] h * max_side + w meshgrid ids
    patch_segments: jax.Array,     # [N] per-image segment ids (0 = pad)
    precision: Precision = DEFAULT_PRECISION,
    remat: bool = False,
) -> jax.Array:
    """Packed patch stream -> features [N, hidden] (last layer, no final
    norm -- PixtralTransformer has none)."""
    N = patch_stream.shape[0]
    H, D = cfg.num_attention_heads, cfg.head_dim
    h = dense(patch_stream.astype(precision.compute_dtype),
              params["patch_embed"]["kernel"])[None]         # [1, N, E]
    h = rms_norm(h, params["ln_pre"], _NORM_EPS)

    half = jnp.take(jnp.asarray(rope_half_table(cfg)), patch_pos_ids, axis=0)
    emb = jnp.concatenate([half, half], axis=-1)[None]        # [1, N, D]
    cos, sin = jnp.cos(emb), jnp.sin(emb)

    # block-diagonal over images, padding (segment 0) excluded
    seg = patch_segments[None]
    mask = common.make_attention_mask(seg, seg, None, None, causal=False)

    from jax.ad_checkpoint import checkpoint_name

    def block(h, layer):
        x = rms_norm(h, layer["attention_norm"], _NORM_EPS)
        a = layer["attn"]
        q = checkpoint_name(dense(x, a["q"]["kernel"]), "act_qkv")
        k = checkpoint_name(dense(x, a["k"]["kernel"]), "act_qkv")
        v = checkpoint_name(dense(x, a["v"]["kernel"]), "act_qkv")
        q = q.reshape(1, N, H, D)
        k = k.reshape(1, N, H, D)
        v = v.reshape(1, N, H, D)
        q, k = apply_rope(q, k, cos, sin)
        attn = common.xla_attention(q, k, v, mask)
        attn = checkpoint_name(attn.reshape(1, N, H * D), "act_attn")
        h = h + dense(attn, a["o"]["kernel"])
        x = rms_norm(h, layer["ffn_norm"], _NORM_EPS)
        gate = checkpoint_name(dense(x, layer["mlp"]["gate"]["kernel"]),
                               "act_fc1")
        up = dense(x, layer["mlp"]["up"]["kernel"])
        h = h + dense(jax.nn.silu(gate) * up, layer["mlp"]["down"]["kernel"])
        return h, None

    if remat == "save_acts":
        policy = jax.checkpoint_policies.save_only_these_names(
            "act_qkv", "act_attn", "act_fc1")
        body = jax.checkpoint(block, policy=policy)
    else:
        body = jax.checkpoint(block) if remat else block
    h, _ = jax.lax.scan(body, h, params["layers"])
    return h[0]


# ---------------------------------------------------------------------------
# full model
# ---------------------------------------------------------------------------


def init_params(key, cfg: PixtralConfig, dtype=jnp.float32) -> dict:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    hid = cfg.text.hidden_size
    E = cfg.vision.hidden_size
    return {
        "text": qwen2.init_params(k1, cfg.text, dtype),
        "vision": init_tower_params(k2, cfg.vision, dtype),
        "projector": {
            "fc1": {"kernel": common.dense_init(k3, E, hid, dtype),
                    "bias": jnp.zeros((hid,), dtype)},
            "fc2": {"kernel": common.dense_init(k4, hid, hid, dtype),
                    "bias": jnp.zeros((hid,), dtype)},
        },
    }


def logical_axes(cfg: PixtralConfig) -> dict:
    return {
        "text": qwen2.logical_axes(cfg.text),
        "vision": tower_logical_axes(cfg.vision),
        "projector": {
            "fc1": {"kernel": ("embed", "mlp"), "bias": ("mlp",)},
            "fc2": {"kernel": ("mlp", "embed"), "bias": ("norm",)},
        },
    }


def convert_hf(state, cfg: PixtralConfig, dtype=jnp.float32) -> dict:
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
        "vision": convert_tower_hf(state, cfg.vision, prefix=vt_prefix,
                                   dtype=dtype),
        "projector": {
            "fc1": {"kernel": _get(state, proj_prefix + "linear_1.weight", True, dtype),
                    "bias": _get(state, proj_prefix + "linear_1.bias", dtype=dtype)},
            "fc2": {"kernel": _get(state, proj_prefix + "linear_2.weight", True, dtype),
                    "bias": _get(state, proj_prefix + "linear_2.bias", dtype=dtype)},
        },
    }


def compute_embeds(params, cfg: PixtralConfig, input_ids, *,
                   patch_stream=None, patch_pos_ids=None,
                   patch_segments=None, scatter_rows=None, scatter_cols=None,
                   precision=DEFAULT_PRECISION, remat=False,
                   tower_remat=None):
    """Token embeddings with projected tower features scattered onto the
    [IMG] token positions ([IMG_BREAK]/[IMG_END] stay text tokens)."""
    tower_rm = remat if tower_remat is None else tower_remat
    embeds = common.embed_lookup(
        params["text"]["embed"]["weight"], input_ids
    ).astype(precision.compute_dtype)
    if patch_stream is not None:
        feats = tower_apply(params["vision"], cfg.vision, patch_stream,
                            patch_pos_ids, patch_segments,
                            precision=precision, remat=tower_rm)
        p = params["projector"]
        feats = dense(feats, p["fc1"]["kernel"], p["fc1"]["bias"])
        feats = jax.nn.gelu(feats, approximate=False)
        feats = dense(feats, p["fc2"]["kernel"], p["fc2"]["bias"])
        embeds = merge_image_features(embeds, feats, scatter_rows,
                                      scatter_cols)
    return embeds


def apply(
    params: dict,
    cfg: PixtralConfig,
    input_ids: jax.Array,
    position_ids: jax.Array,
    *,
    patch_stream: jax.Array | None = None,   # [N, patch_dim]
    patch_pos_ids: jax.Array | None = None,  # [N]
    patch_segments: jax.Array | None = None, # [N]
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
        params, cfg, input_ids, patch_stream=patch_stream,
        patch_pos_ids=patch_pos_ids, patch_segments=patch_segments,
        scatter_rows=scatter_rows, scatter_cols=scatter_cols,
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


def logits(params, cfg: PixtralConfig, hidden, precision=DEFAULT_PRECISION):
    return qwen2.logits(params["text"], cfg.text, hidden, precision)
