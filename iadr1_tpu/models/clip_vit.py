"""CLIP ViT vision encoder: the tower of LLaVA-1.5 / LLaVA-NeXT.

Semantics match HF ``CLIPVisionModel`` (ViT-L/14-336 class): CLS token +
learned position embeddings, pre-layernorm before the encoder, pre-norm
blocks with QuickGELU MLPs.  LLaVA extracts features from an intermediate
layer (vision_feature_layer, typically -2) *without* the post-layernorm and
drops the CLS token (strategy "default") -- expressed here by running only
the first ``num_layers`` of the stacked parameters.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from iadr1_tpu.core.precision import Precision, DEFAULT_PRECISION
from iadr1_tpu.models import common
from iadr1_tpu.models.common import dense
from iadr1_tpu.models.params_io import _get, _stack_layers
from iadr1_tpu.models.qwen2_vl import layer_norm, quick_gelu


@dataclasses.dataclass(frozen=True)
class ClipVisionConfig:
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    image_size: int = 336
    patch_size: int = 14
    layer_norm_eps: float = 1e-5

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


def init_params(key, cfg: ClipVisionConfig, dtype=jnp.float32) -> dict:
    keys = jax.random.split(key, 9)
    L, E, I = cfg.num_hidden_layers, cfg.hidden_size, cfg.intermediate_size

    def stack(k, i, o):
        ks = jax.random.split(k, L)
        return jnp.stack([common.dense_init(kk, i, o, dtype) for kk in ks])

    def norm(n):
        return {"scale": jnp.ones((L, n), dtype), "bias": jnp.zeros((L, n), dtype)}

    return {
        "class_embed": jax.random.normal(keys[8], (E,), dtype),
        "patch_embed": {"kernel": common.dense_init(keys[0], cfg.patch_dim, E, dtype)},
        "pos_embed": common.embed_init(keys[1], cfg.num_patches + 1, E, dtype),
        "pre_norm": {"scale": jnp.ones((E,), dtype), "bias": jnp.zeros((E,), dtype)},
        "layers": {
            "norm1": norm(E),
            "norm2": norm(E),
            "attn": {
                "q": {"kernel": stack(keys[2], E, E), "bias": jnp.zeros((L, E), dtype)},
                "k": {"kernel": stack(keys[3], E, E), "bias": jnp.zeros((L, E), dtype)},
                "v": {"kernel": stack(keys[4], E, E), "bias": jnp.zeros((L, E), dtype)},
                "o": {"kernel": stack(keys[5], E, E), "bias": jnp.zeros((L, E), dtype)},
            },
            "mlp": {
                "fc1": {"kernel": stack(keys[6], E, I), "bias": jnp.zeros((L, I), dtype)},
                "fc2": {"kernel": stack(keys[7], I, E), "bias": jnp.zeros((L, E), dtype)},
            },
        },
        "post_norm": {"scale": jnp.ones((E,), dtype), "bias": jnp.zeros((E,), dtype)},
    }


def logical_axes(cfg: ClipVisionConfig) -> dict:
    def norm():
        return {"scale": (None, "norm"), "bias": (None, "norm")}

    return {
        "class_embed": ("norm",),
        "patch_embed": {"kernel": ("patch", "embed")},
        "pos_embed": (None, "embed"),
        "pre_norm": {"scale": ("norm",), "bias": ("norm",)},
        "layers": {
            "norm1": norm(),
            "norm2": norm(),
            "attn": {
                "q": {"kernel": (None, "embed", "heads"), "bias": (None, "heads")},
                "k": {"kernel": (None, "embed", "heads"), "bias": (None, "heads")},
                "v": {"kernel": (None, "embed", "heads"), "bias": (None, "heads")},
                "o": {"kernel": (None, "heads", "embed"), "bias": (None, "norm")},
            },
            "mlp": {
                "fc1": {"kernel": (None, "embed", "mlp"), "bias": (None, "mlp")},
                "fc2": {"kernel": (None, "mlp", "embed"), "bias": (None, "norm")},
            },
        },
        "post_norm": {"scale": ("norm",), "bias": ("norm",)},
    }


def convert_hf(state, cfg: ClipVisionConfig,
               prefix: str = "vision_tower.vision_model.",
               dtype=jnp.float32) -> dict:
    L = cfg.num_hidden_layers
    lt = prefix + "encoder.layers.{i}."
    pe = np.asarray(state[prefix + "embeddings.patch_embedding.weight"])
    return {
        "class_embed": _get(state, prefix + "embeddings.class_embedding", dtype=dtype),
        "patch_embed": {"kernel": jnp.asarray(pe.reshape(pe.shape[0], -1).T, dtype)},
        "pos_embed": _get(state, prefix + "embeddings.position_embedding.weight", dtype=dtype),
        "pre_norm": {
            "scale": _get(state, prefix + "pre_layrnorm.weight", dtype=dtype),
            "bias": _get(state, prefix + "pre_layrnorm.bias", dtype=dtype),
        },
        "layers": {
            "norm1": {
                "scale": _stack_layers(state, lt + "layer_norm1.weight", L, dtype=dtype),
                "bias": _stack_layers(state, lt + "layer_norm1.bias", L, dtype=dtype),
            },
            "norm2": {
                "scale": _stack_layers(state, lt + "layer_norm2.weight", L, dtype=dtype),
                "bias": _stack_layers(state, lt + "layer_norm2.bias", L, dtype=dtype),
            },
            "attn": {
                "q": {"kernel": _stack_layers(state, lt + "self_attn.q_proj.weight", L, True, dtype),
                      "bias": _stack_layers(state, lt + "self_attn.q_proj.bias", L, dtype=dtype)},
                "k": {"kernel": _stack_layers(state, lt + "self_attn.k_proj.weight", L, True, dtype),
                      "bias": _stack_layers(state, lt + "self_attn.k_proj.bias", L, dtype=dtype)},
                "v": {"kernel": _stack_layers(state, lt + "self_attn.v_proj.weight", L, True, dtype),
                      "bias": _stack_layers(state, lt + "self_attn.v_proj.bias", L, dtype=dtype)},
                "o": {"kernel": _stack_layers(state, lt + "self_attn.out_proj.weight", L, True, dtype),
                      "bias": _stack_layers(state, lt + "self_attn.out_proj.bias", L, dtype=dtype)},
            },
            "mlp": {
                "fc1": {"kernel": _stack_layers(state, lt + "mlp.fc1.weight", L, True, dtype),
                        "bias": _stack_layers(state, lt + "mlp.fc1.bias", L, dtype=dtype)},
                "fc2": {"kernel": _stack_layers(state, lt + "mlp.fc2.weight", L, True, dtype),
                        "bias": _stack_layers(state, lt + "mlp.fc2.bias", L, dtype=dtype)},
            },
        },
        "post_norm": {
            "scale": _get(state, prefix + "post_layernorm.weight", dtype=dtype),
            "bias": _get(state, prefix + "post_layernorm.bias", dtype=dtype),
        },
    }


def apply(
    params: dict,
    cfg: ClipVisionConfig,
    tiles: jax.Array,                  # [N, num_patches, patch_dim]
    precision: Precision = DEFAULT_PRECISION,
    remat: bool = False,
    num_layers: int | None = None,     # run only the first n layers
    keep_cls: bool = False,
) -> jax.Array:
    """Tile batch -> features [N, num_patches(+1 if keep_cls), hidden].

    Output is the selected hidden state (no post-layernorm), matching
    LLaVA's feature extraction; ``num_layers`` implements
    vision_feature_layer (e.g. L-1 for -2).
    """
    N, T, _ = tiles.shape
    H, D = cfg.num_attention_heads, cfg.head_dim
    eps = cfg.layer_norm_eps
    h = dense(tiles.astype(precision.compute_dtype), params["patch_embed"]["kernel"])
    cls = jnp.broadcast_to(
        params["class_embed"].astype(h.dtype)[None, None, :], (N, 1, h.shape[-1])
    )
    h = jnp.concatenate([cls, h], axis=1)
    h = h + params["pos_embed"][None].astype(h.dtype)
    h = layer_norm(h, params["pre_norm"]["scale"], params["pre_norm"]["bias"], eps)
    T1 = T + 1

    from jax.ad_checkpoint import checkpoint_name

    def block(h, layer):
        x = layer_norm(h, layer["norm1"]["scale"], layer["norm1"]["bias"], eps)
        a = layer["attn"]
        # named for remat="save_acts" (see siglip.py: backward replays only
        # the o-projection + norms/gelu; measured winner on the OneVision
        # SigLIP tower, tools/probe_vlm_perf.py)
        q = checkpoint_name(dense(x, a["q"]["kernel"], a["q"]["bias"]),
                            "act_qkv").reshape(N, T1, H, D)
        k = checkpoint_name(dense(x, a["k"]["kernel"], a["k"]["bias"]),
                            "act_qkv").reshape(N, T1, H, D)
        v = checkpoint_name(dense(x, a["v"]["kernel"], a["v"]["bias"]),
                            "act_qkv").reshape(N, T1, H, D)
        attn = common.xla_attention(q, k, v, None)
        attn = checkpoint_name(attn.reshape(N, T1, H * D), "act_attn")
        h = h + dense(attn, a["o"]["kernel"], a["o"]["bias"])
        x = layer_norm(h, layer["norm2"]["scale"], layer["norm2"]["bias"], eps)
        x = checkpoint_name(
            dense(x, layer["mlp"]["fc1"]["kernel"],
                  layer["mlp"]["fc1"]["bias"]), "act_fc1")
        x = quick_gelu(x)
        h = h + dense(x, layer["mlp"]["fc2"]["kernel"], layer["mlp"]["fc2"]["bias"])
        return h, None

    layers = params["layers"]
    if num_layers is not None and num_layers < cfg.num_hidden_layers:
        layers = jax.tree.map(lambda a: a[:num_layers], layers)
    if remat == "save_acts":
        policy = jax.checkpoint_policies.save_only_these_names(
            "act_qkv", "act_attn", "act_fc1")
        body = jax.checkpoint(block, policy=policy)
    else:
        body = jax.checkpoint(block) if remat else block
    h, _ = jax.lax.scan(body, h, layers)
    return h if keep_cls else h[:, 1:]
