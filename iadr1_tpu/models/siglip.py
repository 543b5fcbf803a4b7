"""SigLIP vision encoder (so400m-class): the tower of LLaVA-OneVision.

Semantics match HF ``SiglipVisionModel``: conv patch embedding + learned
position embeddings (no CLS token), pre-norm encoder layers with biased
attention and gelu_pytorch_tanh MLPs, final post-layernorm.  Fixed square
inputs (e.g. 384x384 -> 27x27 = 729 tokens) batched over anyres tiles --
the natural static shape for TPU.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from iadr1_tpu.core.precision import Precision, DEFAULT_PRECISION
from iadr1_tpu.models import common
from iadr1_tpu.models.common import dense
from iadr1_tpu.models.params_io import _get, _stack_layers
from iadr1_tpu.models.qwen2_vl import layer_norm


@dataclasses.dataclass(frozen=True)
class SiglipVisionConfig:
    hidden_size: int = 1152
    intermediate_size: int = 4304
    num_hidden_layers: int = 27
    num_attention_heads: int = 16
    image_size: int = 384
    patch_size: int = 14
    layer_norm_eps: float = 1e-6

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


def init_params(key, cfg: SiglipVisionConfig, dtype=jnp.float32) -> dict:
    keys = jax.random.split(key, 8)
    L, E, I = cfg.num_hidden_layers, cfg.hidden_size, cfg.intermediate_size

    def stack(k, i, o):
        ks = jax.random.split(k, L)
        return jnp.stack([common.dense_init(kk, i, o, dtype) for kk in ks])

    def norm(n):
        return {"scale": jnp.ones((L, n), dtype), "bias": jnp.zeros((L, n), dtype)}

    return {
        "patch_embed": {
            "kernel": common.dense_init(keys[0], cfg.patch_dim, E, dtype),
            "bias": jnp.zeros((E,), dtype),
        },
        "pos_embed": common.embed_init(keys[1], cfg.num_patches, E, dtype),
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


def logical_axes(cfg: SiglipVisionConfig) -> dict:
    def norm():
        return {"scale": (None, "norm"), "bias": (None, "norm")}

    return {
        "patch_embed": {"kernel": ("patch", "embed"), "bias": ("norm",)},
        "pos_embed": (None, "embed"),
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


def convert_hf(state, cfg: SiglipVisionConfig,
               prefix: str = "vision_tower.vision_model.",
               dtype=jnp.float32) -> dict:
    L = cfg.num_hidden_layers
    lt = prefix + "encoder.layers.{i}."
    pe = np.asarray(state[prefix + "embeddings.patch_embedding.weight"])
    # conv [E, C, ps, ps] with stride=kernel == dense over [C*ps*ps] patches
    # laid out channel-first (we patchify to match in preprocess)
    patch_kernel = jnp.asarray(pe.reshape(pe.shape[0], -1).T, dtype)
    return {
        "patch_embed": {
            "kernel": patch_kernel,
            "bias": _get(state, prefix + "embeddings.patch_embedding.bias", dtype=dtype),
        },
        "pos_embed": _get(state, prefix + "embeddings.position_embedding.weight", dtype=dtype),
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


def gelu_tanh(x):
    return jax.nn.gelu(x, approximate=True)


def apply(
    params: dict,
    cfg: SiglipVisionConfig,
    tiles: jax.Array,                   # [N, num_patches, patch_dim]
    precision: Precision = DEFAULT_PRECISION,
    remat: bool = False,
    post_layernorm: bool = True,
    attention_fn=None,                  # (q,k,v, causal=False) time-major
) -> jax.Array:
    """Tile batch -> features [N, num_patches, hidden]."""
    N, T, _ = tiles.shape
    H, D = cfg.num_attention_heads, cfg.head_dim
    eps = cfg.layer_norm_eps
    h = dense(tiles.astype(precision.compute_dtype),
              params["patch_embed"]["kernel"], params["patch_embed"]["bias"])
    h = h + params["pos_embed"][None].astype(h.dtype)

    from jax.ad_checkpoint import checkpoint_name

    def block(h, layer):
        x = layer_norm(h, layer["norm1"]["scale"], layer["norm1"]["bias"], eps)
        a = layer["attn"]
        # Named for the save_acts policy: saving the flat projections, the
        # attention output and the pre-gelu fc1 act lets the rematerialized
        # backward DCE every big matmul except the o-projection (~10% of
        # the fwd FLOPs instead of a full recompute).
        q = checkpoint_name(dense(x, a["q"]["kernel"], a["q"]["bias"]),
                            "act_qkv").reshape(N, T, H, D)
        k = checkpoint_name(dense(x, a["k"]["kernel"], a["k"]["bias"]),
                            "act_qkv").reshape(N, T, H, D)
        v = checkpoint_name(dense(x, a["v"]["kernel"], a["v"]["bias"]),
                            "act_qkv").reshape(N, T, H, D)
        if attention_fn is not None:
            attn = attention_fn(q, k, v, causal=False)
        else:
            attn = common.xla_attention(q, k, v, None)
        attn = checkpoint_name(attn.reshape(N, T, H * D), "act_attn")
        h = h + dense(attn, a["o"]["kernel"], a["o"]["bias"])
        x = layer_norm(h, layer["norm2"]["scale"], layer["norm2"]["bias"], eps)
        x = checkpoint_name(
            dense(x, layer["mlp"]["fc1"]["kernel"],
                  layer["mlp"]["fc1"]["bias"]), "act_fc1")
        x = gelu_tanh(x)
        h = h + dense(x, layer["mlp"]["fc2"]["kernel"], layer["mlp"]["fc2"]["bias"])
        return h, None

    # Remat: with the flash kernel, (out, lse) are checkpoint_named inside
    # its VJP fwd rule, so a save-these-names policy skips the attention
    # recompute in the replayed backward (and the [T,T] probs tensor never
    # exists at all).  The XLA path has nothing named -> plain full remat.
    # remat="full" forces the plain mode for either path.
    # remat="save_acts" additionally saves the named qkv/attn/fc1 acts
    # (~156 MB/layer at 12 tiles bf16): backward replays only the
    # o-projection and the norms/gelu -- the measured winner on v5e
    # (tools/probe_vlm_perf.py, docs/validation_r5.md).
    if remat == "save_acts":
        policy = jax.checkpoint_policies.save_only_these_names(
            "flash_out", "flash_lse", "act_qkv", "act_attn", "act_fc1")
        body = jax.checkpoint(block, policy=policy)
    elif remat and attention_fn is not None and remat != "full":
        from iadr1_tpu.models.attention import FLASH_REMAT_POLICY

        body = jax.checkpoint(block, policy=FLASH_REMAT_POLICY)
    else:
        body = jax.checkpoint(block) if remat else block
    h, _ = jax.lax.scan(body, h, params["layers"])
    if post_layernorm:
        h = layer_norm(h, params["post_norm"]["scale"], params["post_norm"]["bias"], eps)
    return h
