"""Qwen2 decoder: the language model behind Qwen2-VL, Qwen2.5-VL and
LLaVA-OneVision (which pairs a SigLIP tower with a Qwen2 LLM).

Functional, scan-over-layers, KV-cache-ready.  Weight semantics match HF
``Qwen2ForCausalLM`` / the text model inside ``Qwen2VLForConditionalGeneration``
(the reference loads these via AutoModelForVision2Seq,
train/stage_sft/llamafactory/model/loader.py:186-189); parity is enforced by
tests against the HF implementation on random tiny configs.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable


import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from iadr1_tpu.core.precision import Precision, DEFAULT_PRECISION
from iadr1_tpu.models import common
from iadr1_tpu.models.common import (
    apply_rope,
    dense,
    make_attention_mask,
    mrope_cos_sin,
    rms_norm,
    rope_cos_sin,
    swiglu,
    xla_attention,
)


@dataclasses.dataclass(frozen=True)
class RopeScaling:
    """Context-extension RoPE scaling (reference: model_utils/rope.py
    configure_rope -> HF rope_scaling dict; types linear/dynamic/llama3)."""
    type: str = "linear"
    factor: float = 1.0
    original_max_position_embeddings: int = 32768
    low_freq_factor: float = 1.0      # llama3 only
    high_freq_factor: float = 4.0     # llama3 only


@dataclasses.dataclass(frozen=True)
class Qwen2Config:
    vocab_size: int = 151936
    hidden_size: int = 1536
    intermediate_size: int = 8960
    num_hidden_layers: int = 28
    num_attention_heads: int = 12
    num_key_value_heads: int = 2
    head_dim: int | None = None
    rms_norm_eps: float = 1e-6
    rope_theta: float = 1000000.0
    max_position_embeddings: int = 32768
    tie_word_embeddings: bool = False
    attention_bias: bool = True          # qwen2 uses qkv biases
    mrope_section: tuple[int, ...] | None = None  # set for Qwen2-VL text model
    rope_scaling: RopeScaling | None = None       # context extension
    # Gemma-family knobs (PaliGemma's decoder, modeling_gemma.py): norms
    # apply (offset + w) with zero-init weights, the MLP gate activation is
    # gelu_pytorch_tanh, and token embeddings are scaled by sqrt(hidden).
    rms_norm_offset: float = 0.0
    hidden_act: str = "silu"
    scale_embeds: bool = False

    @property
    def head_dim_(self) -> int:
        return self.head_dim or self.hidden_size // self.num_attention_heads


# ---------------------------------------------------------------------------
# parameters
# ---------------------------------------------------------------------------


def init_params(key: jax.Array, cfg: Qwen2Config, dtype=jnp.float32) -> dict:
    """Random init with HF-compatible structure; layers stacked on axis 0."""
    keys = jax.random.split(key, 8)
    L = cfg.num_hidden_layers
    H, D = cfg.num_attention_heads, cfg.head_dim_
    Hkv = cfg.num_key_value_heads
    hid, mlp = cfg.hidden_size, cfg.intermediate_size

    def stack_dense(k, i, o):
        ks = jax.random.split(k, L)
        return jnp.stack([common.dense_init(kk, i, o, dtype) for kk in ks])

    # Gemma norms carry a +offset, so their weights init at zero
    norm_fill = 0.0 if cfg.rms_norm_offset else 1.0
    params = {
        "embed": {"weight": common.embed_init(keys[0], cfg.vocab_size, hid, dtype)},
        "layers": {
            "input_norm": jnp.full((L, hid), norm_fill, dtype),
            "post_attn_norm": jnp.full((L, hid), norm_fill, dtype),
            "attn": {
                "q": {"kernel": stack_dense(keys[1], hid, H * D)},
                "k": {"kernel": stack_dense(keys[2], hid, Hkv * D)},
                "v": {"kernel": stack_dense(keys[3], hid, Hkv * D)},
                "o": {"kernel": stack_dense(keys[4], H * D, hid)},
            },
            "mlp": {
                "gate": {"kernel": stack_dense(keys[5], hid, mlp)},
                "up": {"kernel": stack_dense(keys[6], hid, mlp)},
                "down": {"kernel": stack_dense(keys[7], mlp, hid)},
            },
        },
        "final_norm": jnp.full((hid,), norm_fill, dtype),
    }
    if cfg.attention_bias:
        params["layers"]["attn"]["q"]["bias"] = jnp.zeros((L, H * D), dtype)
        params["layers"]["attn"]["k"]["bias"] = jnp.zeros((L, Hkv * D), dtype)
        params["layers"]["attn"]["v"]["bias"] = jnp.zeros((L, Hkv * D), dtype)
    if not cfg.tie_word_embeddings:
        params["lm_head"] = {
            "kernel": common.dense_init(keys[0], hid, cfg.vocab_size, dtype)
        }
    return params


def logical_axes(cfg: Qwen2Config) -> dict:
    """Pytree of logical-axis tuples parallel to init_params output.

    Stacked layer leaves carry a leading None (layer axis is never sharded).
    """
    axes = {
        "embed": {"weight": ("vocab", "embed")},
        "layers": {
            "input_norm": (None, "norm"),
            "post_attn_norm": (None, "norm"),
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
        "final_norm": ("norm",),
    }
    if cfg.attention_bias:
        axes["layers"]["attn"]["q"]["bias"] = (None, "heads")
        axes["layers"]["attn"]["k"]["bias"] = (None, "heads")
        axes["layers"]["attn"]["v"]["bias"] = (None, "heads")
    if not cfg.tie_word_embeddings:
        axes["lm_head"] = {"kernel": ("embed", "vocab")}
    return axes


# ---------------------------------------------------------------------------
# KV cache
# ---------------------------------------------------------------------------


def init_cache(cfg: Qwen2Config, batch: int, max_len: int, dtype=jnp.bfloat16) -> dict:
    """Static-shape KV cache for autoregressive decoding.

    Layout [L, B, Hkv, S, D]: the sequence axis is second-to-last so the
    ragged decode kernel reads contiguous (block, head_dim) tiles straight
    from HBM.  ``segment_ids`` describe every cache slot so attention
    masking is uniform between prefill and decode; ``write_idx`` is the next
    slot to fill (shared across the batch -- prompts are left-padded, mirroring
    the reference trainer's left padding, sc_grpo_trainer.py:184-227).
    """
    L = cfg.num_hidden_layers
    Hkv, D = cfg.num_key_value_heads, cfg.head_dim_
    return {
        "k": jnp.zeros((L, batch, Hkv, max_len, D), dtype),
        "v": jnp.zeros((L, batch, Hkv, max_len, D), dtype),
        "segment_ids": jnp.zeros((batch, max_len), jnp.int32),
        "write_idx": jnp.zeros((), jnp.int32),
    }


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _lora_dense(x, kernel, bias, ab, scale):
    """dense() plus a factored LoRA delta: y += scale * (x @ A) @ B.

    Never materializes the merged [in, out] weight -- backward cotangents
    stay activation-shaped (merging materializes weight-shaped d_merged
    tensors, ~1 GB each at 7B MLP shapes; measured HBM OOM).

    DoRA (``ab["m"]`` present; reference adapter.py use_dora): the output
    is rescaled column-wise by m / ||W + scale*A@B||_col.  The column
    norms are computed FACTORED -- ||W_j||^2 + 2s*(K^T A B)_jj +
    s^2*(B^T A^T A B)_jj via an [out, r] and an [r, r] contraction --
    so DoRA costs O(in*out*r) extra FLOPs and never materializes the
    merged weight either.  The norm is detached (peft's
    weight_norm.detach()); gradients reach m and the A/B factors through
    the numerator only.
    """
    y = dense(x, kernel, None)
    if ab is not None:
        xa = jnp.einsum("...i,ir->...r", x, ab["a"].astype(x.dtype))
        y = y + scale * jnp.einsum("...r,ro->...o", xa, ab["b"].astype(x.dtype))
        if "m" in ab:
            if isinstance(kernel, dict):  # DoRA over a quantized base
                from iadr1_tpu.models.quant import dequantize_kernel

                kernel = dequantize_kernel(kernel)
            k32 = kernel.astype(jnp.float32)
            a32 = ab["a"].astype(jnp.float32)
            b32 = ab["b"].astype(jnp.float32)
            wnorm2 = jnp.sum(k32 * k32, axis=0)                   # [out]
            kta = jnp.einsum("io,ir->or", k32, a32)               # [out, r]
            cross = jnp.einsum("or,ro->o", kta, b32)              # [out]
            gram = a32.T @ a32                                    # [r, r]
            bb = jnp.einsum("ro,rs,so->o", b32, gram, b32)        # [out]
            norm = jnp.sqrt(
                wnorm2 + 2.0 * scale * cross + scale * scale * bb + 1e-12
            )
            y = y * (
                ab["m"].astype(jnp.float32)
                / jax.lax.stop_gradient(norm)
            ).astype(y.dtype)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


_ACTIVATIONS = {
    "silu": jax.nn.silu,
    # HF ACT2FN["gelu_pytorch_tanh"] (Gemma MLPs)
    "gelu_pytorch_tanh": lambda x: jax.nn.gelu(x, approximate=True),
    "gelu_tanh": lambda x: jax.nn.gelu(x, approximate=True),
    "gelu": lambda x: jax.nn.gelu(x, approximate=False),
}


def mlp_activation(cfg):
    name = getattr(cfg, "hidden_act", "silu")
    try:
        return _ACTIVATIONS[name]
    except KeyError:
        raise ValueError(f"unsupported hidden_act {name!r}") from None


def _attn_block(
    cfg: Qwen2Config,
    h: jax.Array,
    layer_params: dict,
    cos: jax.Array,
    sin: jax.Array,
    cache_kv: tuple[jax.Array, jax.Array] | None,
    write_idx: jax.Array | None,
    attention_fn: Callable,
    attend_fresh: bool = False,
    layer_lora: dict | None = None,
    lora_scale: float = 1.0,
):
    """Pre-norm attention sub-block + residual; shared by the dense and
    MoE decoder layers.  Returns (h, new_cache_kv, la) where ``la`` is the
    layer-LoRA path accessor for the caller's MLP half."""
    B, T, _ = h.shape
    H, Hkv, D = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim_
    attn_p = layer_params["attn"]

    def la(*path):
        node = layer_lora
        for p in path:
            if node is None:
                return None
            node = node.get(p)
        return node

    x = rms_norm(h, layer_params["input_norm"], cfg.rms_norm_eps,
                 getattr(cfg, "rms_norm_offset", 0.0))
    # Named for the remat policies (models/attention.py remat_policy):
    # saving the flat projections (last dim H*D / Hkv*D, lane-exact --
    # the post-rope [B,T,H,64] layout would pad 64->128 lanes in HBM)
    # lets the rematerialized backward DCE the q/k/v matmuls and rebuild
    # the roped heads with elementwise work only.
    name = checkpoint_name
    q = name(_lora_dense(x, attn_p["q"]["kernel"], attn_p["q"].get("bias"),
                         la("attn", "q", "kernel"), lora_scale), "act_qkv")
    k = name(_lora_dense(x, attn_p["k"]["kernel"], attn_p["k"].get("bias"),
                         la("attn", "k", "kernel"), lora_scale), "act_qkv")
    v = name(_lora_dense(x, attn_p["v"]["kernel"], attn_p["v"].get("bias"),
                         la("attn", "v", "kernel"), lora_scale), "act_qkv")
    q = q.reshape(B, T, H, D)
    k = k.reshape(B, T, Hkv, D)
    v = v.reshape(B, T, Hkv, D)
    q, k = apply_rope(q, k, cos, sin)

    new_cache_kv = None
    if cache_kv is not None:
        ck, cv = cache_kv                       # [B, Hkv, S, D]
        ck = jax.lax.dynamic_update_slice_in_dim(
            ck, k.transpose(0, 2, 1, 3).astype(ck.dtype), write_idx, axis=2
        )
        cv = jax.lax.dynamic_update_slice_in_dim(
            cv, v.transpose(0, 2, 1, 3).astype(cv.dtype), write_idx, axis=2
        )
        new_cache_kv = (ck, cv)
        if not attend_fresh:
            # cached paths receive cache-layout [B, Hkv, S, D] arrays; the
            # attn closure (decode kernel / dense fallback) handles layout
            k, v = ck, cv

    attn_out = attention_fn(q, k, v)
    attn_out = _lora_dense(attn_out.reshape(B, T, H * D),
                           attn_p["o"]["kernel"], None,
                           la("attn", "o", "kernel"), lora_scale)
    return h + attn_out, new_cache_kv, la


def _layer(
    cfg: Qwen2Config,
    h: jax.Array,
    layer_params: dict,
    cos: jax.Array,
    sin: jax.Array,
    cache_kv: tuple[jax.Array, jax.Array] | None,
    write_idx: jax.Array | None,
    attention_fn: Callable,
    attend_fresh: bool = False,
    layer_lora: dict | None = None,
    lora_scale: float = 1.0,
):
    h, new_cache_kv, la = _attn_block(
        cfg, h, layer_params, cos, sin, cache_kv, write_idx, attention_fn,
        attend_fresh=attend_fresh, layer_lora=layer_lora,
        lora_scale=lora_scale,
    )
    x = rms_norm(h, layer_params["post_attn_norm"], cfg.rms_norm_eps,
                 getattr(cfg, "rms_norm_offset", 0.0))
    mlp_p = layer_params["mlp"]
    gate = _lora_dense(x, mlp_p["gate"]["kernel"], None,
                       la("mlp", "gate", "kernel"), lora_scale)
    up = _lora_dense(x, mlp_p["up"]["kernel"], None,
                     la("mlp", "up", "kernel"), lora_scale)
    down_in = mlp_activation(cfg)(gate) * up
    h = h + _lora_dense(down_in, mlp_p["down"]["kernel"], None,
                        la("mlp", "down", "kernel"), lora_scale)
    return h, new_cache_kv, jnp.zeros((), jnp.float32)


def _or_bidirectional(mask, q_segment_ids, kv_segment_ids, kv_bidir):
    """Unmask [q, kv] pairs whose KV slot carries a prefix-LM flag (same
    segment, non-padding) on top of an existing [B,1,T,S] causal mask."""
    seg = (q_segment_ids[:, :, None] == kv_segment_ids[:, None, :]) & (
        kv_segment_ids[:, None, :] != 0
    )
    return mask | (seg[:, None, :, :] & (kv_bidir[:, None, None, :] != 0))


def apply(
    params: dict,
    cfg: Qwen2Config,
    input_ids: jax.Array | None = None,
    *,
    inputs_embeds: jax.Array | None = None,
    position_ids: jax.Array,
    segment_ids: jax.Array | None = None,
    bidirectional_mask: jax.Array | None = None,
    cache: dict | None = None,
    cache_mode: str = "extend",
    precision: Precision = DEFAULT_PRECISION,
    attention_fn: Callable | None = None,
    decode_attention_fn: Callable | None = None,
    remat: bool = False,
    lora: dict | None = None,
    lora_scale: float = 1.0,
    layer_fn: Callable | None = None,
    return_aux: bool = False,
) -> tuple[jax.Array, dict | None]:
    """Run the decoder stack; returns (hidden_states [B,T,hid], new_cache)
    -- or (hidden, new_cache, aux_loss) with ``return_aux`` (MoE routers).

    ``layer_fn`` swaps the decoder layer (default the dense _layer; the
    MoE family passes its sparse layer) -- same signature, returning
    (h, new_cache_kv, aux_loss_scalar).

    ``position_ids``: [B, T] for plain RoPE or [3, B, T] when
    ``cfg.mrope_section`` is set (M-RoPE).  ``inputs_embeds`` overrides token
    embedding lookup (used by the VLM wrappers to splice in image features).
    ``segment_ids``: [B, T] packing segments (0 = padding).

    ``bidirectional_mask``: [B, T] bool/int prefix-LM flags for the fresh
    block -- every query may additionally attend flagged KV positions even
    when they lie ahead of it (HF PaliGemma _update_causal_mask unmasks
    token_type_ids==0 columns).  Applied on the no-cache, prefill and
    extend paths; flagged attention always runs the dense XLA path (the
    flash kernel's block structure assumes causal).  Single-token decode
    ignores it (a new suffix token attends the whole valid cache prefix
    causally, which is already exact).

    ``cache_mode`` selects the cached-attention strategy:
    * "prefill" -- the cache is empty (write_idx 0): attend within the new
      block only via the fused flash kernel (or a [T, T] mask) and write
      K/V into the cache.
    * "decode"  -- single-token step: the ragged Pallas decode kernel reads
      only the valid cache prefix (``decode_attention_fn``); falls back to
      the dense path when no kernel is given.
    * "extend"  -- general/oracle path: dense masked attention over the
      whole static cache (correct for any write_idx/T).
    """
    if inputs_embeds is None:
        inputs_embeds = common.embed_lookup(params["embed"]["weight"], input_ids)
    h = inputs_embeds.astype(precision.compute_dtype)
    if getattr(cfg, "scale_embeds", False):
        # Gemma scales token embeddings by sqrt(hidden) INSIDE the decoder
        # (GemmaModel normalizer) -- i.e. after any VLM feature merge,
        # matching HF PaliGemma where image features are pre-divided by
        # the same factor.
        h = h * jnp.asarray(cfg.hidden_size ** 0.5, h.dtype)
    B, T, _ = h.shape

    if cfg.mrope_section is not None:
        if position_ids.ndim == 2:  # text-only: broadcast to all 3 axes
            position_ids = jnp.broadcast_to(position_ids, (3, B, T))
        cos, sin = mrope_cos_sin(
            position_ids, cfg.head_dim_, cfg.rope_theta, cfg.mrope_section
        )
    else:
        cos, sin = rope_cos_sin(
            position_ids, cfg.head_dim_, cfg.rope_theta,
            scaling=cfg.rope_scaling,
        )

    if segment_ids is None:
        segment_ids = jnp.ones((B, T), jnp.int32)

    # Causality is by sequence/cache-slot order (HF cache_position
    # semantics), NOT by RoPE position value -- M-RoPE assigns equal temporal
    # positions to all patches of an image, and packed segments restart
    # position values.
    attend_fresh = False
    if cache is not None:
        write_idx = cache["write_idx"]
        kv_segments = jax.lax.dynamic_update_slice_in_dim(
            cache["segment_ids"], segment_ids, write_idx, axis=1
        )
        if cache_mode == "prefill":
            # empty cache: attention is over the fresh K/V block only
            attend_fresh = True
            q_index = jnp.broadcast_to(jnp.arange(T), (B, T))
            mask = make_attention_mask(
                segment_ids, segment_ids, q_index, q_index, causal=True
            )
            if bidirectional_mask is not None:
                mask = _or_bidirectional(
                    mask, segment_ids, segment_ids, bidirectional_mask
                )
                attn = lambda q, k, v: xla_attention(q, k, v, mask)
            elif attention_fn is not None:
                attn = functools.partial(
                    attention_fn, mask=mask, q_segments=segment_ids,
                    kv_segments=segment_ids, causal=True,
                )
            else:
                attn = lambda q, k, v: xla_attention(q, k, v, mask)
        elif cache_mode == "decode" and decode_attention_fn is not None:
            length = write_idx + T
            attn = lambda q, ck, cv: decode_attention_fn(
                q, ck, cv, kv_segments, length
            )
        else:  # "extend" / fallback: dense mask over the whole static cache
            q_index = jnp.broadcast_to(write_idx + jnp.arange(T), (B, T))
            kv_index = jnp.broadcast_to(
                jnp.arange(kv_segments.shape[1]), kv_segments.shape
            )
            mask = make_attention_mask(
                segment_ids, kv_segments, q_index, kv_index, causal=True
            )
            if bidirectional_mask is not None:
                kv_bidir = jax.lax.dynamic_update_slice_in_dim(
                    jnp.zeros(kv_segments.shape, jnp.int32),
                    bidirectional_mask.astype(jnp.int32), write_idx, axis=1,
                )
                mask = _or_bidirectional(mask, segment_ids, kv_segments,
                                         kv_bidir)
            attn = lambda q, ck, cv: xla_attention(
                q,
                ck.transpose(0, 2, 1, 3).astype(q.dtype),
                cv.transpose(0, 2, 1, 3).astype(q.dtype),
                mask,
            )
    else:
        write_idx = None
        q_index = jnp.broadcast_to(jnp.arange(T), (B, T))
        mask = make_attention_mask(
            segment_ids, segment_ids, q_index, q_index, causal=True
        )
        if bidirectional_mask is not None:
            mask = _or_bidirectional(
                mask, segment_ids, segment_ids, bidirectional_mask
            )
            attn = lambda q, k, v: xla_attention(q, k, v, mask)
        elif attention_fn is None:
            attn = lambda q, k, v: xla_attention(q, k, v, mask)
        else:
            attn = functools.partial(
                attention_fn,
                mask=mask,
                q_segments=segment_ids,
                kv_segments=segment_ids,
                causal=True,
            )

    body_layer = layer_fn if layer_fn is not None else _layer

    def scan_body(carry, xs):
        h, aux_total = carry
        layer_params, layer_lora, layer_cache = xs
        cache_kv = (
            (layer_cache["k"], layer_cache["v"]) if layer_cache is not None else None
        )
        h, new_kv, aux = body_layer(
            cfg, h, layer_params, cos, sin, cache_kv, write_idx, attn,
            attend_fresh=attend_fresh,
            layer_lora=layer_lora, lora_scale=lora_scale,
        )
        ys = {"k": new_kv[0], "v": new_kv[1]} if new_kv is not None else None
        return (h, aux_total + aux), ys

    # Remat modes:
    # * True / "save_flash": (out, lse) are checkpoint_named inside the
    #   flash VJP's fwd rule, so save_only_these_names stores exactly the
    #   backward residuals and the forward kernel is DCE'd from the
    #   rematerialized backward (+~73 MB/layer at [8,14,4096,64]; naming
    #   *outside* the custom_vjp cannot do this -- the fwd rule re-runs to
    #   rebuild the pre-name residuals, measured in round 1 as a no-op).
    #   Under the XLA attention path nothing is named -> plain remat.
    # * "save_qkv": flash residuals + the named flat q/k/v projections --
    #   the backward also skips the three QKV matmul recomputes (the
    #   speed mode when the extra (H+2Hkv)*D/token/layer residual fits).
    # * "full": plain remat, recompute the flash forward too -- the
    #   memory-tight mode (the saved out residual is [L,B,H,T,D] bf16,
    #   5.9 GB at 2B/B=16/T=4608: bigger than the base weights).
    # * False: no remat (inference / small models).
    if remat:
        if remat == "full":
            body = jax.checkpoint(scan_body)
        elif remat == "save_qkv":
            from iadr1_tpu.models.attention import FLASH_QKV_REMAT_POLICY

            body = jax.checkpoint(scan_body, policy=FLASH_QKV_REMAT_POLICY)
        else:
            from iadr1_tpu.models.attention import FLASH_REMAT_POLICY

            body = jax.checkpoint(scan_body, policy=FLASH_REMAT_POLICY)
    else:
        body = scan_body
    layer_cache = (
        {"k": cache["k"], "v": cache["v"]} if cache is not None else None
    )
    # lora: pytree parallel to params["layers"] with {"a","b"} at targeted
    # kernels (adapters.init_lora_params output; None entries are empty
    # pytrees and vanish from scan leaves); factors are scan-stacked like
    # the kernels themselves
    layer_lora = lora.get("layers", lora) if lora is not None else None
    (h, aux_total), new_kv = jax.lax.scan(
        body, (h, jnp.zeros((), jnp.float32)),
        (params["layers"], layer_lora, layer_cache))

    h = rms_norm(h, params["final_norm"], cfg.rms_norm_eps,
                 getattr(cfg, "rms_norm_offset", 0.0))

    new_cache = None
    if cache is not None:
        new_cache = {
            "k": new_kv["k"],
            "v": new_kv["v"],
            "segment_ids": kv_segments,
            "write_idx": write_idx + T,
        }
    if return_aux:
        return h, new_cache, aux_total / max(cfg.num_hidden_layers, 1)
    return h, new_cache


def head_kernel(params: dict, cfg: Qwen2Config) -> jax.Array:
    """[hidden, vocab] LM-head kernel (tied or untied)."""
    if cfg.tie_word_embeddings:
        return params["embed"]["weight"].T
    return params["lm_head"]["kernel"]


def logits(params: dict, cfg: Qwen2Config, hidden: jax.Array,
           precision: Precision = DEFAULT_PRECISION) -> jax.Array:
    """LM head (tied or untied), in ``precision.logits_dtype``."""
    if cfg.tie_word_embeddings:
        kernel = params["embed"]["weight"].T
    else:
        kernel = params["lm_head"]["kernel"]
    out = jnp.einsum(
        "bth,hv->btv", hidden, kernel.astype(hidden.dtype),
        preferred_element_type=precision.logits_dtype,
    )
    return out.astype(precision.logits_dtype)
