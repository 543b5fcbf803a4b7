"""Mixture-of-Depths (MoD) for the qwen2 decoder family.

The reference's mixture-of-depths support is a thin wrapper over the
external `MoD` package (llamafactory/model/model_utils/mod.py:26-42,
convert_pretrained_model_to_mod -> MoD.apply_mod_to_hf).  This is a
first-party TPU-native implementation of the same idea (arXiv
2404.02258): each layer routes only the top-``capacity`` fraction of
tokens through the block; the rest ride the residual stream untouched.

TPU design: the routing is a STATIC top-k -- k = capacity * T is a
trace-time constant, the selected tokens are gathered into a dense
[B, k, hid] block (sorted indices preserve causal order; causality here
is by sequence order, core architecture note), the ordinary dense layer
runs on it, and the scaled delta scatters back.  No ragged shapes, no
data-dependent control flow; per-layer FLOPs drop by ~capacity for
attention^2 and capacity for the MLP.

The block output is scaled by sigmoid(router score) so the router sits
on the gradient path (the paper's r_i * f(x_i) with a bounded
multiplier); converting a pretrained checkpoint starts every block at
half strength (zero-init router).  Training-oriented, like the
reference: the decode path should use the dense model.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from iadr1_tpu.core.precision import DEFAULT_PRECISION, Precision
from iadr1_tpu.models import common
from iadr1_tpu.models.common import make_attention_mask, rms_norm, xla_attention
from iadr1_tpu.models.qwen2 import (
    Qwen2Config,
    _layer,
    rope_cos_sin,
)


def convert_to_mod(key, params: dict, cfg: Qwen2Config) -> dict:
    """Add zero-initialized per-layer routers (the apply_mod_to_hf
    analogue; zero init keeps the converted model close to the base --
    every block starts at the sigmoid(0) = 1/2 multiplier)."""
    out = dict(params)
    layers = dict(params["layers"])
    layers["mod_router"] = {
        "kernel": jnp.zeros(
            (cfg.num_hidden_layers, cfg.hidden_size, 1), jnp.float32
        )
    }
    out["layers"] = layers
    return out


def _mod_layer(cfg, h, layer_params, cos, sin, segment_ids, attention_fn,
               capacity: float):
    B, T, _ = h.shape
    k = max(int(T * capacity), 1)

    scores = jnp.einsum(
        "bth,ho->bto", h.astype(jnp.float32),
        layer_params["mod_router"]["kernel"],
    )[..., 0]                                               # [B, T]
    scores = jnp.where(segment_ids > 0, scores, -jnp.inf)   # padding skips
    _, top_idx = jax.lax.top_k(scores, k)
    top_idx = jnp.sort(top_idx, axis=1)   # causal order preserved

    def gather(x):
        idx = top_idx.reshape(top_idx.shape + (1,) * (x.ndim - 2))
        return jnp.take_along_axis(
            x, jnp.broadcast_to(idx, top_idx.shape + x.shape[2:]), axis=1
        )

    h_sel = gather(h)
    segs_sel = jnp.take_along_axis(segment_ids, top_idx, axis=1)
    cos_sel, sin_sel = gather(cos), gather(sin)
    r = jnp.take_along_axis(scores, top_idx, axis=1)[..., None]

    mask = make_attention_mask(segs_sel, segs_sel, top_idx, top_idx,
                               causal=True)
    if attention_fn is None:
        attn = lambda q, kk, vv: xla_attention(q, kk, vv, mask)
    else:
        attn = functools.partial(attention_fn, mask=mask,
                                 q_segments=segs_sel, kv_segments=segs_sel,
                                 causal=True)

    out_sel, _, _ = _layer(cfg, h_sel, layer_params, cos_sel, sin_sel,
                           None, None, attn)
    mult = jax.nn.sigmoid(r).astype(h.dtype)
    # -inf scores (padding) selected only when a row has < k real tokens;
    # their sigmoid is 0, so the scatter is a no-op there
    mult = jnp.where(jnp.isfinite(r), mult, 0.0).astype(h.dtype)
    delta = (out_sel - h_sel) * mult
    return h.at[jnp.arange(B)[:, None], top_idx].add(delta)


def apply_mod(
    params: dict,
    cfg: Qwen2Config,
    input_ids: jax.Array,
    *,
    position_ids: jax.Array,
    segment_ids: jax.Array | None = None,
    capacity: float = 0.125,
    precision: Precision = DEFAULT_PRECISION,
    attention_fn=None,
    remat: bool = True,
) -> jax.Array:
    """MoD forward over the full stack; returns hidden states [B, T, hid].

    ``params`` must carry the routers (convert_to_mod).  Full-sequence
    training/scoring only (no KV cache): like the reference, MoD is a
    training-efficiency conversion, not a serving path.
    """
    h = common.embed_lookup(params["embed"]["weight"], input_ids)
    h = h.astype(precision.compute_dtype)
    B, T, _ = h.shape
    if segment_ids is None:
        segment_ids = jnp.ones((B, T), jnp.int32)
    cos, sin = rope_cos_sin(position_ids, cfg.head_dim_, cfg.rope_theta,
                            scaling=cfg.rope_scaling)

    def body(carry, layer_params):
        out = _mod_layer(cfg, carry, layer_params, cos, sin, segment_ids,
                         attention_fn, capacity)
        return out, None

    body_fn = jax.checkpoint(body) if remat else body
    h, _ = jax.lax.scan(body_fn, h, params["layers"])
    return rms_norm(h, params["final_norm"], cfg.rms_norm_eps)
