"""Shared functional building blocks: norms, dense layers, RoPE, attention.

All matmuls go through ``jnp.einsum`` with ``preferred_element_type`` so the
MXU accumulates in float32 regardless of bf16 inputs.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# initializers / param helpers
# ---------------------------------------------------------------------------


def dense_init(key, in_dim: int, out_dim: int, dtype=jnp.float32):
    scale = 1.0 / jnp.sqrt(in_dim)
    return jax.random.uniform(
        key, (in_dim, out_dim), dtype, minval=-scale, maxval=scale
    )


def embed_init(key, vocab: int, dim: int, dtype=jnp.float32):
    return jax.random.normal(key, (vocab, dim), dtype) * 0.02


# ---------------------------------------------------------------------------
# core ops
# ---------------------------------------------------------------------------


def embed_lookup(table: jax.Array, ids: jax.Array) -> jax.Array:
    """Embedding gather via jnp.take.

    On the TPU runtime in this environment, fancy indexing (table[ids])
    lowers to a dramatically slower gather than jnp.take (measured ~8x on a
    [152k, 896] table); jnp.take also matches XLA's preferred lowering.
    """
    return jnp.take(table, ids, axis=0)


def rms_norm(x: jax.Array, scale: jax.Array, eps: float,
             offset: float = 0.0) -> jax.Array:
    """RMSNorm in float32 as HF does (cast back to input dtype after).

    ``offset`` implements Gemma-style norms: the effective scale is
    ``offset + weight`` (GemmaRMSNorm computes (1 + w) with zero-init
    weights, and multiplies in float32 before the downcast)."""
    dtype = x.dtype
    x = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
    x = x * jax.lax.rsqrt(var + eps)
    return (x * (scale.astype(jnp.float32) + offset)).astype(dtype)


def dense(x: jax.Array, kernel, bias: jax.Array | None = None):
    """x @ kernel with f32 accumulation; kernel layout is [in, out].

    ``kernel`` may be a weight-only quant dict (int8 per-channel or
    packed int4/nf4 blockwise, models/quant.py): the dequant producer --
    a few elementwise ops -- fuses into the matmul's operand read, so
    weight HBM traffic drops 2x (int8) / 4x (int4, nf4)."""
    if isinstance(kernel, dict):
        from iadr1_tpu.models.quant import dequantize_kernel

        kernel = dequantize_kernel(kernel, x.dtype)
    out = jnp.einsum(
        "...i,io->...o", x, kernel.astype(x.dtype),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def swiglu(x: jax.Array, gate_kernel, up_kernel, down_kernel):
    """SwiGLU MLP: silu(x W_g) * (x W_u) W_d."""
    g = dense(x, gate_kernel)
    u = dense(x, up_kernel)
    return dense(jax.nn.silu(g) * u, down_kernel)


# ---------------------------------------------------------------------------
# rotary position embeddings
# ---------------------------------------------------------------------------


def rope_inv_freq(head_dim: int, theta: float) -> jax.Array:
    return 1.0 / (
        theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )


def scaled_rope_inv_freq(
    head_dim: int,
    theta: float,
    scaling=None,                    # models.qwen2.RopeScaling | None
    seq_len: jax.Array | None = None,
) -> jax.Array:
    """Context-extension inverse frequencies (HF ROPE_INIT_FUNCTIONS
    semantics; reference plumbing: model_utils/rope.py configure_rope).

    * linear: positions effectively divided by ``factor``.
    * dynamic NTK: base grows with the running sequence length
      (never below the original max -- HF's growth/reset cache rule).
    * llama3: piecewise per-frequency scaling between low/high wavelen.
    """
    inv = rope_inv_freq(head_dim, theta)
    if scaling is None:
        return inv
    factor = scaling.factor
    if scaling.type == "linear":
        return inv / factor
    if scaling.type == "dynamic":
        orig = scaling.original_max_position_embeddings
        if seq_len is None:
            eff = float(orig)
        else:
            eff = jnp.maximum(seq_len.astype(jnp.float32), float(orig))
        base = theta * ((factor * eff / orig) - (factor - 1.0)) ** (
            head_dim / (head_dim - 2)
        )
        exp = jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim
        return 1.0 / (base ** exp)
    if scaling.type == "llama3":
        orig = scaling.original_max_position_embeddings
        low_wavelen = orig / scaling.low_freq_factor
        high_wavelen = orig / scaling.high_freq_factor
        wavelen = 2.0 * jnp.pi / inv
        smooth = (orig / wavelen - scaling.low_freq_factor) / (
            scaling.high_freq_factor - scaling.low_freq_factor
        )
        scaled = jnp.where(
            wavelen > low_wavelen,
            inv / factor,
            jnp.where(
                wavelen < high_wavelen,
                inv,
                (1.0 - smooth) * inv / factor + smooth * inv,
            ),
        )
        return scaled
    raise ValueError(f"unknown rope scaling type {scaling.type!r}")


def rope_cos_sin(position_ids: jax.Array, head_dim: int, theta: float,
                 scaling=None):
    """cos/sin tables for plain 1-D RoPE.

    position_ids: [..., T] int -> cos/sin [..., T, head_dim] in float32,
    using the rotate-half (non-interleaved) convention: frequencies are laid
    out as [f0..f_{d/2-1}, f0..f_{d/2-1}].
    """
    seq_len = position_ids.max() + 1 if scaling is not None else None
    inv_freq = scaled_rope_inv_freq(head_dim, theta, scaling, seq_len)
    freqs = position_ids.astype(jnp.float32)[..., None] * inv_freq  # [...,T,d/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    # explicit sharding: the fwd and the remat replay otherwise auto-pick
    # different layouts for these small tables (SPMD involuntary remat)
    from iadr1_tpu.core.mesh import constrain_batch_aux

    return constrain_batch_aux(jnp.cos(emb)), constrain_batch_aux(jnp.sin(emb))


def mrope_cos_sin(
    position_ids: jax.Array,
    head_dim: int,
    theta: float,
    sections: Sequence[int],
):
    """Multimodal RoPE (Qwen2-VL): 3-axis positions interleaved by section.

    position_ids: [3, B, T] with (temporal, height, width) position grids.
    ``sections`` gives the number of *frequency pairs* taken from each axis
    (e.g. (16, 24, 24) for head_dim 128).  Output cos/sin: [B, T, head_dim].

    Reference behavior: HF Qwen2VLRotaryEmbedding + the section interleave in
    modeling_qwen2_vl.apply_multimodal_rotary_pos_emb; position grids are
    produced by get_rope_index (used via data/collator.py:137-143 in the
    reference SFT collator).
    """
    inv_freq = rope_inv_freq(head_dim, theta)  # [d/2]
    # [3, B, T, d/2]
    freqs = position_ids.astype(jnp.float32)[..., None] * inv_freq
    splits = []
    start = 0
    for axis, sec in enumerate(sections):
        splits.append(freqs[axis, ..., start : start + sec])
        start += sec
    half = jnp.concatenate(splits, axis=-1)  # [B, T, d/2]
    emb = jnp.concatenate([half, half], axis=-1)
    # see rope_cos_sin: pin a consistent sharding across fwd/remat-replay
    from iadr1_tpu.core.mesh import constrain_batch_aux

    return constrain_batch_aux(jnp.cos(emb)), constrain_batch_aux(jnp.sin(emb))


def rotate_half(x: jax.Array) -> jax.Array:
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(q: jax.Array, k: jax.Array, cos: jax.Array, sin: jax.Array):
    """Apply rotary embedding; q/k: [B, T, H, D], cos/sin: [B, T, D]."""
    cos = cos[:, :, None, :].astype(q.dtype)
    sin = sin[:, :, None, :].astype(q.dtype)
    q = q * cos + rotate_half(q) * sin
    k = k * cos + rotate_half(k) * sin
    return q, k


# ---------------------------------------------------------------------------
# attention (XLA reference path; Pallas flash kernel plugs in above this)
# ---------------------------------------------------------------------------


def make_attention_mask(
    q_segment_ids: jax.Array | None,
    kv_segment_ids: jax.Array | None,
    q_positions: jax.Array | None,
    kv_positions: jax.Array | None,
    causal: bool,
) -> jax.Array | None:
    """Boolean [B, 1, T, S] mask; True = attend.

    Segment ids implement packed sequences (block-diagonal attention, the
    TPU-native replacement for the reference's 4-D packed masks and
    flash-attn varlen patch, model_utils/packing.py).  Segment id 0 denotes
    padding and never attends/is attended.
    """
    mask = None
    if q_segment_ids is not None:
        seg = (q_segment_ids[:, :, None] == kv_segment_ids[:, None, :]) & (
            kv_segment_ids[:, None, :] != 0
        )
        mask = seg[:, None, :, :]
    if causal:
        cm = (q_positions[:, :, None] >= kv_positions[:, None, :])[:, None, :, :]
        mask = cm if mask is None else (mask & cm)
    return mask


def xla_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: jax.Array | None,
    scale: float | None = None,
) -> jax.Array:
    """Plain XLA attention with GQA; q [B,T,H,D], k/v [B,S,Hkv,D].

    Softmax in float32.  Used on CPU tests and as the correctness oracle for
    the Pallas flash kernel.
    """
    B, T, H, D = q.shape
    Hkv = k.shape[2]
    if scale is None:
        scale = D ** -0.5
    if Hkv != H:
        rep = H // Hkv
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
    scores = jnp.einsum(
        "bthd,bshd->bhts", q, k, preferred_element_type=jnp.float32
    ) * scale
    if mask is not None:
        scores = jnp.where(mask, scores, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    out = jnp.einsum(
        "bhts,bshd->bthd", probs.astype(q.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype)
