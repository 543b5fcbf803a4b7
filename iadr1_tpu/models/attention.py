"""Attention dispatch: Pallas flash kernel on TPU, XLA oracle elsewhere.

The TPU counterpart of the reference's attn-implementation selector
(llamafactory/model_utils/attention.py configure_attn_implementation:
eager/sdpa/flash_attention_2).  All implementations share one signature:

    attn(q, k, v, *, mask, q_segments, kv_segments, causal) -> out

with q [B, T, H, D], k/v [B, S, Hkv, D]; ``mask`` is the precomputed
boolean [B, 1, T, S] (XLA path), segments + causal feed the fused kernel.
"""

from __future__ import annotations

import jax

from iadr1_tpu.kernels.flash_attention import flash_attention
from iadr1_tpu.models.common import xla_attention


def xla_attn(q, k, v, *, mask=None, q_segments=None, kv_segments=None, causal=True):
    return xla_attention(q, k, v, mask)


def flash_attn(q, k, v, *, mask=None, q_segments=None, kv_segments=None,
               causal=True, interpret=False):
    out = flash_attention(
        q.transpose(0, 2, 1, 3),
        k.transpose(0, 2, 1, 3),
        v.transpose(0, 2, 1, 3),
        segment_ids=q_segments,
        kv_segment_ids=kv_segments,
        causal=causal,
        interpret=interpret,
    )
    return out.transpose(0, 2, 1, 3)


def default_attention(kind: str = "auto"):
    """Pick the attention impl: 'flash' | 'xla' | 'auto' (flash on TPU)."""
    if kind == "auto":
        kind = "flash" if jax.default_backend() == "tpu" else "xla"
    if kind == "flash":
        return flash_attn
    if kind == "xla":
        return xla_attn
    raise ValueError(f"unknown attention kind {kind!r}")
