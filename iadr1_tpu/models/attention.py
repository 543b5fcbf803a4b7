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

from iadr1_tpu.kernels.flash_attention import flash_attention_with_lse
from iadr1_tpu.models.common import xla_attention

# remat policy saving exactly the flash residuals: with (out, lse) stored,
# every backward residual is satisfied and the forward kernel is DCE'd from
# the rematerialized backward (use in jax.checkpoint(policy=...))
FLASH_REMAT_POLICY = jax.checkpoint_policies.save_only_these_names(
    "flash_out", "flash_lse"
)


def xla_attn(q, k, v, *, mask=None, q_segments=None, kv_segments=None, causal=True):
    return xla_attention(q, k, v, mask)


def flash_attn(q, k, v, *, mask=None, q_segments=None, kv_segments=None,
               causal=True, interpret=False):
    # (out, lse) are checkpoint_named inside the kernel's VJP fwd rule in
    # layout-compact storage shapes -- naming here would save a second,
    # lane-padded copy without unlocking anything
    out, _ = flash_attention_with_lse(
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


def flash_decode_attn(q, k_cache, v_cache, kv_segments, length,
                      interpret=False):
    """Ragged single-token cached attention (kernels/decode_attention.py).

    q [B, 1, H, D]; k/v cache [B, Hkv, S, D]; cost scales with ``length``.
    """
    from iadr1_tpu.kernels.decode_attention import decode_attention

    B, T, H, D = q.shape
    out = decode_attention(
        q.reshape(B, H, D), k_cache.astype(q.dtype), v_cache.astype(q.dtype),
        kv_segments, length, interpret=interpret,
    )
    return out.reshape(B, T, H, D)


def default_decode_attention(kind: str = "auto"):
    """Decode-path impl: the ragged Pallas kernel on TPU, else None
    (models fall back to the dense masked path)."""
    if kind == "auto":
        kind = "flash" if jax.default_backend() == "tpu" else "xla"
    if kind == "flash":
        return flash_decode_attn
    return None
