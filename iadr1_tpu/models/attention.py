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

# additionally saves the flat q/k/v projections (named "act_qkv" in the
# decoder blocks): the rematerialized backward then DCE's the three QKV
# matmuls and rebuilds the roped heads with elementwise work only.
# Costs (H+2*Hkv)*D bf16 per token per layer of extra residual HBM
# (0.5B leg: ~75 MB/layer); saves ~7% of layer-matmul recompute FLOPs.
FLASH_QKV_REMAT_POLICY = jax.checkpoint_policies.save_only_these_names(
    "flash_out", "flash_lse", "act_qkv"
)


def xla_attn(q, k, v, *, mask=None, q_segments=None, kv_segments=None, causal=True):
    return xla_attention(q, k, v, mask)


def flash_attn(q, k, v, *, mask=None, q_segments=None, kv_segments=None,
               causal=True, interpret=None):
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


def make_longlora_attention(inner, group_size_ratio: float = 0.25):
    """LongLoRA shift-short (S^2) attention over any inner implementation.

    Counterpart of the reference's llama_attention_forward shift patch
    (model_utils/longlora.py:84-121, configure_longlora :360-366,
    group_size_ratio=0.25): sequences split into groups of
    ``T * ratio``; the second half of the heads attends in groups shifted
    by group/2 (rolled), so information flows between adjacent groups;
    outputs are rolled back and heads re-concatenated.

    TPU design: instead of expanding KV to full MHA and building a tiled
    group mask (the torch patch), the two head halves run as two
    batched-attention calls on [B*n_groups, group, H/2, D] views -- static
    shapes, block-diagonal by construction, GQA preserved by splitting KV
    heads the same way.  Segment ids roll together with the shifted half,
    so packed batches keep exact segment semantics in both halves.
    Training-only, like the reference (`self.training` gate): generation
    paths must use plain attention.
    """

    def grouped(x, g):
        B, T = x.shape[:2]
        return x.reshape((B * (T // g), g) + x.shape[2:])

    def ungrouped(x, B, T):
        return x.reshape((B, T) + x.shape[2:])

    def attn(q, k, v, *, mask=None, q_segments=None, kv_segments=None,
             causal=True):
        B, T, H, D = q.shape
        Hkv = k.shape[2]
        g = int(T * group_size_ratio)
        if g <= 0 or T % g != 0 or H % 2 != 0 or Hkv % 2 != 0:
            raise ValueError(
                f"LongLoRA needs T divisible by group ({T} % {g}) and even "
                f"head counts (H={H}, Hkv={Hkv})"
            )
        half, half_kv = H // 2, Hkv // 2
        segs = q_segments
        if segs is None:
            segs = jax.numpy.ones((B, T), jax.numpy.int32)

        def run(qh, kh, vh, sh):
            from iadr1_tpu.models.common import make_attention_mask

            sg = grouped(sh, g)
            idx = jax.numpy.broadcast_to(
                jax.numpy.arange(g), sg.shape).astype(jax.numpy.int32)
            group_mask = make_attention_mask(sg, sg, idx, idx, causal=causal)
            return inner(
                grouped(qh, g), grouped(kh, g), grouped(vh, g),
                mask=group_mask, q_segments=sg, kv_segments=sg,
                causal=causal,
            )

        out1 = run(q[:, :, :half], k[:, :, :half_kv], v[:, :, :half_kv], segs)
        roll = lambda x: jax.numpy.roll(x, -(g // 2), axis=1)
        out2 = run(roll(q[:, :, half:]), roll(k[:, :, half_kv:]),
                   roll(v[:, :, half_kv:]), roll(segs))
        out1 = ungrouped(out1, B, T)
        out2 = jax.numpy.roll(ungrouped(out2, B, T), g // 2, axis=1)
        return jax.numpy.concatenate([out1, out2], axis=2)

    return attn


def default_attention(kind: str = "auto"):
    """Pick the attention impl: 'flash' | 'xla' | 'auto' (flash on TPU),
    or 'longlora[_flash|_xla]' for shift-short attention (training only)."""
    if kind == "auto":
        kind = "flash" if jax.default_backend() == "tpu" else "xla"
    if kind == "flash":
        return flash_attn
    if kind == "xla":
        return xla_attn
    if kind.startswith("longlora"):
        _, _, inner = kind.partition("_")
        return make_longlora_attention(default_attention(inner or "auto"))
    raise ValueError(f"unknown attention kind {kind!r}")


def flash_decode_attn(q, k_cache, v_cache, kv_segments, length,
                      interpret=None):
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
