"""Ragged KV-cache decode attention for TPU in Pallas.

The TPU-native replacement for vLLM's PagedAttention on the decode path
(the reference serves GRPO rollouts and eval through vLLM,
sc_grpo_trainer.py:343-358, vLLM_Qwen_detect_format.py:277-287).  The
round-1 engine fell back to dense masked XLA attention over the whole
static cache, paying O(max_len) HBM reads per step against mostly-empty
slots; this kernel's cost scales with the *valid* cache length.

Design:
* one decoded token per sequence: q is [B, H, D] with H = Hkv * G (GQA);
  queries are reshaped to [B, Hkv, G, D] so each grid cell loads one K/V
  tile and serves its whole query group (same trick as the training flash
  kernel).
* grid (B, Hkv, kv_blocks) with the kv dimension innermost and
  "arbitrary"; online-softmax stats live in VMEM scratch across kv steps.
* **ragged length via scalar prefetch**: the valid cache length (a traced
  scalar, write_idx + 1) is passed as a scalar-prefetch operand; K/V/seg
  BlockSpec index maps clamp block indices past the last valid block to
  the last valid block.  Pallas skips the HBM->VMEM copy when consecutive
  grid steps map to the same block, so out-of-range blocks cost neither
  bandwidth nor compute (the compute is skipped with pl.when).
* per-slot validity: slots >= length and slots whose segment id is 0
  (left padding / finished rows) are masked with the same additive mask
  value as the training kernel.

Decode is inference-only: no VJP is defined.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from iadr1_tpu.kernels.flash_attention import (
    DEFAULT_MASK_VALUE,
    LOG2E,
    RES_LANES,
    _zero_oob_rows,
)


def _decode_kernel(
    lens_ref,                    # scalar prefetch: [1] int32 valid length
    q_ref, k_ref, v_ref, seg_ref,
    o_ref,
    m_scratch, l_scratch, acc_scratch,
    *, scale: float, num_kv_blocks: int, kv_len: int,
):
    kv_idx = pl.program_id(2)
    block_k = k_ref.shape[2]
    length = lens_ref[0]

    @pl.when(kv_idx == 0)
    def _init():
        m_scratch[...] = jnp.full_like(m_scratch, -jnp.inf)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    @pl.when(kv_idx * block_k < length)
    def _run():
        q = q_ref[0, 0]                      # [G, D]
        # the final cache block is partial when max_len % block_k != 0:
        # its padding is UNDEFINED memory (can be NaN) -- zero it so
        # 0 * NaN cannot leak through the p @ v matmul (see
        # flash_attention.py bounds notes)
        k = _zero_oob_rows(k_ref[0, 0], kv_idx, block_k, kv_len)
        v = _zero_oob_rows(v_ref[0, 0], kv_idx, block_k, kv_len)
        seg = seg_ref[0, 0]                  # [block_k]

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * (scale * LOG2E)                  # [G, block_k], base-2 logits
        cols = kv_idx * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (1, block_k), 1
        )
        valid = (cols < length) & (seg[None, :] != 0)
        # select, never add: NaN + mask_value stays NaN
        s = jnp.where(valid, s, DEFAULT_MASK_VALUE)

        m_prev = m_scratch[...]              # [G, RES_LANES]
        l_prev = l_scratch[...]
        m_curr = jnp.max(s, axis=1)[:, None]
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp2(m_prev - m_next)
        p = jnp.exp2(s - m_next[:, :1])
        l_scratch[...] = alpha * l_prev + jnp.sum(p, axis=1)[:, None]
        m_scratch[...] = m_next
        acc_scratch[...] = acc_scratch[...] * alpha[:, :1] + jax.lax.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32
        )

    @pl.when(kv_idx == num_kv_blocks - 1)
    def _store():
        l = l_scratch[...][:, :1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0, 0] = (acc_scratch[...] * l_inv).astype(o_ref.dtype)


def decode_attention(
    q: jax.Array,            # [B, H, D] one query per sequence
    k: jax.Array,            # [B, Hkv, S, D] KV cache (static max length)
    v: jax.Array,            # [B, Hkv, S, D]
    kv_segment_ids: jax.Array,   # [B, S]; 0 = padding / dead slot
    length: jax.Array,       # scalar int32: valid slots are [0, length)
    *,
    scale: float | None = None,
    block_k: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Single-step cached attention; returns [B, H, D].

    HBM traffic scales with ``length`` (rounded up to ``block_k``), not
    with the static cache size.
    """
    B, H, D = q.shape
    Hkv, S = k.shape[1], k.shape[2]
    group = H // Hkv
    if scale is None:
        scale = D ** -0.5
    bk = min(block_k, S)
    nkv = pl.cdiv(S, bk)
    last_valid = lambda lens: jnp.maximum(pl.cdiv(lens[0], bk) - 1, 0)

    q4 = q.reshape(B, Hkv, group, D)
    lens = jnp.full((1,), length, jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, Hkv, nkv),
        in_specs=[
            pl.BlockSpec((1, 1, group, D), lambda b, h, s, lens: (b, h, 0, 0)),
            pl.BlockSpec(
                (1, 1, bk, D),
                lambda b, h, s, lens: (b, h, jnp.minimum(s, last_valid(lens)), 0),
            ),
            pl.BlockSpec(
                (1, 1, bk, D),
                lambda b, h, s, lens: (b, h, jnp.minimum(s, last_valid(lens)), 0),
            ),
            pl.BlockSpec(
                (1, 1, bk),
                lambda b, h, s, lens: (b, 0, jnp.minimum(s, last_valid(lens))),
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, group, D), lambda b, h, s, lens: (b, h, 0, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((group, RES_LANES), jnp.float32),
            pltpu.VMEM((group, RES_LANES), jnp.float32),
            pltpu.VMEM((group, D), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_decode_kernel, scale=scale, num_kv_blocks=nkv,
                          kv_len=S),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, group, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(lens, q4, k, v, kv_segment_ids[:, None, :])
    return out.reshape(B, H, D)
