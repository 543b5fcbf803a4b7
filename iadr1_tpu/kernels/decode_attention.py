"""Ragged KV-cache decode attention for TPU in Pallas.

The TPU-native replacement for vLLM's PagedAttention on the decode path
(the reference serves GRPO rollouts and eval through vLLM,
sc_grpo_trainer.py:343-358, vLLM_Qwen_detect_format.py:277-287).  The
round-1 engine fell back to dense masked XLA attention over the whole
static cache, paying O(max_len) HBM reads per step against mostly-empty
slots; this kernel's cost scales with the *valid* cache length.

Design:
* one decoded token per sequence: q is [B, H, D] with H = Hkv * G (GQA);
  queries are reshaped to [B, Hkv, G, D] so each grid cell serves the
  whole query group of one KV head.
* **the batch lives INSIDE the block**, not in the grid: every sequence
  shares one ragged length (prompts are left-padded and decode steps are
  lockstep), so a cell loads K/V for ALL B rows and runs one batched
  dot_general.  Grid is just (Hkv, kv_blocks) -- at B=16 that is 16x
  fewer grid cells than a (B, Hkv, kv_blocks) layout, and decode at
  these shapes is cell-overhead-bound, not bandwidth-bound.
* grid kv dimension innermost and "arbitrary"; online-softmax stats live
  in VMEM scratch across kv steps.
* **ragged length via scalar prefetch**: the valid cache length (a traced
  scalar, write_idx + 1) is passed as a scalar-prefetch operand; K/V/seg
  BlockSpec index maps clamp block indices past the last valid block to
  the last valid block.  Pallas skips the HBM->VMEM copy when consecutive
  grid steps map to the same block, so out-of-range blocks cost neither
  bandwidth nor compute (the compute is skipped with pl.when).
* per-slot validity: slots >= length and slots whose segment id is 0
  (left padding / finished rows) are where-selected out (never additive:
  the final partial cache block is undefined padding that can be NaN --
  see flash_attention.py bounds notes), and K/V out-of-range rows are
  zeroed so 0 * NaN cannot leak through the p @ v matmul.
* online softmax runs in base 2 (exp2), like the training kernels.

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
)


def _decode_kernel(
    lens_ref,                    # scalar prefetch: [1] int32 valid length
    q_ref, k_ref, v_ref, seg_ref,
    o_ref,
    m_scratch, l_scratch, acc_scratch,
    *, scale: float, num_kv_blocks: int, kv_len: int,
):
    kv_idx = pl.program_id(1)
    block_k = k_ref.shape[2]
    length = lens_ref[0]

    @pl.when(kv_idx == 0)
    def _init():
        m_scratch[...] = jnp.full_like(m_scratch, -jnp.inf)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    @pl.when(kv_idx * block_k < length)
    def _run():
        q = q_ref[:, 0]                      # [B, G, D]
        k = k_ref[:, 0]                      # [B, block_k, D]
        v = v_ref[:, 0]
        seg = seg_ref[...]                   # [B, block_k]

        rows = kv_idx * block_k + jax.lax.broadcasted_iota(
            jnp.int32, k.shape, 1
        )
        if kv_len % block_k != 0:
            # final partial cache block: padding is undefined memory
            k = jnp.where(rows < kv_len, k, 0)
            v = jnp.where(rows < kv_len, v, 0)

        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * (scale * LOG2E)                  # [B, G, block_k], base-2
        cols = kv_idx * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (1, 1, block_k), 2
        )
        valid = (cols < length) & (seg[:, None, :] != 0)
        s = jnp.where(valid, s, DEFAULT_MASK_VALUE)

        m_prev = m_scratch[...]              # [B, G, RES_LANES]
        l_prev = l_scratch[...]
        m_curr = jnp.max(s, axis=2)[..., None]
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp2(m_prev - m_next)
        p = jnp.exp2(s - m_next[..., :1])
        l_scratch[...] = alpha * l_prev + jnp.sum(p, axis=2)[..., None]
        m_scratch[...] = m_next
        acc_scratch[...] = acc_scratch[...] * alpha[..., :1] + (
            jax.lax.dot_general(
                p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
        )

    @pl.when(kv_idx == num_kv_blocks - 1)
    def _store():
        l = l_scratch[...][..., :1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[:, 0] = (acc_scratch[...] * l_inv).astype(o_ref.dtype)


def decode_attention(
    q: jax.Array,            # [B, H, D] one query per sequence
    k: jax.Array,            # [B, Hkv, S, D] KV cache (static max length)
    v: jax.Array,            # [B, Hkv, S, D]
    kv_segment_ids: jax.Array,   # [B, S]; 0 = padding / dead slot
    length: jax.Array,       # scalar int32: valid slots are [0, length)
    *,
    scale: float | None = None,
    block_k: int = 512,
    interpret: bool | None = None,
) -> jax.Array:
    """Single-step cached attention; returns [B, H, D].

    HBM traffic scales with ``length`` (rounded up to ``block_k``), not
    with the static cache size.  ``interpret=None`` resolves to Pallas
    interpret mode off-TPU.  Under a >1-device ambient mesh
    (core.mesh.kernel_mesh) the kernel shard_maps batch over (dp, fsdp)
    and KV heads over tp, mirroring the training kernels
    (flash_attention.py mesh-partitioning notes); the ragged length
    scalar is replicated.
    """
    from iadr1_tpu.kernels.flash_attention import (
        _kernel_mesh,
        _mesh_batch_heads,
    )

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    mesh = _kernel_mesh()
    if mesh is not None:
        from jax.sharding import PartitionSpec as P

        B, H = q.shape[0], q.shape[1]
        Hkv = k.shape[1]
        batch, head = _mesh_batch_heads(mesh, B, H, Hkv)
        fn = jax.shard_map(
            lambda q_, k_, v_, s_, l_: _decode_impl(
                q_, k_, v_, s_, l_, scale=scale, block_k=block_k,
                interpret=interpret,
            ),
            mesh=mesh,
            in_specs=(P(batch, head, None), P(batch, head, None, None),
                      P(batch, head, None, None), P(batch, None), P()),
            out_specs=P(batch, head, None),
            check_vma=False,  # inference-only; no transpose concerns
        )
        return fn(q, k, v, kv_segment_ids, length)
    return _decode_impl(q, k, v, kv_segment_ids, length, scale=scale,
                        block_k=block_k, interpret=interpret)


def _decode_impl(q, k, v, kv_segment_ids, length, *, scale, block_k,
                 interpret):
    B, H, D = q.shape
    Hkv, S = k.shape[1], k.shape[2]
    group = H // Hkv
    if scale is None:
        scale = D ** -0.5
    bk = min(block_k, S)
    # large batches shrink the kv block so B * bk * D K/V tiles (double-
    # buffered) stay well inside VMEM
    while B * bk * D * 2 * 2 > 8 * 1024 * 1024 and bk > 128:
        bk //= 2
    nkv = pl.cdiv(S, bk)
    last_valid = lambda lens: jnp.maximum(pl.cdiv(lens[0], bk) - 1, 0)

    q4 = q.reshape(B, Hkv, group, D)
    lens = jnp.full((1,), length, jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Hkv, nkv),
        in_specs=[
            pl.BlockSpec((B, 1, group, D), lambda h, s, lens: (0, h, 0, 0)),
            pl.BlockSpec(
                (B, 1, bk, D),
                lambda h, s, lens: (0, h, jnp.minimum(s, last_valid(lens)), 0),
            ),
            pl.BlockSpec(
                (B, 1, bk, D),
                lambda h, s, lens: (0, h, jnp.minimum(s, last_valid(lens)), 0),
            ),
            pl.BlockSpec(
                (B, bk),
                lambda h, s, lens: (0, jnp.minimum(s, last_valid(lens))),
            ),
        ],
        out_specs=pl.BlockSpec(
            (B, 1, group, D), lambda h, s, lens: (0, h, 0, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((B, group, RES_LANES), jnp.float32),
            pltpu.VMEM((B, group, RES_LANES), jnp.float32),
            pltpu.VMEM((B, group, D), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_decode_kernel, scale=scale, num_kv_blocks=nkv,
                          kv_len=S),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, group, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(lens, q4, k, v, kv_segment_ids)
    return out.reshape(B, H, D)
