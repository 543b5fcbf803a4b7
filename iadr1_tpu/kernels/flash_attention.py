"""Flash attention for TPU in Pallas: fused, tiled, online-softmax attention.

This is the TPU-native replacement for the reference's flash-attn CUDA
dependency (used via --attn_implementation flash_attention_2 in all training
scripts; llamafactory/model_utils/attention.py:63-68) including its varlen/
packing path (model_utils/packing.py:88-123): packed sequences are expressed
as segment ids and masked inside the kernel instead of monkey-patched
cu_seqlens.

Design (see docs/kernels.md):
* grid (batch, KV heads, q_blocks, kv_blocks), kv innermost ("arbitrary"),
  everything else "parallel"; online-softmax stats live in VMEM scratch and
  persist across the kv loop.
* the GQA query group is looped statically inside every kernel: K/V tiles
  load once per group, grid cells drop by the group factor, and dk/dv
  accumulate in-kernel with no post-hoc reduction.
* causal masking skips entire kv tiles above the diagonal.
* backward = two kernels (dq; dkv) that recompute attention probabilities
  from the saved logsumexp, plus a di = rowsum(o * do) precompute.
* custom_vjp so the same entry point trains and serves.

All softmax statistics are float32; masked logits use -0.7*f32max (never
-inf) to avoid NaN propagation.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)
LANES = 128
# The online softmax runs in base 2: the TPU VPU's exp lowers to
# exp2(x * log2(e)) anyway, so folding log2(e) into the attention scale
# saves one full [block_q, block_k] multiply pass per tile in all three
# kernels.  Statistics (m, lse) are kept in base-2 units in-kernel and
# converted back to natural log only at the [block_q, 1] store.
LOG2E = 1.4426950408889634
# lse/di residuals are stored [B, H, T, RES_LANES]: 8 is the f32 sublane
# minimum -- 16x less HBM than lane-padded (the residual buffers dominate
# backward HBM traffic at [B=8, H=14, T=4096])
RES_LANES = 8


class BlockSizes(NamedTuple):
    # 512 tiles amortize the per-grid-cell sequencing overhead that dominates
    # at 128 with small head_dim (measured 20x step-time difference at
    # B=8, T=4096, D=64 on v5e); larger q blocks OOM the dkv kernel's
    # grouped-query VMEM footprint.
    block_q: int = 512
    block_k: int = 512
    block_q_dkv: int = 512
    block_k_dkv: int = 512
    # dq carries group x (q, do, dq-scratch) blocks; 512 overflows VMEM at
    # GQA group 7
    block_q_dq: int = 256
    block_k_dq: int = 512
    # dq grid over q heads (group=1 per cell): k/v re-fetched per q head
    # (cheap -- HBM traffic is tiny next to the s/p compute) but the
    # per-cell VMEM footprint shrinks by the group factor, admitting
    # larger q blocks
    dq_per_qhead: bool = False
    # fwd kv block when the GQA group is stacked (None = follow block_k).
    # Explicit BlockSizes(...) callers keep exact control; only
    # default_blocks() opts into the larger stacked tile.
    block_k_stacked: int | None = None


def default_blocks() -> BlockSizes:
    """BlockSizes from $IADR1_FLASH_BLOCKS ("bq,bk,bq_dkv,bk_dkv,bq_dq,
    bk_dq") when set -- the hardware-tuning knob for odd-shaped chips --
    else the measured v5e defaults.  The default stacked fwd kv block is
    1024: the group-row cap holds the scores tile at [group*256, 1024]
    f32 = 7.3 MB, measured +2.2% step throughput on the v5e 0.5B leg over
    512 (the docs/kernels.md "fwd block 1024 OOM" applied to the looped
    per-head path)."""
    env = os.environ.get("IADR1_FLASH_BLOCKS")
    if env:
        vals = [int(x) for x in env.split(",")]
        # 6 values: the stacked fwd follows block_k (sweep semantics);
        # a 7th sets block_k_stacked explicitly (dq_per_qhead is no
        # longer env-settable -- it measured -0.5pt and was dropped)
        if len(vals) not in (6, 7):
            raise ValueError(
                "IADR1_FLASH_BLOCKS expects 6 or 7 comma-separated ints "
                "(bq,bk,bq_dkv,bk_dkv,bq_dq,bk_dq[,bk_stacked]), got "
                f"{len(vals)}: {env!r}")
        return BlockSizes(*vals[:6], block_k_stacked=(
            vals[6] if len(vals) > 6 else vals[1]))
    return BlockSizes(block_k_stacked=1024)


def _use_stacked(group: int, d: int) -> bool:
    """Whether to stack the GQA query group on the matmul M axis.

    At D=64 the QK/PV contractions can use at most half the MXU depth and
    the per-head loop serializes ``group`` small matmul+softmax rounds per
    cell; stacking the group into one [group*bq, ...] pass amortizes the
    pipeline and (in dkv) turns the group accumulation into a full-depth
    contraction.  At D=128 the looped path already measures 57% MFU, so it
    stays the default there.  Override: IADR1_FLASH_STACKED=0/1."""
    env = os.environ.get("IADR1_FLASH_STACKED", "auto")
    if env == "auto":
        return group > 1 and d <= 64
    return env not in ("0", "false")


# stacked [group*bq, bk] f32 intermediates live in VMEM; cap the stacked
# row count so s/p/ds/dp blocks stay within budget (tunable:
# IADR1_FLASH_STACKED_ROWS)
_STACKED_ROW_CAP = 2048


def _stacked_row_cap() -> int:
    return int(os.environ.get("IADR1_FLASH_STACKED_ROWS", _STACKED_ROW_CAP))


def _stacked_bq(bq: int, group: int) -> int:
    cap = max(128, _stacked_row_cap() // group)
    cap = (cap // 128) * 128
    return min(bq, cap)


def _stack_mask(mask, group: int):
    """Tile a [bq, bk] tile mask across the stacked group rows."""
    if mask is None:
        return None
    return jnp.broadcast_to(
        mask[None], (group,) + mask.shape
    ).reshape(group * mask.shape[0], mask.shape[1])


def _zero_oob_rows_grouped(x, tile_idx, block: int, length: int, group: int):
    """_zero_oob_rows for a group-stacked [group*block, d] tile: row
    r maps to sequence position tile_idx*block + (r % block)."""
    if length % block == 0:
        return x
    pos = tile_idx * block + jax.lax.broadcasted_iota(
        jnp.int32, (group, block, x.shape[-1]), 1
    ).reshape(x.shape)
    return jnp.where(pos < length, x, 0)


def _tile_mask(
    q_idx, kv_idx, block_q, block_k, q_seg, kv_seg, causal: bool,
    q_len: int | None = None, kv_len: int | None = None,
):
    """Elementwise [block_q, block_k] boolean mask for one tile pair.

    ``q_len``/``kv_len`` (static) add bounds predicates when the final
    tile is partial: Pallas pads out-of-range blocks with UNDEFINED
    memory, so garbage rows/columns (q beyond T in the dkv q-loop, kv
    beyond S in the online softmax) must be masked out explicitly.  The
    predicates compile away when the lengths divide the block sizes.
    """
    rows = q_idx * block_q + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_k), 0
    )
    cols = kv_idx * block_k + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_k), 1
    )
    mask = None

    def conj(m, pred):
        return pred if m is None else (m & pred)

    if causal:
        mask = conj(mask, cols <= rows)
    if q_len is not None and q_len % block_q != 0:
        mask = conj(mask, rows < q_len)
    if kv_len is not None and kv_len % block_k != 0:
        mask = conj(mask, cols < kv_len)
    if q_seg is not None:
        mask = conj(
            mask,
            (q_seg[:, None] == kv_seg[None, :]) & (kv_seg[None, :] != 0),
        )
    return mask


def _zero_oob_rows(x, tile_idx, block: int, length: int):
    """Zero rows of a [block, d] tile that fall beyond ``length``.

    Partial-tile padding is undefined memory; zeroing it keeps NaN/Inf
    garbage out of the matmuls (0 * NaN = NaN would otherwise leak through
    rows/columns whose attention weight is exactly zero).  Compiles away
    when ``length`` divides ``block``.
    """
    if length % block == 0:
        return x
    rows = tile_idx * block + jax.lax.broadcasted_iota(
        jnp.int32, x.shape, 0
    )
    return jnp.where(rows < length, x, 0)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _use_transposed() -> bool:
    """Transposed-intermediate stacked fwd (opt-in: IADR1_FLASH_TRANSPOSED).

    At D=64 the natural-layout PV pass ([rows, bk] @ [bk, D]) drives only
    64 of the MXU's 128 output lanes; the transposed pass o^T = v^T p^T is
    contraction-major on both operands with a (group*block_q)-wide output
    -- full lane width -- and the online-softmax statistics become LANE
    vectors, making the running max/sum/rescale lane-parallel."""
    return os.environ.get("IADR1_FLASH_TRANSPOSED", "0") not in ("0", "false")


def _tile_mask_t(
    q_idx, kv_idx, block_q, block_k, q_seg, kv_seg, causal: bool,
    q_len: int | None = None, kv_len: int | None = None, group: int = 1,
):
    """_tile_mask in the transposed orientation: [block_k, group*block_q]
    (kv on sublanes, stacked q on lanes; the group tiles along lanes).

    Built directly in 2D -- a [bk, G, bq] -> [bk, G*bq] bool reshape is a
    sublane->lane merge Mosaic cannot lower ("unsupported shape cast");
    the lane position within the stacked row is recovered as iota % bq.
    """
    rows = group * block_q
    kv_pos = kv_idx * block_k + jax.lax.broadcasted_iota(
        jnp.int32, (block_k, rows), 0
    )
    q_pos = q_idx * block_q + (
        jax.lax.broadcasted_iota(jnp.int32, (block_k, rows), 1) % block_q
    )
    mask = None

    def conj(m, pred):
        return pred if m is None else (m & pred)

    if causal:
        mask = conj(mask, q_pos >= kv_pos)
    if q_len is not None and q_len % block_q != 0:
        mask = conj(mask, q_pos < q_len)
    if kv_len is not None and kv_len % block_k != 0:
        mask = conj(mask, kv_pos < kv_len)
    if q_seg is not None:
        # q_seg arrives PRE-TILED to [group*block_q] (built XLA-side in
        # _fwd): both in-kernel tilings -- 1-D lane concatenate and
        # sublane->lane reshape -- are unsupported Mosaic shape casts
        mask = conj(
            mask,
            (kv_seg[:, None] == q_seg[None, :]) & (kv_seg[:, None] != 0),
        )
    if mask is None:
        return None
    return mask


def _fwd_kernel_t(
    q_ref, k_ref, v_ref, q_seg_ref, kv_seg_ref,
    o_ref, lse_ref,
    m_scratch, l_scratch, acc_scratch,
    *, scale: float, causal: bool, num_kv_blocks: int, group: int,
    q_len: int, kv_len: int,
):
    """Stacked-group forward with transposed intermediates.

    s/p tiles live [block_k, group*block_q], the accumulator
    [D, group*block_q], stats [1, group*block_q] (stored on 8 sublanes).
    One [D, rows] -> [rows, D] transpose per cell at the final store.
    Numerics are identical to _fwd_kernel up to f32 reduction order.
    """
    q_idx, kv_idx = pl.program_id(2), pl.program_id(3)
    block_q = q_ref.shape[2]
    block_k = k_ref.shape[2]
    D = q_ref.shape[3]
    G = group
    rows = G * block_q

    @pl.when(kv_idx == 0)
    def _init():
        m_scratch[...] = jnp.full_like(m_scratch, -jnp.inf)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    should_run = True
    if causal:
        should_run = (q_idx + 1) * block_q - 1 >= kv_idx * block_k

    @pl.when(should_run)
    def _run():
        k = _zero_oob_rows(k_ref[0, 0], kv_idx, block_k, kv_len)
        v = _zero_oob_rows(v_ref[0, 0], kv_idx, block_k, kv_len)
        q = q_ref[0].reshape(rows, D)
        # pre-tiled [1, 1, 1, rows] block (see _fwd)
        q_seg = q_seg_ref[0, 0, 0] if q_seg_ref is not None else None
        kv_seg = kv_seg_ref[0, 0] if kv_seg_ref is not None else None
        maskT = _tile_mask_t(q_idx, kv_idx, block_q, block_k, q_seg, kv_seg,
                             causal, q_len=q_len, kv_len=kv_len, group=G)
        sT = jax.lax.dot_general(
            k, q, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * (scale * LOG2E)
        if maskT is not None:
            sT = jnp.where(maskT, sT, DEFAULT_MASK_VALUE)
        m_prev = m_scratch[0:1]                       # [1, rows]
        l_prev = l_scratch[0:1]
        m_next = jnp.maximum(m_prev, jnp.max(sT, axis=0)[None, :])
        alpha = jnp.exp2(m_prev - m_next)
        p = jnp.exp2(sT - m_next)
        l_scratch[...] = jnp.broadcast_to(
            alpha * l_prev + jnp.sum(p, axis=0)[None, :], l_scratch.shape)
        m_scratch[...] = jnp.broadcast_to(m_next, m_scratch.shape)
        oT = jax.lax.dot_general(
            v, p.astype(v.dtype), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                             # [D, rows]
        acc_scratch[...] = acc_scratch[...] * alpha + oT

    @pl.when(kv_idx == num_kv_blocks - 1)
    def _store():
        l = l_scratch[0:1]                            # [1, rows]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o = (acc_scratch[...] * l_inv).T.reshape(G, block_q, D)
        o_ref[0] = o.astype(o_ref.dtype)
        m = m_scratch[0:1]
        lse = jnp.where(l == 0.0, jnp.inf, m / LOG2E + jnp.log(l))
        lse_ref[0] = jnp.broadcast_to(
            lse.T.reshape(G, block_q, 1), lse_ref.shape[1:])


def _fwd_kernel(
    q_ref, k_ref, v_ref, q_seg_ref, kv_seg_ref,
    o_ref, lse_ref,
    m_scratch, l_scratch, acc_scratch,
    *, scale: float, causal: bool, num_kv_blocks: int, group: int,
    q_len: int, kv_len: int, stacked: bool,
):
    # grid: (batch, KV head, q_block, kv_block); the GQA query group is
    # either looped statically inside (K/V tiles load once per group) or,
    # when ``stacked``, folded onto the matmul M axis: one
    # [group*block_q, d] x [d, block_k] pass per cell instead of ``group``
    # small matmul+softmax rounds (see _use_stacked).
    q_idx, kv_idx = pl.program_id(2), pl.program_id(3)
    block_q = q_ref.shape[2]
    block_k = k_ref.shape[2]
    D = q_ref.shape[3]

    @pl.when(kv_idx == 0)
    def _init():
        m_scratch[...] = jnp.full_like(m_scratch, -jnp.inf)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    # Skip kv tiles entirely above the causal diagonal.
    should_run = True
    if causal:
        should_run = (q_idx + 1) * block_q - 1 >= kv_idx * block_k

    @pl.when(should_run)
    def _run():
        k = _zero_oob_rows(k_ref[0, 0], kv_idx, block_k, kv_len)
        v = _zero_oob_rows(v_ref[0, 0], kv_idx, block_k, kv_len)
        q_seg = q_seg_ref[0, 0] if q_seg_ref is not None else None
        kv_seg = kv_seg_ref[0, 0] if kv_seg_ref is not None else None
        mask = _tile_mask(q_idx, kv_idx, block_q, block_k, q_seg, kv_seg,
                          causal, q_len=q_len, kv_len=kv_len)

        def online_update(q, m_prev, l_prev, acc_prev, mask):
            # base-2 logits: scale * log2(e) folded into one multiply
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * (scale * LOG2E)
            if mask is not None:
                # select, never add: partial-tile padding is undefined
                # memory and can be NaN -- NaN + mask_value stays NaN
                s = jnp.where(mask, s, DEFAULT_MASK_VALUE)
            m_curr = jnp.max(s, axis=1)[:, None]
            m_next = jnp.maximum(m_prev, m_curr)
            alpha = jnp.exp2(m_prev - m_next)
            p = jnp.exp2(s - m_next[:, :1])
            l_next = alpha * l_prev + jnp.sum(p, axis=1)[:, None]
            o_curr = jax.lax.dot(
                p.astype(v.dtype), v, preferred_element_type=jnp.float32
            )
            return m_next, l_next, acc_prev * alpha[:, :1] + o_curr

        if stacked:
            G, R = group, m_scratch.shape[-1]
            q = q_ref[0].reshape(G * block_q, D)
            m_next, l_next, acc = online_update(
                q,
                m_scratch[...].reshape(G * block_q, R),
                l_scratch[...].reshape(G * block_q, R),
                acc_scratch[...].reshape(G * block_q, D),
                _stack_mask(mask, G),
            )
            m_scratch[...] = m_next.reshape(G, block_q, R)
            l_scratch[...] = l_next.reshape(G, block_q, R)
            acc_scratch[...] = acc.reshape(G, block_q, D)
        else:
            for g in range(group):
                m_next, l_next, acc = online_update(
                    q_ref[0, g], m_scratch[g], l_scratch[g],
                    acc_scratch[g], mask,
                )
                m_scratch[g] = m_next
                l_scratch[g] = l_next
                acc_scratch[g] = acc

    @pl.when(kv_idx == num_kv_blocks - 1)
    def _store():
        for g in range(group):
            l = l_scratch[g][:, :1]
            l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
            o_ref[0, g] = (acc_scratch[g] * l_inv).astype(o_ref.dtype)
            m = m_scratch[g][:, :1]
            # convert the base-2 max back to a natural-log lse
            lse = jnp.where(l == 0.0, jnp.inf, m / LOG2E + jnp.log(l))
            lse_ref[0, g] = jnp.broadcast_to(lse, lse_ref.shape[2:])


def _fwd(
    q, k, v, q_segment_ids, kv_segment_ids,
    *, scale, causal, blocks: BlockSizes, interpret=False,
):
    B, H, T, D = q.shape
    Hkv, S = k.shape[1], k.shape[2]
    group = H // Hkv
    stacked = _use_stacked(group, D)
    bq, bk = min(blocks.block_q, T), min(blocks.block_k, S)
    if stacked:
        bq = min(bq, _stacked_bq(blocks.block_q, group))
        bk = min(blocks.block_k_stacked or blocks.block_k, S)
    nq, nkv = pl.cdiv(T, bq), pl.cdiv(S, bk)

    transposed = stacked and _use_transposed()
    in_specs = [
        pl.BlockSpec((1, group, bq, D), lambda b, h, q_, kv: (b, h, q_, 0)),
        pl.BlockSpec((1, 1, bk, D), lambda b, h, q_, kv: (b, h, kv, 0)),
        pl.BlockSpec((1, 1, bk, D), lambda b, h, q_, kv: (b, h, kv, 0)),
        pl.BlockSpec((1, 1, bq), lambda b, h, q_, kv: (b, 0, q_)),
        pl.BlockSpec((1, 1, bk), lambda b, h, q_, kv: (b, 0, kv)),
    ]
    args = [q, k, v, q_segment_ids[:, None, :], kv_segment_ids[:, None, :]]
    if transposed:
        # pre-tile q segments to the stacked lane layout [B, nq, group*bq]
        # (each q block's bq run repeated group times): in-kernel tilings
        # are unsupported Mosaic shape casts (see _tile_mask_t)
        qs = q_segment_ids
        if nq * bq != T:
            qs = jnp.pad(qs, ((0, 0), (0, nq * bq - T)))
        qs = jnp.broadcast_to(
            qs.reshape(B, nq, 1, bq), (B, nq, group, bq)
        ).reshape(B, nq, 1, group * bq)
        in_specs[3] = pl.BlockSpec(
            (1, 1, 1, group * bq), lambda b, h, q_, kv: (b, q_, 0, 0))
        args[3] = qs

    if transposed:
        kernel = functools.partial(
            _fwd_kernel_t, scale=scale, causal=causal, num_kv_blocks=nkv,
            group=group, q_len=T, kv_len=S,
        )
        scratch = [
            pltpu.VMEM((8, group * bq), jnp.float32),
            pltpu.VMEM((8, group * bq), jnp.float32),
            pltpu.VMEM((D, group * bq), jnp.float32),
        ]
    else:
        kernel = functools.partial(
            _fwd_kernel, scale=scale, causal=causal, num_kv_blocks=nkv,
            group=group, q_len=T, kv_len=S, stacked=stacked,
        )
        scratch = [
            pltpu.VMEM((group, bq, RES_LANES), jnp.float32),
            pltpu.VMEM((group, bq, RES_LANES), jnp.float32),
            pltpu.VMEM((group, bq, D), jnp.float32),
        ]
    out, lse = pl.pallas_call(
        kernel,
        grid=(B, Hkv, nq, nkv),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, group, bq, D), lambda b, h, q_, kv: (b, h, q_, 0)),
            pl.BlockSpec((1, group, bq, RES_LANES),
                         lambda b, h, q_, kv: (b, h, q_, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, T, D), q.dtype),
            jax.ShapeDtypeStruct((B, H, T, RES_LANES), jnp.float32),
        ],
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*args)
    return out, lse


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------


def _bwd_dq_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref, q_seg_ref, kv_seg_ref,
    dq_ref,
    dq_scratch,
    *, scale: float, causal: bool, num_kv_blocks: int, group: int,
    q_len: int, kv_len: int, stacked: bool,
):
    # grid: (batch, KV head, q_block, kv_block); GQA group looped inside
    # or stacked on the matmul M axis (see _use_stacked).
    q_idx, kv_idx = pl.program_id(2), pl.program_id(3)
    block_q = q_ref.shape[2]
    block_k = k_ref.shape[2]
    D = q_ref.shape[3]

    @pl.when(kv_idx == 0)
    def _init():
        dq_scratch[...] = jnp.zeros_like(dq_scratch)

    should_run = True
    if causal:
        should_run = (q_idx + 1) * block_q - 1 >= kv_idx * block_k

    @pl.when(should_run)
    def _run():
        k = _zero_oob_rows(k_ref[0, 0], kv_idx, block_k, kv_len)
        v = _zero_oob_rows(v_ref[0, 0], kv_idx, block_k, kv_len)
        q_seg = q_seg_ref[0, 0] if q_seg_ref is not None else None
        kv_seg = kv_seg_ref[0, 0] if kv_seg_ref is not None else None
        mask = _tile_mask(q_idx, kv_idx, block_q, block_k, q_seg, kv_seg,
                          causal, q_len=q_len, kv_len=kv_len)

        def dq_update(q, do, lse2, di, mask):
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * (scale * LOG2E)
            if mask is not None:
                s = jnp.where(mask, s, DEFAULT_MASK_VALUE)

            p = jnp.exp2(s - lse2)                             # [rows, bk]
            # MXU matmuls take the native (bf16) inputs with f32
            # accumulation -- f32-input matmuls run at a fraction of peak
            dp = jax.lax.dot_general(
                do, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            ds = p * (dp - di) * scale
            return jax.lax.dot(
                ds.astype(k.dtype), k, preferred_element_type=jnp.float32
            )

        if stacked:
            G, R = group, lse_ref.shape[-1]
            dq_scratch[...] = (
                dq_scratch[...].reshape(G * block_q, D)
                + dq_update(
                    q_ref[0].reshape(G * block_q, D),
                    do_ref[0].reshape(G * block_q, D),
                    lse_ref[0].reshape(G * block_q, R)[:, :1],
                    di_ref[0].reshape(G * block_q, R)[:, :1],
                    _stack_mask(mask, G),
                )
            ).reshape(G, block_q, D)
        else:
            for g in range(group):
                dq_scratch[g] += dq_update(
                    q_ref[0, g], do_ref[0, g],
                    lse_ref[0, g][:, :1], di_ref[0, g][:, :1], mask,
                )

    @pl.when(kv_idx == num_kv_blocks - 1)
    def _store():
        for g in range(group):
            dq_ref[0, g] = dq_scratch[g].astype(dq_ref.dtype)


def _bwd_dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref, q_seg_ref, kv_seg_ref,
    dk_ref, dv_ref,
    dk_scratch, dv_scratch,
    *, scale: float, causal: bool, num_q_blocks: int, group: int,
    q_len: int, kv_len: int, stacked: bool,
):
    # grid: (batch, KV head, kv_block, q_block) -- q innermost; the GQA
    # group of query heads sharing this kv head is looped statically inside
    # (dk/dv accumulate across the group with no redundant recompute) or,
    # when ``stacked``, folded onto the matmul M axis -- the dk/dv
    # contractions then sum over group*block_q rows in ONE full-depth
    # matmul each, which is exactly the group accumulation.
    kv_idx, q_idx = pl.program_id(2), pl.program_id(3)
    block_q = q_ref.shape[2]
    block_k = k_ref.shape[2]
    D = q_ref.shape[3]

    @pl.when(q_idx == 0)
    def _init():
        dk_scratch[...] = jnp.zeros_like(dk_scratch)
        dv_scratch[...] = jnp.zeros_like(dv_scratch)

    should_run = True
    if causal:
        should_run = (q_idx + 1) * block_q - 1 >= kv_idx * block_k

    @pl.when(should_run)
    def _run():
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        q_seg = q_seg_ref[0, 0] if q_seg_ref is not None else None
        kv_seg = kv_seg_ref[0, 0] if kv_seg_ref is not None else None
        mask = _tile_mask(q_idx, kv_idx, block_q, block_k, q_seg, kv_seg,
                          causal, q_len=q_len, kv_len=kv_len)

        def dkv_update(q, do, lse2, di, mask):
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * (scale * LOG2E)
            if mask is not None:
                s = jnp.where(mask, s, DEFAULT_MASK_VALUE)

            p = jnp.exp2(s - lse2)                             # [rows, bk]
            if mask is not None:
                # lse/di of padded q rows are garbage: select, don't trust
                # exp2 underflow alone
                p = jnp.where(mask, p, 0.0)
            # bf16 MXU inputs, f32 accumulation (see dq kernel note)
            dv = jax.lax.dot_general(
                p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dp = jax.lax.dot_general(
                do, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            ds = p * (dp - di) * scale                         # [rows, bk]
            if mask is not None:
                ds = jnp.where(mask, ds, 0.0)
            dk = jax.lax.dot_general(
                ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return dk, dv

        if stacked:
            G, R = group, lse_ref.shape[-1]
            # q/do rows beyond q_len are undefined padding: zero them so
            # they cannot leak NaNs into the dk/dv accumulations
            dk, dv = dkv_update(
                _zero_oob_rows_grouped(
                    q_ref[0].reshape(G * block_q, D), q_idx, block_q,
                    q_len, G),
                _zero_oob_rows_grouped(
                    do_ref[0].reshape(G * block_q, D), q_idx, block_q,
                    q_len, G),
                lse_ref[0].reshape(G * block_q, R)[:, :1],
                di_ref[0].reshape(G * block_q, R)[:, :1],
                _stack_mask(mask, G),
            )
            dk_scratch[...] += dk
            dv_scratch[...] += dv
        else:
            for g in range(group):
                dk, dv = dkv_update(
                    _zero_oob_rows(q_ref[0, g], q_idx, block_q, q_len),
                    _zero_oob_rows(do_ref[0, g], q_idx, block_q, q_len),
                    lse_ref[0, g][:, :1], di_ref[0, g][:, :1], mask,
                )
                dk_scratch[...] += dk
                dv_scratch[...] += dv

    @pl.when(q_idx == num_q_blocks - 1)
    def _store():
        dk_ref[0, 0] = dk_scratch[...].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scratch[...].astype(dv_ref.dtype)


def _bwd(
    q, k, v, q_segment_ids, kv_segment_ids, out, lse, do,
    *, scale, causal, blocks: BlockSizes, interpret=False,
):
    B, H, T, D = q.shape
    Hkv, S = k.shape[1], k.shape[2]
    group = H // Hkv

    di = jnp.sum(out.astype(jnp.float32) * do.astype(jnp.float32), axis=-1)
    di = jnp.broadcast_to(di[..., None], (B, H, T, RES_LANES))
    # lse residual is stored lane-compact as [B, H, T] in natural units;
    # the kernels recompute p in base 2, so the broadcast (transient, not a
    # saved buffer) also rebases it: p = exp2(s*log2e - lse*log2e)
    lse = jnp.broadcast_to((lse * LOG2E)[..., None], (B, H, T, RES_LANES))

    # --- dq ------------------------------------------------------------------
    # default: grid over KV heads, GQA group looped inside (K/V loaded once
    # per group).  dq_per_qhead: grid over q heads with group=1 per cell --
    # K/V re-fetched per q head, but the per-cell VMEM footprint shrinks by
    # the group factor so larger q blocks fit.
    stacked = _use_stacked(group, D)
    bq, bk = min(blocks.block_q_dq, T), min(blocks.block_k_dq, S)
    if blocks.dq_per_qhead:
        grid_heads = H
        group_dq = 1
        kv_map = lambda b, h, q_, kv: (b, h // group, kv, 0)
    else:
        grid_heads = Hkv
        group_dq = group
        kv_map = lambda b, h, q_, kv: (b, h, kv, 0)
    stacked_dq = stacked and group_dq > 1
    if stacked_dq:
        bq = min(bq, _stacked_bq(blocks.block_q_dq, group_dq))
    nq, nkv = pl.cdiv(T, bq), pl.cdiv(S, bk)
    grid = (B, grid_heads, nq, nkv)
    in_specs = [
        pl.BlockSpec((1, group_dq, bq, D), lambda b, h, q_, kv: (b, h, q_, 0)),
        pl.BlockSpec((1, 1, bk, D), kv_map),
        pl.BlockSpec((1, 1, bk, D), kv_map),
        pl.BlockSpec((1, group_dq, bq, D), lambda b, h, q_, kv: (b, h, q_, 0)),
        pl.BlockSpec((1, group_dq, bq, RES_LANES),
                     lambda b, h, q_, kv: (b, h, q_, 0)),
        pl.BlockSpec((1, group_dq, bq, RES_LANES),
                     lambda b, h, q_, kv: (b, h, q_, 0)),
        pl.BlockSpec((1, 1, bq), lambda b, h, q_, kv: (b, 0, q_)),
        pl.BlockSpec((1, 1, bk), lambda b, h, q_, kv: (b, 0, kv)),
    ]
    args = [q, k, v, do, lse, di, q_segment_ids[:, None, :],
            kv_segment_ids[:, None, :]]

    dq = pl.pallas_call(
        functools.partial(
            _bwd_dq_kernel, scale=scale, causal=causal, num_kv_blocks=nkv,
            group=group_dq, q_len=T, kv_len=S, stacked=stacked_dq,
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, group_dq, bq, D),
                               lambda b, h, q_, kv: (b, h, q_, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, T, D), q.dtype),
        scratch_shapes=[pltpu.VMEM((group_dq, bq, D), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*args)

    # --- dk/dv: grid over KV heads, GQA group looped/stacked inside --------
    bq, bk = min(blocks.block_q_dkv, T), min(blocks.block_k_dkv, S)
    if stacked:
        bq = min(bq, _stacked_bq(blocks.block_q_dkv, group))
    nq, nkv = pl.cdiv(T, bq), pl.cdiv(S, bk)
    in_specs = [
        pl.BlockSpec((1, group, bq, D), lambda b, h, kv, q_: (b, h, q_, 0)),
        pl.BlockSpec((1, 1, bk, D), lambda b, h, kv, q_: (b, h, kv, 0)),
        pl.BlockSpec((1, 1, bk, D), lambda b, h, kv, q_: (b, h, kv, 0)),
        pl.BlockSpec((1, group, bq, D), lambda b, h, kv, q_: (b, h, q_, 0)),
        pl.BlockSpec((1, group, bq, RES_LANES), lambda b, h, kv, q_: (b, h, q_, 0)),
        pl.BlockSpec((1, group, bq, RES_LANES), lambda b, h, kv, q_: (b, h, q_, 0)),
        pl.BlockSpec((1, 1, bq), lambda b, h, kv, q_: (b, 0, q_)),
        pl.BlockSpec((1, 1, bk), lambda b, h, kv, q_: (b, 0, kv)),
    ]
    args = [q, k, v, do, lse, di, q_segment_ids[:, None, :],
            kv_segment_ids[:, None, :]]

    dk, dv = pl.pallas_call(
        functools.partial(
            _bwd_dkv_kernel, scale=scale, causal=causal, num_q_blocks=nq,
            group=group, q_len=T, kv_len=S, stacked=stacked,
        ),
        grid=(B, Hkv, nkv, nq),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, 1, bk, D), lambda b, h, kv, q_: (b, h, kv, 0)),
            pl.BlockSpec((1, 1, bk, D), lambda b, h, kv, q_: (b, h, kv, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Hkv, S, D), jnp.float32),
            jax.ShapeDtypeStruct((B, Hkv, S, D), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bk, D), jnp.float32),
            pltpu.VMEM((bk, D), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*args)

    return dq, dk.astype(k.dtype), dv.astype(v.dtype)


# ---------------------------------------------------------------------------
# public entry point with custom VJP
# ---------------------------------------------------------------------------


def _name_residuals(out, lse8):
    """(out, lse [B,H,T]) tagged for the remat policy, in layout-friendly
    storage shapes.

    The scan-stacked saved residuals get XLA's default (8,128)/(16,128)
    tiling on the *last two dims*: storing lse as [..., T, 8] pads lanes
    8->128 (16x, 5.25 GB at [24,8,14,4096,8]!) and out as [..., T, 64]
    pads 64->128 (2x).  So lse is saved as [B, H, T] and out reshaped to a
    128-lane-exact [B, H, T*D/128, 128] before naming; consumers reshape
    back (free -- contiguous row-major reinterpretation).
    """
    B, H, T, D = out.shape
    lse = checkpoint_name(lse8[..., 0], "flash_lse")      # [B, H, T] f32
    if D % 128 != 0 and (T * D) % 128 == 0:
        out_s = checkpoint_name(out.reshape(B, H, -1, 128), "flash_out")
        out = out_s.reshape(B, H, T, D)
    else:
        out = checkpoint_name(out, "flash_out")
    return out, lse


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8)
)
def _flash(q, k, v, q_segment_ids, kv_segment_ids, scale, causal, blocks, interpret):
    """Returns (out, lse [B,H,T]).

    lse is a *primal output* (not just a VJP residual) so the fwd rule can
    tag (out, lse) with jax.ad_checkpoint.checkpoint_name: under
    jax.checkpoint(..., policy=save_only_these_names(...)), the saved pair
    satisfies every backward residual and the forward kernel is
    dead-code-eliminated from the rematerialized backward.  Saving out
    alone cannot do this -- the fwd rule would still re-run to produce lse
    (measured in round 1: no step-time change).
    """
    out, lse8 = _fwd(
        q, k, v, q_segment_ids, kv_segment_ids,
        scale=scale, causal=causal, blocks=blocks, interpret=interpret,
    )
    return out, lse8[..., 0]


def _flash_fwd(q, k, v, q_segment_ids, kv_segment_ids, scale, causal, blocks, interpret):
    out, lse8 = _fwd(
        q, k, v, q_segment_ids, kv_segment_ids,
        scale=scale, causal=causal, blocks=blocks, interpret=interpret,
    )
    # Residuals are the *named* values: naming outside the custom_vjp does
    # not work -- the fwd rule's residuals would be the pre-name values and
    # remat would re-run the kernel to rebuild them (verified by counting
    # pallas_call eqns in the grad jaxpr).
    out, lse = _name_residuals(out, lse8)
    return (out, lse), (q, k, v, q_segment_ids, kv_segment_ids, out, lse)


def _flash_bwd(scale, causal, blocks, interpret, residuals, grads):
    q, k, v, q_segment_ids, kv_segment_ids, out, lse = residuals
    do, _ = grads  # cotangent w.r.t. lse is not propagated
    dq, dk, dv = _bwd(
        q, k, v, q_segment_ids, kv_segment_ids, out, lse, do,
        scale=scale, causal=causal, blocks=blocks, interpret=interpret,
    )
    return dq, dk, dv, None, None


_flash.defvjp(_flash_fwd, _flash_bwd)


# ---------------------------------------------------------------------------
# mesh partitioning (shard_map)
# ---------------------------------------------------------------------------
#
# pallas_call has no GSPMD partitioning rule: under a jit over a >1-device
# mesh the kernel would be replicated (every device computing the full
# batch), destroying exactly the dp/fsdp/tp scaling the mesh exists for.
# The reference runs flash-attn under ZeRO-3 sharding everywhere
# (llamafactory/model_utils/attention.py:63-68, scripts/train/zero3.json);
# the TPU equivalent is an explicit shard_map: batch -> (dp, fsdp), heads ->
# tp.  Attention is pointwise in (batch, kv-head-group), so the per-shard
# kernel is just the unsharded kernel on smaller B/H -- no collectives.
#
# Axes whose size does not divide the call's batch/head dims stay
# replicated (e.g. the vision tower's packed [1, P] patch stream under
# dp>1); shard_map's transpose handles replicated operands exactly
# (verified bitwise in tests/test_mesh_kernels.py).


def _mesh_batch_heads(mesh, B: int, H: int, Hkv: int):
    """(batch_axes, head_axis): mesh axes that divide this call's dims.

    Batch takes dp/fsdp greedily; heads take tp when BOTH H and Hkv divide
    (the GQA group must stay intact per shard).
    """
    batch, prod = [], 1
    for a in ("dp", "fsdp"):
        n = mesh.shape.get(a, 1)
        if n > 1 and B % (prod * n) == 0:
            batch.append(a)
            prod *= n
    tp = mesh.shape.get("tp", 1)
    head = "tp" if (tp > 1 and H % tp == 0 and Hkv % tp == 0) else None
    return (tuple(batch) or None), head


def _kernel_mesh():
    from iadr1_tpu.core.mesh import kernel_mesh

    mesh = kernel_mesh()
    if mesh is None or mesh.size <= 1:
        return None
    return mesh


def _flash_specs(mesh, B, H, Hkv):
    from jax.sharding import PartitionSpec as P

    batch, head = _mesh_batch_heads(mesh, B, H, Hkv)
    return {
        "qkv": P(batch, head, None, None),
        "seg": P(batch, None),
        "lse": P(batch, head, None),
        "res": P(batch, head, None, None),
    }


# The custom_vjp sits OUTSIDE the shard_maps: the fwd/bwd rules each
# shard_map the raw _fwd/_bwd kernels, so autodiff and the remat-policy
# machinery never differentiate *through* a shard_map (jax 0.9's
# partial-eval of checkpoint_name'd values inside a differentiated
# shard_map trips on Literal residuals), and the outer jaxpr carries the
# exact named-residual structure the single-device path is proven with.


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def _flash_mesh(q, k, v, q_seg, kv_seg, mesh, scale, causal, blocks,
                interpret):
    out, lse8 = _flash_mesh_raw_fwd(
        mesh, q, k, v, q_seg, kv_seg, scale, causal, blocks, interpret
    )
    return out, lse8[..., 0]


def _flash_mesh_raw_fwd(mesh, q, k, v, q_seg, kv_seg, scale, causal, blocks,
                        interpret):
    sp = _flash_specs(mesh, q.shape[0], q.shape[1], k.shape[1])
    fn = jax.shard_map(
        lambda q_, k_, v_, qs_, ks_: _fwd(
            q_, k_, v_, qs_, ks_, scale=scale, causal=causal, blocks=blocks,
            interpret=interpret,
        ),
        mesh=mesh,
        in_specs=(sp["qkv"], sp["qkv"], sp["qkv"], sp["seg"], sp["seg"]),
        out_specs=(sp["qkv"], sp["res"]),
        # pallas_call carries no varying-manual-axes info; replicated-
        # operand transposes are still exact (see module comment above)
        check_vma=False,
    )
    return fn(q, k, v, q_seg, kv_seg)


def _flash_mesh_fwd(q, k, v, q_seg, kv_seg, mesh, scale, causal, blocks,
                    interpret):
    out, lse8 = _flash_mesh_raw_fwd(
        mesh, q, k, v, q_seg, kv_seg, scale, causal, blocks, interpret
    )
    out, lse = _name_residuals(out, lse8)
    return (out, lse), (q, k, v, q_seg, kv_seg, out, lse)


def _flash_mesh_bwd(mesh, scale, causal, blocks, interpret, residuals, grads):
    q, k, v, q_seg, kv_seg, out, lse = residuals
    do, _ = grads
    sp = _flash_specs(mesh, q.shape[0], q.shape[1], k.shape[1])
    fn = jax.shard_map(
        lambda q_, k_, v_, qs_, ks_, o_, l_, do_: _bwd(
            q_, k_, v_, qs_, ks_, o_, l_, do_,
            scale=scale, causal=causal, blocks=blocks, interpret=interpret,
        ),
        mesh=mesh,
        in_specs=(sp["qkv"], sp["qkv"], sp["qkv"], sp["seg"], sp["seg"],
                  sp["qkv"], sp["lse"], sp["qkv"]),
        out_specs=(sp["qkv"], sp["qkv"], sp["qkv"]),
        check_vma=False,
    )
    dq, dk, dv = fn(q, k, v, q_seg, kv_seg, out, lse, do)
    return dq, dk, dv, None, None


_flash_mesh.defvjp(_flash_mesh_fwd, _flash_mesh_bwd)


def _sharded_flash(mesh, q, k, v, q_seg, kv_seg, scale, causal, blocks,
                   interpret):
    return _flash_mesh(
        q, k, v, q_seg, kv_seg, mesh, scale, causal, blocks, interpret
    )


def flash_attention_with_lse(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    segment_ids: jax.Array | None = None,
    kv_segment_ids: jax.Array | None = None,
    causal: bool = True,
    scale: float | None = None,
    blocks: BlockSizes | None = None,
    interpret: bool | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Fused attention returning (out [B,H,T,D], lse [B,H,T]).

    The VJP fwd rule checkpoint_names (out, lse) so remat with the
    save_only_these_names policy skips the forward-kernel recompute in the
    backward pass (see _flash docstring).

    ``interpret=None`` resolves to Pallas interpret mode off-TPU, so the
    same call sites run compiled on hardware and interpreted in CPU tests.
    Under a >1-device ambient mesh (core.mesh.kernel_mesh, set by
    build_mesh) the kernel is shard_mapped: batch over (dp, fsdp), heads
    over tp.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if segment_ids is None:
        segment_ids = jnp.ones((q.shape[0], q.shape[2]), jnp.int32)
    if kv_segment_ids is None:
        kv_segment_ids = (
            segment_ids
            if k.shape[2] == q.shape[2]
            else jnp.ones((k.shape[0], k.shape[2]), jnp.int32)
        )
    blocks = blocks or default_blocks()
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    mesh = _kernel_mesh()
    if mesh is not None:
        return _sharded_flash(
            mesh, q, k, v, segment_ids, kv_segment_ids, scale, causal,
            blocks, interpret,
        )
    return _flash(
        q, k, v, segment_ids, kv_segment_ids, scale, causal, blocks, interpret
    )


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    segment_ids: jax.Array | None = None,
    kv_segment_ids: jax.Array | None = None,
    causal: bool = True,
    scale: float | None = None,
    blocks: BlockSizes | None = None,
    interpret: bool | None = None,
) -> jax.Array:
    """Fused attention: q [B,H,T,D], k/v [B,Hkv,S,D] -> [B,H,T,D].

    ``segment_ids`` [B,T] (and ``kv_segment_ids`` [B,S], defaulting to the
    same array for self-attention) enable packed-sequence masking; id 0 is
    padding.  Differentiable via a custom VJP (Pallas backward kernels).
    """
    out, _ = flash_attention_with_lse(
        q, k, v, segment_ids=segment_ids, kv_segment_ids=kv_segment_ids,
        causal=causal, scale=scale, blocks=blocks, interpret=interpret,
    )
    return out
