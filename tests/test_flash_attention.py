"""Flash-attention kernel correctness vs the XLA oracle (interpret mode on
CPU; the same kernels compile for TPU)."""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from iadr1_tpu.kernels.flash_attention import BlockSizes, flash_attention
from iadr1_tpu.models.common import make_attention_mask, xla_attention


def _oracle(q, k, v, segment_ids=None, causal=True):
    # q [B,H,T,D] -> oracle expects [B,T,H,D]
    B, H, T, D = q.shape
    S = k.shape[2]
    pos = jnp.broadcast_to(jnp.arange(T), (B, T))
    kv_pos = jnp.broadcast_to(jnp.arange(S), (B, S))
    segs = segment_ids if segment_ids is not None else jnp.ones((B, T), jnp.int32)
    kv_segs = segment_ids if segment_ids is not None else jnp.ones((B, S), jnp.int32)
    mask = make_attention_mask(segs, kv_segs, pos, kv_pos, causal=causal)
    out = xla_attention(
        q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3), mask
    )
    return out.transpose(0, 2, 1, 3)


def _rand_qkv(key, B, H, Hkv, T, D, dtype=jnp.float32):
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, H, T, D), dtype)
    k = jax.random.normal(kk, (B, Hkv, T, D), dtype)
    v = jax.random.normal(kv, (B, Hkv, T, D), dtype)
    return q, k, v


BLOCKS = BlockSizes(*([64] * 6))


@pytest.mark.parametrize("causal", [True, False])
@pytest.mark.parametrize("gqa", [False, True])
def test_forward_matches_oracle(causal, gqa):
    B, H, T, D = 2, 4, 256, 32
    Hkv = 2 if gqa else H
    q, k, v = _rand_qkv(jax.random.PRNGKey(0), B, H, Hkv, T, D)

    out = flash_attention(
        q, k, v, causal=causal, blocks=BLOCKS, interpret=True
    )
    ref = _oracle(q, k, v, causal=causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_forward_segments():
    B, H, T, D = 1, 2, 256, 32
    q, k, v = _rand_qkv(jax.random.PRNGKey(1), B, H, H, T, D)
    # three packed segments + trailing padding (id 0)
    segs = jnp.asarray(
        [[1] * 100 + [2] * 60 + [3] * 60 + [0] * 36], jnp.int32
    )
    out = flash_attention(
        q, k, v, segment_ids=segs, causal=True, blocks=BLOCKS, interpret=True
    )
    ref = _oracle(q, k, v, segment_ids=segs, causal=True)
    real = np.asarray(segs[0] != 0)
    np.testing.assert_allclose(
        np.asarray(out)[:, :, real], np.asarray(ref)[:, :, real],
        rtol=2e-5, atol=2e-5,
    )


@pytest.mark.parametrize("gqa", [False, True])
def test_backward_matches_oracle(gqa):
    B, H, T, D = 1, 4, 128, 32
    Hkv = 2 if gqa else H
    q, k, v = _rand_qkv(jax.random.PRNGKey(2), B, H, Hkv, T, D)

    def loss_flash(q, k, v):
        out = flash_attention(q, k, v, causal=True, blocks=BLOCKS, interpret=True)
        return jnp.sum(out * jnp.cos(out))

    def loss_ref(q, k, v):
        out = _oracle(q, k, v, causal=True)
        return jnp.sum(out * jnp.cos(out))

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_flash, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4,
            err_msg=f"grad mismatch for {name}",
        )


def test_backward_segments():
    B, H, T, D = 1, 2, 128, 32
    q, k, v = _rand_qkv(jax.random.PRNGKey(3), B, H, H, T, D)
    segs = jnp.asarray([[1] * 50 + [2] * 40 + [0] * 38], jnp.int32)
    w = (segs != 0).astype(jnp.float32)[:, None, :, None]

    def loss_flash(q, k, v):
        out = flash_attention(
            q, k, v, segment_ids=segs, causal=True, blocks=BLOCKS, interpret=True
        )
        return jnp.sum((out * w) ** 2)

    def loss_ref(q, k, v):
        out = _oracle(q, k, v, segment_ids=segs, causal=True)
        return jnp.sum((out * w) ** 2)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_flash, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4,
            err_msg=f"grad mismatch for {name}",
        )


def test_non_divisible_lengths_padded_by_caller():
    # Framework pads seq len to block multiples; check an exact-multiple edge
    # case with one block.
    B, H, T, D = 1, 1, 64, 32
    q, k, v = _rand_qkv(jax.random.PRNGKey(4), B, H, H, T, D)
    out = flash_attention(q, k, v, causal=True, blocks=BLOCKS, interpret=True)
    ref = _oracle(q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("T", [80, 100])
def test_partial_tiles_forward_and_backward(T):
    """Non-block-multiple T: the final tile is partial and its padding is
    UNDEFINED memory on real TPUs (regression: the GRPO P+N=1280 batch at
    block 512 produced NaN logps on hardware -- garbage K rows leaked
    through the additive mask).  Interpret mode cannot inject garbage, but
    this pins the bounds-mask/zeroing logic to oracle parity for fwd, dq,
    dk, dv at partial tiles."""
    B, H, Hkv, D = 2, 2, 1, 32
    q, k, v = _rand_qkv(jax.random.PRNGKey(7), B, H, Hkv, T, D)

    out = flash_attention(q, k, v, causal=True, blocks=BLOCKS, interpret=True)
    ref = _oracle(q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, causal=True, blocks=BLOCKS,
                            interpret=True)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_oracle(q, k, v, causal=True).astype(jnp.float32) ** 2)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("q k v".split(), g_flash, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4,
            err_msg=f"partial-tile grad mismatch for d{name}")


def test_transposed_matches_stacked(monkeypatch):
    """The transposed-intermediate stacked fwd (IADR1_FLASH_TRANSPOSED;
    s/p tiles [bk, group*bq], accumulator [D, rows]) must match the
    natural-layout stacked path -- fwd and, through the shared VJP that
    consumes its (out, lse), the gradients too.  Kept as a measured
    alternative: on v5e it wins ~3% standalone fwd at bk=512 but loses
    in-step at every block size (docs/kernels.md round-4 notes)."""
    T = 352
    B, H, Hkv, D = 2, 14, 2, 64
    q, k, v = _rand_qkv(jax.random.PRNGKey(13), B, H, Hkv, T, D)
    segs = jnp.asarray(
        np.concatenate([
            np.ones((B, T // 2), np.int32),
            np.full((B, T - T // 2 - 16), 2, np.int32),
            np.zeros((B, 16), np.int32),
        ], axis=1))
    blocks = BlockSizes(128, 128, 128, 128, 128, 128)

    def run():
        def loss(q, k, v):
            o = flash_attention(q, k, v, segment_ids=segs, causal=True,
                                blocks=blocks, interpret=True)
            return jnp.sum(o.astype(jnp.float32) ** 2), o

        (l, o), grads = jax.value_and_grad(loss, argnums=(0, 1, 2),
                                           has_aux=True)(q, k, v)
        return o, grads

    monkeypatch.setenv("IADR1_FLASH_STACKED", "1")
    monkeypatch.setenv("IADR1_FLASH_TRANSPOSED", "0")
    o_n, g_n = run()
    monkeypatch.setenv("IADR1_FLASH_TRANSPOSED", "1")
    o_t, g_t = run()
    np.testing.assert_allclose(np.asarray(o_n), np.asarray(o_t),
                               rtol=1e-6, atol=1e-6)
    for name, a, b in zip("qkv", g_n, g_t):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5,
            err_msg=f"transposed/stacked grad mismatch for d{name}")


@pytest.mark.parametrize("T", [256, 352])
def test_stacked_group_matches_looped(T, monkeypatch):
    """The stacked-group path (GQA query group folded onto the matmul M
    axis, _use_stacked) must match the per-head loop exactly -- fwd, dq,
    dk, dv -- including segments, partial tiles and a 7-wide group (the
    0.5B recipe's 14q/2kv shape)."""
    B, H, Hkv, D = 2, 14, 2, 64
    q, k, v = _rand_qkv(jax.random.PRNGKey(11), B, H, Hkv, T, D)
    segs = jnp.asarray(
        np.concatenate([
            np.ones((B, T // 2), np.int32),
            np.full((B, T - T // 2 - 16), 2, np.int32),
            np.zeros((B, 16), np.int32),
        ], axis=1))
    blocks = BlockSizes(128, 128, 128, 128, 128, 128)

    def run():
        def loss(q, k, v):
            o = flash_attention(q, k, v, segment_ids=segs, causal=True,
                                blocks=blocks, interpret=True)
            return jnp.sum(o.astype(jnp.float32) ** 2), o

        (l, o), grads = jax.value_and_grad(loss, argnums=(0, 1, 2),
                                           has_aux=True)(q, k, v)
        return o, grads

    monkeypatch.setenv("IADR1_FLASH_STACKED", "0")
    o_loop, g_loop = run()
    monkeypatch.setenv("IADR1_FLASH_STACKED", "1")
    o_stack, g_stack = run()

    np.testing.assert_allclose(np.asarray(o_loop), np.asarray(o_stack),
                               rtol=1e-6, atol=1e-6)
    for name, a, b in zip("qkv", g_loop, g_stack):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5,
            err_msg=f"stacked/looped grad mismatch for d{name}")
