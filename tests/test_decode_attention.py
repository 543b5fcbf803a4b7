"""Ragged decode-attention kernel vs the dense XLA oracle (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from iadr1_tpu.kernels.decode_attention import decode_attention
from iadr1_tpu.models.common import xla_attention


def _oracle(q, k, v, kv_seg, length):
    """Dense reference: mask slots >= length and seg == 0."""
    B, H, D = q.shape
    S = k.shape[2]
    valid = (np.arange(S)[None, :] < length) & (np.asarray(kv_seg) != 0)
    mask = jnp.asarray(valid)[:, None, None, :]           # [B, 1, 1, S]
    out = xla_attention(
        jnp.asarray(q)[:, None],                          # [B, T=1, H, D]
        jnp.asarray(k).transpose(0, 2, 1, 3),             # [B, S, Hkv, D]
        jnp.asarray(v).transpose(0, 2, 1, 3),
        mask,
    )
    return np.asarray(out[:, 0])


# lengths start past row 0's left padding: a fully-masked row is a
# don't-care (kernel yields zeros, the dense oracle yields uniform garbage)
@pytest.mark.parametrize("length", [4, 7, 16, 40, 64])
def test_decode_matches_oracle(length):
    B, Hkv, G, S, D = 2, 2, 3, 64, 64
    H = Hkv * G
    rng = np.random.default_rng(0)
    q = rng.standard_normal((B, H, D)).astype(np.float32)
    k = rng.standard_normal((B, Hkv, S, D)).astype(np.float32)
    v = rng.standard_normal((B, Hkv, S, D)).astype(np.float32)
    seg = np.ones((B, S), np.int32)
    seg[0, :3] = 0  # left padding on row 0
    out = decode_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(seg),
        jnp.int32(length), block_k=16, interpret=True,
    )
    ref = _oracle(q, k, v, seg, length)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


def test_decode_blocks_beyond_length_ignored():
    """Writing garbage into cache slots past `length` must not change the
    output (the kernel clamps block fetches to the valid prefix)."""
    B, Hkv, G, S, D = 1, 1, 2, 128, 64
    H = Hkv * G
    rng = np.random.default_rng(1)
    q = rng.standard_normal((B, H, D)).astype(np.float32)
    k = rng.standard_normal((B, Hkv, S, D)).astype(np.float32)
    v = rng.standard_normal((B, Hkv, S, D)).astype(np.float32)
    seg = np.ones((B, S), np.int32)
    length = 20

    k2, v2 = k.copy(), v.copy()
    k2[:, :, length:] = 1e9
    v2[:, :, length:] = -1e9
    kw = dict(block_k=16, interpret=True)
    out1 = decode_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                            jnp.asarray(seg), jnp.int32(length), **kw)
    out2 = decode_attention(jnp.asarray(q), jnp.asarray(k2), jnp.asarray(v2),
                            jnp.asarray(seg), jnp.int32(length), **kw)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-6)


def test_decode_under_jit_traced_length():
    B, Hkv, G, S, D = 2, 2, 2, 64, 64
    H = Hkv * G
    rng = np.random.default_rng(2)
    q = rng.standard_normal((B, H, D)).astype(np.float32)
    k = rng.standard_normal((B, Hkv, S, D)).astype(np.float32)
    v = rng.standard_normal((B, Hkv, S, D)).astype(np.float32)
    seg = np.ones((B, S), np.int32)

    fn = jax.jit(lambda q, k, v, s, n: decode_attention(
        q, k, v, s, n, block_k=32, interpret=True))
    for length in (5, 33, 64):
        out = fn(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                 jnp.asarray(seg), jnp.int32(length))
        ref = _oracle(q, k, v, seg, length)
        np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


def test_decode_partial_final_block():
    """Cache length not a multiple of block_k: the final Pallas block is
    partial and its padding is undefined on hardware (regression: same
    class as the training-kernel partial-tile NaN).  Oracle parity with
    S=40, block 16."""
    B, Hkv, G, S, D = 2, 2, 2, 40, 32
    H = Hkv * G
    rng = np.random.default_rng(5)
    q = rng.standard_normal((B, H, D)).astype(np.float32)
    k = rng.standard_normal((B, Hkv, S, D)).astype(np.float32)
    v = rng.standard_normal((B, Hkv, S, D)).astype(np.float32)
    seg = np.ones((B, S), np.int32)
    for length in (7, 33, 40):
        out = decode_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            jnp.asarray(seg), jnp.int32(length), block_k=16, interpret=True)
        ref = _oracle(q, k, v, seg, length)
        np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)
