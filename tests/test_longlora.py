"""LongLoRA shift-short (S^2) attention vs a dense reference-style oracle.

Counterpart of the reference's llama_attention_forward shift patch
(model_utils/longlora.py:84-121): groups of T*0.25, second head half rolled
by group/2, block-diagonal causal attention, outputs rolled back.
"""

import numpy as np

import jax
import jax.numpy as jnp

from iadr1_tpu.models.attention import make_longlora_attention, xla_attn
from iadr1_tpu.models.registry import make_qwen2_bundle


def _oracle(q, k, v, group_ratio=0.25):
    """Dense torch-patch-style computation: expand KV to MHA, shift second
    head half, per-group causal softmax, shift back."""
    B, T, H, D = q.shape
    Hkv = k.shape[2]
    rep = H // Hkv
    k = np.repeat(k, rep, axis=2)
    v = np.repeat(v, rep, axis=2)
    g = int(T * group_ratio)
    n = T // g
    half = H // 2

    def shift(x):
        return np.concatenate(
            [x[:, :, :half], np.roll(x[:, :, half:], -(g // 2), axis=1)],
            axis=2)

    qs, ks, vs = shift(q), shift(k), shift(v)
    out = np.zeros_like(qs)
    scale = D ** -0.5
    for b in range(B):
        for gi in range(n):
            sl = slice(gi * g, (gi + 1) * g)
            for h in range(H):
                scores = (qs[b, sl, h] @ ks[b, sl, h].T) * scale
                scores = np.where(
                    np.tril(np.ones((g, g), bool)), scores, -np.inf)
                probs = np.exp(scores - scores.max(axis=-1, keepdims=True))
                probs /= probs.sum(axis=-1, keepdims=True)
                out[b, sl, h] = probs @ vs[b, sl, h]
    # shift back
    return np.concatenate(
        [out[:, :, :half], np.roll(out[:, :, half:], g // 2, axis=1)], axis=2)


def test_longlora_matches_dense_oracle():
    rng = np.random.default_rng(0)
    B, T, H, Hkv, D = 2, 16, 4, 2, 8
    q = rng.normal(size=(B, T, H, D)).astype(np.float32)
    k = rng.normal(size=(B, T, Hkv, D)).astype(np.float32)
    v = rng.normal(size=(B, T, Hkv, D)).astype(np.float32)

    attn = make_longlora_attention(xla_attn)
    out = jax.jit(lambda q, k, v: attn(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))(q, k, v)
    np.testing.assert_allclose(np.asarray(out), _oracle(q, k, v),
                               atol=1e-5, rtol=1e-4)


def test_longlora_respects_packing_segments():
    """A token in segment 2 must not see segment 1 even inside one group."""
    rng = np.random.default_rng(1)
    B, T, H, Hkv, D = 1, 8, 2, 2, 4
    q = rng.normal(size=(B, T, H, D)).astype(np.float32)
    k = rng.normal(size=(B, T, Hkv, D)).astype(np.float32)
    v = rng.normal(size=(B, T, Hkv, D)).astype(np.float32)
    # groups of 2; segments split mid-sequence
    segs = jnp.asarray([[1, 1, 1, 1, 2, 2, 2, 2]], jnp.int32)

    attn = make_longlora_attention(xla_attn, group_size_ratio=0.25)
    out = np.asarray(attn(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                          q_segments=segs, kv_segments=segs))
    # token 4 opens segment 2 AND its group: attends only itself in the
    # unshifted half -> output == v[4] exactly (head 0)
    np.testing.assert_allclose(out[0, 4, 0], v[0, 4, 0], atol=1e-6)


def test_longlora_through_model_forward():
    """qwen2 forward with attention='longlora_xla' runs and differs from
    full attention (locality is real), with finite grads."""
    TINY = dict(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        rope_theta=10000.0, tie_word_embeddings=True,
        architectures=["Qwen2ForCausalLM"],
    )
    bundle_ll = make_qwen2_bundle(TINY, attention="longlora_xla")
    bundle = make_qwen2_bundle(TINY, attention="xla")
    params = bundle.init_params(jax.random.PRNGKey(0))
    B, T = 2, 16
    ids = np.random.default_rng(2).integers(1, 128, (B, T))
    batch = {
        "input_ids": jnp.asarray(ids, jnp.int32),
        "segment_ids": jnp.ones((B, T), jnp.int32),
        "position_ids": jnp.asarray(
            np.broadcast_to(np.arange(T), (B, T)).copy(), jnp.int32),
    }
    full = jax.jit(lambda p, b: bundle.forward(p, b))(params, batch)
    ll = jax.jit(lambda p, b: bundle_ll.forward(p, b))(params, batch)
    assert np.isfinite(np.asarray(ll)).all()
    # locality is real (note: shifted heads wrap circularly at the sequence
    # ends, exactly like the torch patch's .roll -- so even early tokens
    # differ from full attention)
    assert not np.allclose(np.asarray(ll), np.asarray(full), atol=1e-4)

    grads = jax.jit(jax.grad(
        lambda p: (bundle_ll.forward(p, batch) ** 2).mean()))(params)
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree_util.tree_leaves(grads))
