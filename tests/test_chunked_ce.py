"""Chunked CE loss: value and gradients match the naive full-logits loss."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from iadr1_tpu.models.registry import make_qwen2_bundle
from iadr1_tpu.train.sft import chunked_sft_loss, sft_loss
from iadr1_tpu.data.tokenize import IGNORE_INDEX

TINY = dict(
    vocab_size=128, hidden_size=64, intermediate_size=128,
    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    rope_theta=10000.0, tie_word_embeddings=True,
    architectures=["Qwen2ForCausalLM"],
)


def test_chunked_matches_naive():
    bundle = make_qwen2_bundle(TINY, attention="xla")
    params = bundle.init_params(jax.random.PRNGKey(0))
    B, T = 2, 40  # not a multiple of chunk -> exercises padding
    rng = np.random.default_rng(0)
    ids = rng.integers(1, TINY["vocab_size"], (B, T))
    labels = ids.copy()
    labels[:, : T // 3] = IGNORE_INDEX
    batch = {
        "input_ids": jnp.asarray(ids, jnp.int32),
        "labels": jnp.asarray(labels, jnp.int32),
        "segment_ids": jnp.ones((B, T), jnp.int32),
        "position_ids": jnp.asarray(
            np.broadcast_to(np.arange(T), (B, T)).copy(), jnp.int32),
    }

    def naive(p):
        return sft_loss(bundle.forward(p, batch, remat=False), batch["labels"])[0]

    def chunked(p):
        hidden = bundle.hidden_fn(p, batch, remat=False)
        return chunked_sft_loss(
            hidden, bundle.head_kernel_fn(p), batch["labels"], chunk_size=16
        )[0]

    l1, g1 = jax.value_and_grad(naive)(params)
    l2, g2 = jax.value_and_grad(chunked)(params)
    assert float(l1) == pytest.approx(float(l2), rel=1e-6)
    # bf16 compute path: logsumexp-vs-log_softmax round-off on the gradients
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-4)


def test_fused_ce_matches_chunked():
    """make_fused_chunked_ce: same loss/metrics AND same (hidden, kernel)
    gradients as autodiff through chunked_sft_loss, incl. cotangent scaling
    (grad of 3*loss) and non-chunk-divisible token counts."""
    from iadr1_tpu.train.sft import make_fused_chunked_ce

    rng = np.random.default_rng(1)
    B, T, H, V = 2, 23, 16, 64
    hidden = jnp.asarray(rng.standard_normal((B, T, H)), jnp.float32)
    kernel = jnp.asarray(rng.standard_normal((H, V)) * 0.1, jnp.float32)
    labels = rng.integers(0, V, (B, T))
    labels[0, :7] = IGNORE_INDEX
    labels[1, -5:] = IGNORE_INDEX
    labels = jnp.asarray(labels, jnp.int32)
    fused = make_fused_chunked_ce(chunk_size=8)

    for scale in (1.0, 3.0):
        def ref_fn(h, k):
            return scale * chunked_sft_loss(h, k, labels, chunk_size=8)[0]

        def fused_fn(h, k):
            return scale * fused(h, k, labels)[0]

        (l1, (gh1, gk1)) = jax.value_and_grad(ref_fn, argnums=(0, 1))(
            hidden, kernel)
        (l2, (gh2, gk2)) = jax.value_and_grad(fused_fn, argnums=(0, 1))(
            hidden, kernel)
        assert float(l1) == pytest.approx(float(l2), rel=1e-6)
        np.testing.assert_allclose(np.asarray(gh1), np.asarray(gh2),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(gk1), np.asarray(gk2),
                                   rtol=1e-5, atol=1e-6)

    # metrics parity + grad through metrics["loss"] also works
    l_ref, m_ref = chunked_sft_loss(hidden, kernel, labels, chunk_size=8)
    l_f, m_f = fused(hidden, kernel, labels)
    assert float(m_f["accuracy"]) == pytest.approx(
        float(m_ref["accuracy"]), abs=1e-6)
    assert int(m_f["n_label_tokens"]) == int(m_ref["n_label_tokens"])
    g_metric = jax.grad(lambda h: fused(h, kernel, labels)[1]["loss"])(hidden)
    g_direct = jax.grad(lambda h: fused(h, kernel, labels)[0])(hidden)
    np.testing.assert_allclose(np.asarray(g_metric), np.asarray(g_direct),
                               rtol=1e-6)


def test_fused_step_and_save_qkv_remat_match():
    """Full-model step: fused_ce=True and remat='save_qkv' each produce the
    same loss and parameter gradients as the reference configuration."""
    import functools

    bundle = make_qwen2_bundle(TINY, attention="xla")
    params = bundle.init_params(jax.random.PRNGKey(0))
    B, T = 2, 40
    rng = np.random.default_rng(2)
    ids = rng.integers(1, TINY["vocab_size"], (B, T))
    labels = ids.copy()
    labels[:, : T // 3] = IGNORE_INDEX
    batch = {
        "input_ids": jnp.asarray(ids, jnp.int32),
        "labels": jnp.asarray(labels, jnp.int32),
        "segment_ids": jnp.ones((B, T), jnp.int32),
        "position_ids": jnp.asarray(
            np.broadcast_to(np.arange(T), (B, T)).copy(), jnp.int32),
    }
    from iadr1_tpu.train.sft import make_fused_chunked_ce

    fused = make_fused_chunked_ce(chunk_size=16)

    def loss_of(p, remat, use_fused):
        hidden = bundle.hidden_fn(p, batch, remat=remat)
        ce = fused if use_fused else functools.partial(
            chunked_sft_loss, chunk_size=16)
        return ce(hidden, bundle.head_kernel_fn(p), batch["labels"])[0]

    l_ref, g_ref = jax.value_and_grad(
        lambda p: loss_of(p, True, False))(params)
    for remat, use_fused in ((True, True), ("save_qkv", True),
                             ("save_qkv", False)):
        l, g = jax.value_and_grad(
            lambda p: loss_of(p, remat, use_fused))(params)
        assert float(l) == pytest.approx(float(l_ref), rel=1e-5)
        # bf16 compute path: the hand-written softmax backward rounds
        # differently from autodiff's logsumexp VJP, and the tied-embedding
        # kernel accumulates both the head and embed cotangents, doubling
        # the round-off exposure (looser atol than the head-only test)
        for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-3, atol=2e-3)


def test_chunked_metrics():
    hidden = jnp.zeros((1, 9, 8))
    kernel = jnp.zeros((8, 32))
    labels = jnp.full((1, 9), IGNORE_INDEX).at[:, -4:].set(5)
    loss, metrics = chunked_sft_loss(hidden, kernel, labels, chunk_size=4)
    assert float(loss) == pytest.approx(np.log(32), rel=1e-5)
    assert int(metrics["n_label_tokens"]) == 4
