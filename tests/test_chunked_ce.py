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


def test_chunked_metrics():
    hidden = jnp.zeros((1, 9, 8))
    kernel = jnp.zeros((8, 32))
    labels = jnp.full((1, 9), IGNORE_INDEX).at[:, -4:].set(5)
    loss, metrics = chunked_sft_loss(hidden, kernel, labels, chunk_size=4)
    assert float(loss) == pytest.approx(np.log(32), rel=1e-5)
    assert int(metrics["n_label_tokens"]) == 4
