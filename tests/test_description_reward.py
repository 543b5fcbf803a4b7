"""Description-reward embedding backends: JAX bundle encoder and the
HF AutoModel path (reference: reward_process/description_reward.py's
all-MiniLM-L6-v2 mean-pool + L2-normalize recipe)."""

import numpy as np
import pytest

import jax

from iadr1_tpu.models.registry import make_qwen2_bundle
from iadr1_tpu.rewards import description as desc

from helpers import tiny_qwen_tokenizer

TINY = dict(
    vocab_size=600, hidden_size=64, intermediate_size=128,
    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    rope_theta=10000.0, tie_word_embeddings=True,
    architectures=["Qwen2ForCausalLM"],
)


@pytest.fixture(autouse=True)
def _restore_backend():
    yield
    desc.register_embedding_backend(None)
    desc._EMBED_FN = None


def test_bow_fallback_ordering():
    assert desc.description_score("a small scratch", "a small scratch") == 1.0
    assert desc.description_score("scratch on top", "dent at bottom") < 0.5
    assert desc.description_score("", "anything") == 0.0


def test_bundle_embedding_backend():
    tok = tiny_qwen_tokenizer()
    bundle = make_qwen2_bundle(
        {**TINY, "vocab_size": max(tok.vocab_size, 600)}, attention="xla")
    params = bundle.init_params(jax.random.PRNGKey(0))
    embed = desc.make_bundle_embedding_backend(
        bundle, params, tok, max_len=16, batch_size=4)

    vecs = embed(["a deep scratch", "a deep scratch", "totally different"])
    vecs = np.asarray(vecs)
    # unit-norm embeddings (bf16 compute inside hidden_fn: loose tolerance)
    np.testing.assert_allclose(np.linalg.norm(vecs, axis=1), 1.0, atol=5e-3)
    # identical inputs -> identical vectors
    np.testing.assert_allclose(vecs[0], vecs[1], atol=1e-6)
    assert not np.allclose(vecs[0], vecs[2], atol=1e-3)

    desc.register_embedding_backend(embed)
    assert desc.description_score("a deep scratch", "a deep scratch") == \
        pytest.approx(1.0, abs=5e-3)
    other = desc.description_score("a deep scratch", "totally different")
    assert 0.0 <= other < 1.0


def test_transformer_embedding_backend_offline():
    """The HF AutoModel path with a locally-built tiny BERT (no network)."""
    torch = pytest.importorskip("torch")
    from transformers import BertConfig, BertModel

    import tempfile

    d = tempfile.mkdtemp()
    tok = tiny_qwen_tokenizer()
    cfg = BertConfig(vocab_size=len(tok) + 8, hidden_size=32,
                     num_hidden_layers=2, num_attention_heads=2,
                     intermediate_size=64, max_position_embeddings=512)
    BertModel(cfg).save_pretrained(d)
    tok.save_pretrained(d)

    embed = desc.make_transformer_embedding_backend(d)
    vecs = np.asarray(embed(["scratch on the surface", "scratch on the surface"]))
    np.testing.assert_allclose(np.linalg.norm(vecs, axis=1), 1.0, atol=1e-5)
    np.testing.assert_allclose(vecs[0], vecs[1], atol=1e-6)
