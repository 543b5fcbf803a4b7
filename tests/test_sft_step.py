"""SFT train-step integration: tiny model on the 8-device mesh, loss
decreases, every trainable param moves (the trl train-and-assert pattern,
SURVEY.md section 4), checkpoint round-trip."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from iadr1_tpu.core import MeshConfig, build_mesh
from iadr1_tpu.core.mesh import pytree_shardings
from iadr1_tpu.models import qwen2
from iadr1_tpu.models.registry import make_qwen2_bundle
from iadr1_tpu.train import (
    OptimizerConfig,
    create_train_state,
    make_optimizer,
    make_sft_step,
)
from iadr1_tpu.train.state import create_sharded_state
from iadr1_tpu.data.tokenize import IGNORE_INDEX

HF_CFG = dict(
    vocab_size=128, hidden_size=64, intermediate_size=128,
    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    rope_theta=10000.0, tie_word_embeddings=True,
    architectures=["Qwen2ForCausalLM"],
)


def _batch(B=8, T=64, vocab=128, seed=0):
    rng = np.random.default_rng(seed)
    ids = rng.integers(1, vocab, (B, T))
    labels = ids.copy()
    labels[:, : T // 2] = IGNORE_INDEX  # mask "prompt" half
    segs = np.ones((B, T), np.int32)
    pos = np.broadcast_to(np.arange(T), (B, T)).copy()
    return {
        "input_ids": jnp.asarray(ids, jnp.int32),
        "labels": jnp.asarray(labels, jnp.int32),
        "segment_ids": jnp.asarray(segs),
        "position_ids": jnp.asarray(pos, jnp.int32),
    }


def test_sft_step_trains_on_mesh():
    mesh = build_mesh(MeshConfig(dp=2, fsdp=2, tp=2))
    bundle = make_qwen2_bundle(HF_CFG, attention="xla")
    params = bundle.init_params(jax.random.PRNGKey(0))
    params = jax.device_put(params, pytree_shardings(bundle.logical_axes(), mesh))

    opt_cfg = OptimizerConfig(learning_rate=1e-2, total_steps=20, warmup_ratio=0.0)
    optimizer, schedule = make_optimizer(opt_cfg)
    state = create_sharded_state(params, optimizer)
    step = make_sft_step(bundle.forward, optimizer, schedule)

    before = jax.tree.map(lambda x: np.asarray(x).copy(), state.params)
    batch = _batch()
    losses = []
    for i in range(8):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))

    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.9, losses
    assert int(state.step) == 8
    assert float(metrics["learning_rate"]) == pytest.approx(
        float(schedule(7)), rel=1e-5
    )

    # every parameter changed
    flat_before = jax.tree.leaves(before)
    flat_after = jax.tree.leaves(jax.tree.map(np.asarray, state.params))
    for b, a in zip(flat_before, flat_after):
        assert not np.allclose(b, a), "parameter did not move"


def test_sft_loss_masking():
    from iadr1_tpu.train.sft import sft_loss

    B, T, V = 2, 8, 16
    logits = jnp.zeros((B, T, V))
    labels = jnp.full((B, T), IGNORE_INDEX)
    labels = labels.at[:, -2:].set(3)
    loss, metrics = sft_loss(logits, labels)
    # uniform logits -> loss = log(V)
    assert float(loss) == pytest.approx(np.log(V), rel=1e-5)
    assert int(metrics["n_label_tokens"]) == B * 2


def test_checkpoint_roundtrip(tmp_path):
    from iadr1_tpu.train.checkpoint import CheckpointManager

    bundle = make_qwen2_bundle(HF_CFG, attention="xla")
    params = bundle.init_params(jax.random.PRNGKey(1))
    optimizer, _ = make_optimizer(OptimizerConfig(total_steps=10))
    state = create_train_state(params, optimizer)

    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(0, state)
    mgr.wait()

    zeros = jax.tree.map(jnp.zeros_like, state)
    restored = mgr.restore(zeros)
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(restored.params)[0]),
        np.asarray(jax.tree.leaves(state.params)[0]),
    )
    mgr.close()


def test_similarity_scores():
    """ComputeSimilarity analogue (reference train/sft/metric.py:91-139):
    ROUGE-1/2/L f x100 over jieba-cut tokens + char-level BLEU-4 with
    nltk method3 smoothing (the exact reference BLEU call; its
    rouge-chinese dep is unimportable offline, so ROUGE is first-party
    and pinned on hand-computable cases here)."""
    from iadr1_tpu.train.metrics_text import similarity_scores

    # identical text: all ROUGE = 100, BLEU = 100
    s = similarity_scores(["the cat sat on the mat"],
                          ["the cat sat on the mat"])
    assert s["rouge-1"] == 100.0 and s["rouge-2"] == 100.0
    assert s["rouge-l"] == 100.0
    assert abs(s["bleu-4"] - 100.0) < 1e-6

    # disjoint text: all zero
    s = similarity_scores(["aaa bbb"], ["ccc ddd"])
    assert s["rouge-1"] == 0.0 and s["rouge-2"] == 0.0 and s["rouge-l"] == 0.0

    # hand-computed ROUGE-1: hyp "a b c", ref "a b d" -> overlap 2,
    # p = r = 2/3 -> f = 2/3
    s = similarity_scores(["a b c"], ["a b d"])
    assert abs(s["rouge-1"] - round(2 / 3 * 100, 4)) < 1e-6
    # ROUGE-2: bigrams hyp {ab, bc}, ref {ab, bd} -> overlap 1, p=r=1/2
    assert abs(s["rouge-2"] - 50.0) < 1e-6
    # ROUGE-L: LCS "a b" len 2 -> p=r=2/3
    assert abs(s["rouge-l"] - round(2 / 3 * 100, 4)) < 1e-6

    # empty prediction scores 0 (the reference's guard branch)
    s = similarity_scores([""], ["a b"])
    assert s["rouge-1"] == 0.0

    # BLEU matches a direct nltk call (same smoothing, same char lists)
    from nltk.translate.bleu_score import SmoothingFunction, sentence_bleu
    pred, label = "the cat sat", "the cat sat down"
    want = round(sentence_bleu([list(label)], list(pred),
                               smoothing_function=SmoothingFunction().method3
                               ) * 100, 4)
    s = similarity_scores([pred], [label])
    assert abs(s["bleu-4"] - want) < 1e-9
