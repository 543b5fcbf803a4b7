"""BCO, PRM, GKD, XPO, Nash-MD: the remaining vendored-trl trainer family
(VERDICT round-2 missing #3).  Math checks against the trl formulas plus
tiny train-and-params-move smoke runs."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from iadr1_tpu.models.registry import make_qwen2_bundle
from iadr1_tpu.train import OptimizerConfig, make_optimizer
from iadr1_tpu.train.grpo import bundle_score_fn
from iadr1_tpu.train.state import create_train_state

from helpers import tiny_qwen_tokenizer

TINY = dict(
    vocab_size=600, hidden_size=64, intermediate_size=128,
    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    rope_theta=10000.0, tie_word_embeddings=True,
    architectures=["Qwen2ForCausalLM"],
)


def _bundle_params(seed=0):
    bundle = make_qwen2_bundle(TINY, attention="xla")
    params = bundle.init_params(jax.random.PRNGKey(seed))
    return bundle, params


def _text_batch(B=4, T=32, seed=0, vocab=600):
    from iadr1_tpu.data.tokenize import IGNORE_INDEX

    rng = np.random.default_rng(seed)
    ids = rng.integers(1, vocab, (B, T))
    labels = np.where(np.arange(T) < T // 2, IGNORE_INDEX, ids)
    return {
        "input_ids": jnp.asarray(ids, jnp.int32),
        "labels": jnp.asarray(labels, jnp.int32),
        "segment_ids": jnp.ones((B, T), jnp.int32),
        "position_ids": jnp.asarray(
            np.broadcast_to(np.arange(T), (B, T)).copy(), jnp.int32),
    }


def _opt():
    return make_optimizer(OptimizerConfig(
        learning_rate=1e-3, total_steps=10, warmup_ratio=0.0))


def _params_moved(before, after):
    return any(
        not np.allclose(np.asarray(b), np.asarray(a))
        for b, a in zip(jax.tree.leaves(before), jax.tree.leaves(after))
    )


# --- BCO ---------------------------------------------------------------------


def test_running_moments_matches_full_stream():
    from iadr1_tpu.train.preference import RunningMoments

    rng = np.random.default_rng(0)
    stream = rng.standard_normal(100) * 3 + 2
    rm = RunningMoments()
    for chunk in np.split(stream, 10):
        rm.update(float(chunk.mean()), float(chunk.var()), float(len(chunk)))
    assert rm.mean == pytest.approx(stream.mean(), rel=1e-6)
    assert rm.var == pytest.approx(stream.var(), rel=1e-4)


def test_bco_step_trains_and_shifts_delta():
    from iadr1_tpu.train.preference import (
        BCOConfig, RunningMoments, make_bco_step,
    )

    bundle, params = _bundle_params()
    optimizer, schedule = _opt()
    state = create_train_state(params, optimizer)
    ref = jax.tree.map(jnp.copy, params)
    step = make_bco_step(bundle_score_fn(bundle), optimizer,
                         BCOConfig(beta=0.1, logp_chunk_size=64), schedule)
    batch = {**_text_batch(), "tags": jnp.asarray([1, 0, 1, 0], jnp.int32)}
    rm = RunningMoments()
    before = jax.tree.map(lambda x: np.asarray(x).copy(), state.params)
    for _ in range(3):
        state, m = step(state, ref, batch, jnp.asarray(rm.mean, jnp.float32))
        rm.update(float(m["reward_mean"]), float(m["reward_var"]),
                  float(m["reward_count"]))
        assert np.isfinite(float(m["loss"]))
    # at start pol == ref -> rewards 0, loss = -2*logsigmoid(0) avg = log 2
    assert _params_moved(before, state.params)
    # desirable rewards should exceed undesirable after a few steps
    assert float(m["rewards/chosen"]) > float(m["rewards/rejected"])


def test_bco_loss_at_init_is_log2():
    from iadr1_tpu.train.preference import BCOConfig, make_bco_step

    bundle, params = _bundle_params(seed=3)
    optimizer, _ = _opt()
    state = create_train_state(params, optimizer)
    ref = jax.tree.map(jnp.copy, params)
    step = make_bco_step(bundle_score_fn(bundle), optimizer,
                         BCOConfig(beta=0.1, logp_chunk_size=64))
    batch = {**_text_batch(seed=5),
             "tags": jnp.asarray([1, 1, 0, 0], jnp.int32)}
    _, m = step(state, ref, batch, jnp.asarray(0.0, jnp.float32))
    assert float(m["loss"]) == pytest.approx(np.log(2.0), rel=1e-4)


# --- PRM ---------------------------------------------------------------------


def test_encode_prm_example():
    from iadr1_tpu.data.tokenize import IGNORE_INDEX
    from iadr1_tpu.train.preference import encode_prm_example

    ids, labels = encode_prm_example(
        prompt_ids=[11, 12], completions_ids=[[21, 22], [31]],
        step_labels=[True, False], separator_ids=[99],
    )
    assert ids == [11, 12, 21, 22, 99, 31, 99]
    I = IGNORE_INDEX
    assert labels == [I, I, I, I, 1, I, 0]

    ids, labels = encode_prm_example(
        [11], [[21], [31]], [True, False], [99],
        train_on_last_step_only=True,
    )
    assert labels == [I, I, I, I, 0]


def test_prm_step_learns_separator_labels():
    from iadr1_tpu.data.tokenize import IGNORE_INDEX
    from iadr1_tpu.train.preference import init_prm_head, make_prm_step

    bundle, params = _bundle_params(seed=1)
    optimizer, schedule = _opt()
    full = {"model": params,
            "prm_head": init_prm_head(jax.random.PRNGKey(2), 64)}
    state = create_train_state(full, optimizer)
    step = make_prm_step(lambda p, b: bundle.hidden_fn(p, b), optimizer,
                         schedule)
    batch = _text_batch(seed=7)
    labels = np.full((4, 32), IGNORE_INDEX)
    labels[:, 10] = [1, 0, 1, 0]
    labels[:, 20] = [0, 0, 1, 1]
    batch["labels"] = jnp.asarray(labels, jnp.int32)
    losses = []
    for _ in range(15):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.7, losses
    assert int(m["n_label_tokens"]) == 8


# --- GKD ---------------------------------------------------------------------


def test_jsd_loss_properties():
    from iadr1_tpu.train.gkd import chunked_jsd_loss

    rng = np.random.default_rng(0)
    B, T, H, V = 2, 16, 8, 32
    hidden = jnp.asarray(rng.standard_normal((B, T, H)), jnp.float32)
    k1 = jnp.asarray(rng.standard_normal((H, V)), jnp.float32)
    k2 = jnp.asarray(rng.standard_normal((H, V)), jnp.float32)
    labels = np.full((B, T), -100)
    labels[:, 4:] = 1
    labels = jnp.asarray(labels)

    # identical student/teacher -> zero divergence
    loss, n = chunked_jsd_loss(hidden, hidden, k1, k1, labels,
                               beta=0.5, temperature=1.0, chunk_size=8)
    assert float(loss) == pytest.approx(0.0, abs=1e-6)
    assert int(n) == B * 12

    # different -> positive; beta in {0, 1} are the two KL directions
    for beta in (0.0, 0.5, 1.0):
        loss, _ = chunked_jsd_loss(hidden, hidden, k1, k2, labels,
                                   beta=beta, temperature=1.0, chunk_size=8)
        assert float(loss) > 0.0


def test_gkd_trainer_distills_toward_teacher():
    from iadr1_tpu.train.gkd import GKDConfig, GKDTrainer

    tok = tiny_qwen_tokenizer()
    hf = {**TINY, "vocab_size": max(tok.vocab_size, 600)}
    bundle = make_qwen2_bundle(hf, attention="xla")
    student = bundle.init_params(jax.random.PRNGKey(0))
    teacher = bundle.init_params(jax.random.PRNGKey(1))
    optimizer, schedule = make_optimizer(OptimizerConfig(
        learning_rate=5e-3, total_steps=20, warmup_ratio=0.0))
    state = create_train_state(student, optimizer)
    cfg = GKDConfig(beta=0.5, temperature=1.0, lmbda=0.5,
                    max_prompt_length=8, max_completion_length=4,
                    logit_chunk_size=32)
    trainer = GKDTrainer(bundle, bundle, tok, optimizer, cfg, state,
                         teacher, schedule=schedule)
    prompt_ids = tok.encode("Check this sample", add_special_tokens=False)[:6]
    examples = [
        {"prompt_ids": prompt_ids, "completion_ids": [5, 6, 7]},
        {"prompt_ids": prompt_ids[:4], "completion_ids": [8, 9]},
    ]
    metrics = [trainer.step(examples) for _ in range(8)]
    losses = [m["loss"] for m in metrics]
    assert np.isfinite(losses).all()
    # both data branches exercised across steps (lmbda=0.5, seeded)
    assert {m["on_policy"] for m in metrics} == {0.0, 1.0}
    # distillation reduces divergence on the off-policy (fixed) data
    off = [m["loss"] for m in metrics if m["on_policy"] == 0.0]
    assert off[-1] < off[0], off


# --- XPO / Nash-MD -----------------------------------------------------------


def _reward_contains_token(target_text):
    def fn(completions, **kwargs):
        return [
            1.0 if target_text in c[0]["content"] else 0.0
            for c in completions
        ]
    fn.__name__ = "contains_token"
    return fn


def test_xpo_trainer_runs():
    from iadr1_tpu.train.online_rl import XPOConfig, XPOTrainer

    tok = tiny_qwen_tokenizer()
    hf = {**TINY, "vocab_size": max(tok.vocab_size, 600)}
    bundle = make_qwen2_bundle(hf, attention="xla")
    params = bundle.init_params(jax.random.PRNGKey(0))
    optimizer, schedule = make_optimizer(OptimizerConfig(
        learning_rate=5e-3, total_steps=20, warmup_ratio=0.0,
        max_grad_norm=1.0))
    state = create_train_state(params, optimizer)
    ref = jax.tree.map(jnp.copy, params)
    trainer = XPOTrainer(
        bundle, tok, optimizer, XPOConfig(beta=0.1, alpha=1e-3),
        [_reward_contains_token(tok.decode([33]))], state, ref,
        max_prompt_length=8, max_completion_length=4,
        sampling_overrides={"temperature": 1.0, "top_k": 0, "top_p": 1.0},
        schedule=schedule,
    )
    before = jax.tree.map(lambda x: np.asarray(x).copy(),
                          trainer.state.params)
    prompt_ids = tok.encode("Are there any defects",
                            add_special_tokens=False)[:6]
    examples = [{"prompt_ids": prompt_ids, "solution": "x"},
                {"prompt_ids": prompt_ids[:4], "solution": "y"}]
    metrics = [trainer.step(examples) for _ in range(4)]
    assert np.isfinite([m["loss"] for m in metrics]).all()
    assert "loss/xpo" in metrics[0] and "loss/dpo" in metrics[0]
    # at init policy == ref: dpo loss is exactly log 2
    assert metrics[0]["loss/dpo"] == pytest.approx(np.log(2.0), abs=1e-4)
    assert _params_moved(before, trainer.state.params)


def test_nash_md_trainer_runs_with_mixture_opponent():
    from iadr1_tpu.train.online_rl import NashMDConfig, NashMDTrainer

    tok = tiny_qwen_tokenizer()
    hf = {**TINY, "vocab_size": max(tok.vocab_size, 600)}
    bundle = make_qwen2_bundle(hf, attention="xla")
    params = bundle.init_params(jax.random.PRNGKey(0))
    optimizer, schedule = make_optimizer(OptimizerConfig(
        learning_rate=5e-3, total_steps=20, warmup_ratio=0.0,
        max_grad_norm=1.0))
    state = create_train_state(params, optimizer)
    ref = jax.tree.map(jnp.copy, params)
    # a discriminative judge: length-based scores so the pairwise
    # probability is almost never the degenerate 1/2 (identical scores at
    # pol == ref give zero gradient by construction -- score term
    # vanishes and log_ratio is 0)
    def length_reward(completions, **kwargs):
        return [float(len(c[0]["content"])) for c in completions]
    length_reward.__name__ = "length"

    trainer = NashMDTrainer(
        bundle, tok, optimizer, NashMDConfig(beta=0.1, mixture_coef=0.5),
        [length_reward], state, ref,
        max_prompt_length=8, max_completion_length=4,
        sampling_overrides={"temperature": 1.0, "top_k": 0, "top_p": 1.0},
        schedule=schedule,
    )
    before = jax.tree.map(lambda x: np.asarray(x).copy(),
                          trainer.state.params)
    prompt_ids = tok.encode("Are there any defects",
                            add_special_tokens=False)[:6]
    examples = [{"prompt_ids": prompt_ids, "solution": "x"},
                {"prompt_ids": prompt_ids[:4], "solution": "y"}]
    metrics = [trainer.step(examples) for _ in range(4)]
    assert np.isfinite([m["loss"] for m in metrics]).all()
    # at init policy == ref: kl is exactly zero
    assert metrics[0]["objective/kl"] == pytest.approx(0.0, abs=1e-5)
    assert _params_moved(before, trainer.state.params)


def test_mixture_generation_interpolates_policies():
    """Geometric mixture at coef 0 == policy sampling; coef 1 == opponent
    sampling (same seeds), matching trl's GeometricMixtureWrapper."""
    from iadr1_tpu.train.rollout import RolloutEngine, SamplingConfig

    bundle, p1 = _bundle_params(seed=0)
    _, p2 = _bundle_params(seed=1)
    engine = RolloutEngine(
        bundle,
        SamplingConfig(max_new_tokens=6, temperature=1.0, top_k=0,
                       top_p=1.0, eos_token_id=1, pad_token_id=0),
        max_len=14, cache_dtype=jnp.float32,
    )
    rng = np.random.default_rng(0)
    batch = {
        "input_ids": jnp.asarray(rng.integers(2, 500, (2, 8)), jnp.int32),
        "attention_mask": jnp.ones((2, 8), jnp.int32),
    }
    key = jax.random.PRNGKey(7)
    own = engine.generate(p1, batch, key)
    mix0 = engine.generate_mixture(p1, p2, 0.0, batch, key)
    mix1 = engine.generate_mixture(p1, p2, 1.0, batch, key)
    other = engine.generate(p2, batch, key)
    np.testing.assert_array_equal(np.asarray(own["completion_ids"]),
                                  np.asarray(mix0["completion_ids"]))
    np.testing.assert_array_equal(np.asarray(other["completion_ids"]),
                                  np.asarray(mix1["completion_ids"]))


# --- Iterative SFT -----------------------------------------------------------


def test_iterative_sft_trainer():
    from iadr1_tpu.train.sft import IterativeSFTTrainer

    tok = tiny_qwen_tokenizer()
    hf = {**TINY, "vocab_size": max(tok.vocab_size, 600)}
    bundle = make_qwen2_bundle(hf, attention="xla")
    optimizer, schedule = make_optimizer(OptimizerConfig(
        learning_rate=5e-3, total_steps=20, warmup_ratio=0.0))
    trainer = IterativeSFTTrainer(bundle, tok, optimizer, schedule,
                                  max_length=32, ce_chunk=32)
    texts = ["No defects were found in this sample."] * 4
    losses = [trainer.step(texts=texts)["loss"] for _ in range(6)]
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.8, losses

    # ids + explicit labels interface
    ids = [tok.encode("check sample", add_special_tokens=False)] * 2
    m = trainer.step(input_ids=ids)
    assert np.isfinite(m["loss"])
