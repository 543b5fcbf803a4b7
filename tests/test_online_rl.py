"""RLOO + Online DPO trainers (train/online_rl.py): advantage math vs the
vendored-trl formulas, and tiny train-and-learn smoke runs in the
test_grpo.py / test_preference.py pattern."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from iadr1_tpu.models.registry import make_qwen2_bundle
from iadr1_tpu.train import OptimizerConfig, make_optimizer
from iadr1_tpu.train.grpo import GRPOConfig
from iadr1_tpu.train.online_rl import (
    OnlineDPOTrainer,
    RLOOTrainer,
    rloo_advantages,
)
from iadr1_tpu.train.preference import DPOConfig
from iadr1_tpu.train.state import create_train_state

from helpers import tiny_qwen_tokenizer

TINY = dict(
    vocab_size=600, hidden_size=64, intermediate_size=128,
    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    rope_theta=10000.0, tie_word_embeddings=True,
    architectures=["Qwen2ForCausalLM"],
)


def test_rloo_advantages_leave_one_out():
    # rloo_trainer.py:432-434: baseline_i = (sum - r_i)/(k-1)
    rewards = np.asarray([1.0, 0.0, 2.0, 3.0, 3.0, 3.0])
    adv = rloo_advantages(rewards, 3)
    np.testing.assert_allclose(adv[:3], [0.0, -1.5, 1.5])
    np.testing.assert_allclose(adv[3:], [0.0, 0.0, 0.0])

    norm = rloo_advantages(rewards, 3, normalize=True)
    assert norm.mean() == pytest.approx(0.0, abs=1e-6)
    assert norm.std() == pytest.approx(1.0, rel=1e-3)

    with pytest.raises(ValueError):
        rloo_advantages(rewards, 1)


def _reward_contains_token(target_text):
    def fn(completions, **kwargs):
        return [
            1.0 if target_text in c[0]["content"] else 0.0
            for c in completions
        ]
    fn.__name__ = "contains_token"
    return fn


def test_rloo_trainer_runs_and_learns():
    tok = tiny_qwen_tokenizer()
    hf_cfg = {**TINY, "vocab_size": max(tok.vocab_size, 600)}
    bundle = make_qwen2_bundle(hf_cfg, attention="xla")
    params = bundle.init_params(jax.random.PRNGKey(0))
    optimizer, schedule = make_optimizer(
        OptimizerConfig(learning_rate=5e-3, total_steps=30,
                        warmup_ratio=0.0, max_grad_norm=1.0)
    )
    state = create_train_state(params, optimizer)
    ref_params = jax.tree.map(jnp.copy, params)
    cfg = GRPOConfig(
        num_generations=4, beta=0.02, temperature=1.0, top_k=0, top_p=1.0,
        max_prompt_length=8, max_completion_length=4,
        # scale_rewards is GRPO-only; RLOO overrides compute_advantages
    )
    target = tok.decode([33])
    trainer = RLOOTrainer(
        bundle, tok, optimizer, cfg, [_reward_contains_token(target)],
        state, ref_params, schedule=schedule,
    )
    before = jax.tree.map(lambda x: np.asarray(x).copy(),
                          trainer.state.params)
    prompt_ids = tok.encode("Are there any defects",
                            add_special_tokens=False)[:6]
    examples = [
        {"prompt_ids": prompt_ids, "solution": "x"},
        {"prompt_ids": prompt_ids[:4], "solution": "y"},
    ]
    metrics = [trainer.step(examples) for _ in range(6)]
    assert np.isfinite([m["loss"] for m in metrics]).all()
    assert abs(metrics[0]["kl"]) < 1e-4
    assert "rewards/contains_token" in metrics[0]
    moved = [
        not np.allclose(b, np.asarray(a))
        for b, a in zip(jax.tree.leaves(before),
                        jax.tree.leaves(trainer.state.params))
    ]
    assert any(moved)


def test_online_dpo_trainer_prefers_rewarded_completion():
    tok = tiny_qwen_tokenizer()
    hf_cfg = {**TINY, "vocab_size": max(tok.vocab_size, 600)}
    bundle = make_qwen2_bundle(hf_cfg, attention="xla")
    params = bundle.init_params(jax.random.PRNGKey(1))
    optimizer, schedule = make_optimizer(
        OptimizerConfig(learning_rate=5e-3, total_steps=30,
                        warmup_ratio=0.0, max_grad_norm=1.0)
    )
    state = create_train_state(params, optimizer)
    ref_params = jax.tree.map(jnp.copy, params)
    target = tok.decode([33])
    trainer = OnlineDPOTrainer(
        bundle, tok, optimizer, DPOConfig(beta=0.1, loss_type="sigmoid"),
        [_reward_contains_token(target)], state, ref_params,
        max_prompt_length=8, max_completion_length=4,
        sampling_overrides={"temperature": 1.0, "top_k": 0, "top_p": 1.0},
        schedule=schedule, missing_eos_penalty=0.1,
    )
    before = jax.tree.map(lambda x: np.asarray(x).copy(),
                          trainer.state.params)
    prompt_ids = tok.encode("Are there any defects",
                            add_special_tokens=False)[:6]
    examples = [
        {"prompt_ids": prompt_ids, "solution": "x"},
        {"prompt_ids": prompt_ids[:4], "solution": "y"},
    ]
    metrics = [trainer.step(examples) for _ in range(6)]
    assert np.isfinite([m["loss"] for m in metrics]).all()
    # DPO reward accuracies / margins plumbed through
    assert "rewards/accuracies" in metrics[0]
    assert "objective/scores" in metrics[0]
    moved = [
        not np.allclose(b, np.asarray(a))
        for b, a in zip(jax.tree.leaves(before),
                        jax.tree.leaves(trainer.state.params))
    ]
    assert any(moved)
    # first step starts from ref == policy: chosen/rejected rewards ~ 0
    assert abs(metrics[0]["rewards/chosen"]) < 0.2


def test_online_dpo_chosen_ordering():
    """Tie-break prefers the first sample; clear winner goes first half
    (online_dpo_trainer.py:599-610)."""
    pair = np.asarray([[1.0, 0.0], [0.0, 1.0], [0.5, 0.5]])
    chosen_col = (pair[:, 1] > pair[:, 0]).astype(np.int64)
    np.testing.assert_array_equal(chosen_col, [0, 1, 0])
