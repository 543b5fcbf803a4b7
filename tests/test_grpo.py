"""SC-GRPO trainer: advantage math, update-step gradients, and a smoke
training run where the policy learns to emit a rewarded token."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from iadr1_tpu.models.registry import make_qwen2_bundle
from iadr1_tpu.train import OptimizerConfig, make_optimizer
from iadr1_tpu.train.grpo import (
    GRPOConfig,
    GRPOTrainer,
    group_advantages,
    make_grpo_update_step,
)
from iadr1_tpu.train.state import create_train_state

from helpers import tiny_qwen_tokenizer

TINY = dict(
    vocab_size=600, hidden_size=64, intermediate_size=128,
    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    rope_theta=10000.0, tie_word_embeddings=True,
    architectures=["Qwen2ForCausalLM"],
)


def test_group_advantages():
    rewards = np.asarray([1.0, 0.0, 1.0, 1.0, 2.0, 0.0, 0.0, 0.0])
    adv = group_advantages(rewards, 4)
    # group 0: mean .75, std(ddof=1) .5 -> [.5,-1.5,.5,.5]/(.5+1e-4)
    np.testing.assert_allclose(
        adv[:4], np.array([0.25, -0.75, 0.25, 0.25]) / (0.5 + 1e-4), rtol=1e-5
    )
    # group 1: mean .5, all same deviations
    g1 = np.array([1.5, -0.5, -0.5, -0.5]) / (1.0 + 1e-4)
    np.testing.assert_allclose(adv[4:], g1, rtol=1e-4)


def test_update_step_moves_params_toward_advantage():
    bundle = make_qwen2_bundle(TINY, attention="xla")
    params = bundle.init_params(jax.random.PRNGKey(0))
    optimizer, _ = make_optimizer(
        OptimizerConfig(learning_rate=1e-2, total_steps=10, warmup_ratio=0.0)
    )
    state = create_train_state(params, optimizer)
    ref_params = jax.tree.map(jnp.copy, params)

    cfg = GRPOConfig(num_generations=2, beta=0.04)
    step = make_grpo_update_step(
        lambda p, b: bundle.forward(p, b), optimizer, cfg
    )

    B, P, N = 2, 4, 3
    batch = {
        "input_ids": jnp.asarray(np.tile(np.arange(2, 2 + P + N), (B, 1)), jnp.int32),
        "segment_ids": jnp.ones((B, P + N), jnp.int32),
        "position_ids": jnp.asarray(
            np.broadcast_to(np.arange(P + N), (B, P + N)).copy(), jnp.int32),
        "completion_ids": jnp.asarray(
            np.tile(np.arange(2 + P, 2 + P + N), (B, 1)), jnp.int32),
        "completion_mask": jnp.ones((B, N), jnp.int32),
        "advantages": jnp.asarray([1.0, -1.0], jnp.float32),
        "prompt_len": P,
    }
    before = jax.tree.map(lambda x: np.asarray(x).copy(), params)
    new_state, metrics = step(state, ref_params, batch)
    assert np.isfinite(float(metrics["loss"]))
    # on-policy start: KL to the identical reference must be ~0
    assert abs(float(metrics["kl"])) < 1e-5
    moved = [
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(new_state.params))
    ]
    assert all(moved)


def _reward_contains_token(target_text):
    def fn(completions, **kwargs):
        return [
            1.0 if target_text in c[0]["content"] else 0.0 for c in completions
        ]
    fn.__name__ = "contains_token"
    return fn


def test_grpo_trainer_learns_reward():
    tok = tiny_qwen_tokenizer()
    hf_cfg = {**TINY, "vocab_size": max(tok.vocab_size, 600)}
    bundle = make_qwen2_bundle(hf_cfg, attention="xla")
    params = bundle.init_params(jax.random.PRNGKey(0))
    optimizer, schedule = make_optimizer(
        OptimizerConfig(learning_rate=5e-3, total_steps=30, warmup_ratio=0.0,
                        max_grad_norm=1.0)
    )
    state = create_train_state(params, optimizer)
    ref_params = jax.tree.map(jnp.copy, params)

    cfg = GRPOConfig(
        num_generations=4, beta=0.02, temperature=1.0, top_k=0, top_p=1.0,
        max_prompt_length=8, max_completion_length=4,
    )
    target = tok.decode([33])
    trainer = GRPOTrainer(
        bundle, tok, optimizer, cfg,
        [_reward_contains_token(target)], state, ref_params,
        schedule=schedule,
    )
    prompt_ids = tok.encode("Are there any defects", add_special_tokens=False)[:6]
    examples = [
        {"prompt_ids": prompt_ids, "solution": "<answer>yes</answer>"},
        {"prompt_ids": prompt_ids[:4], "solution": "<answer>no</answer>"},
    ]
    metrics = [trainer.step(examples) for _ in range(8)]
    rewards = [m["reward"] for m in metrics]
    assert np.isfinite([m["loss"] for m in metrics]).all()
    assert all(np.isfinite(r) for r in rewards)
    # KL stays finite and starts near zero
    assert abs(metrics[0]["kl"]) < 1e-4
    # reward metric plumbed through
    assert "rewards/contains_token" in metrics[0]
