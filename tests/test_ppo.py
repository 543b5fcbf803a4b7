"""PPO trainer: GAE math vs a hand-rolled oracle, clipped-loss update step,
KL controller, and a smoke run on the tiny model.

Counterpart of the reference's CustomPPOTrainer
(train/stage_sft/llamafactory/train/ppo/trainer.py, wrapping trl v0.8).
"""

import numpy as np

import jax
import jax.numpy as jnp

from iadr1_tpu.models.registry import make_qwen2_bundle
from iadr1_tpu.train import OptimizerConfig, make_optimizer
from iadr1_tpu.train.ppo import (
    AdaptiveKLController,
    PPOConfig,
    PPOTrainer,
    compute_gae,
    make_experience_fn,
    make_ppo_state_params,
    make_ppo_update_step,
    masked_whiten,
)
from iadr1_tpu.train.state import create_train_state

from helpers import tiny_qwen_tokenizer

TINY = dict(
    vocab_size=600, hidden_size=64, intermediate_size=128,
    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    rope_theta=10000.0, tie_word_embeddings=True,
    architectures=["Qwen2ForCausalLM"],
)


def test_gae_matches_oracle():
    rng = np.random.default_rng(0)
    B, N = 2, 5
    rewards = rng.normal(size=(B, N))
    values = rng.normal(size=(B, N))
    mask = np.ones((B, N))
    gamma, lam = 0.99, 0.95

    adv, returns = compute_gae(rewards, values, mask, gamma, lam)

    # oracle: textbook backward recursion, then whiten
    oracle = np.zeros((B, N))
    for b in range(B):
        last = 0.0
        for t in reversed(range(N)):
            nv = values[b, t + 1] if t < N - 1 else 0.0
            delta = rewards[b, t] + gamma * nv - values[b, t]
            last = delta + gamma * lam * last
            oracle[b, t] = last
    np.testing.assert_allclose(returns, oracle + values, rtol=1e-6)
    np.testing.assert_allclose(adv, masked_whiten(oracle, mask), rtol=1e-5)
    # whitened advantages: ~zero mean, ~unit std
    assert abs(adv.mean()) < 1e-6
    assert abs(adv.std() - 1.0) < 1e-3


def test_adaptive_kl_controller():
    ctl = AdaptiveKLController(0.2, target=6.0, horizon=100.0)
    ctl.update(12.0, n_steps=10)          # KL above target -> coef grows
    assert ctl.value == np.float64(0.2 * (1 + 0.2 * 10 / 100))
    ctl2 = AdaptiveKLController(0.2, target=6.0, horizon=100.0)
    ctl2.update(0.0, n_steps=10)          # KL below target -> coef shrinks
    assert ctl2.value < 0.2


def _ppo_batch(B=2, P=4, N=3):
    rng = np.random.default_rng(3)
    ids = rng.integers(2, 500, (B, P + N))
    return {
        "input_ids": jnp.asarray(ids, jnp.int32),
        "segment_ids": jnp.ones((B, P + N), jnp.int32),
        "position_ids": jnp.asarray(
            np.broadcast_to(np.arange(P + N), (B, P + N)).copy(), jnp.int32),
        "completion_ids": jnp.asarray(ids[:, P:], jnp.int32),
        "completion_mask": jnp.ones((B, N), jnp.int32),
        "prompt_len": P,
    }


def test_ppo_update_step_and_experience():
    bundle = make_qwen2_bundle(TINY, attention="xla")
    model_params = bundle.init_params(jax.random.PRNGKey(0))
    params = make_ppo_state_params(model_params, TINY["hidden_size"])
    optimizer, _ = make_optimizer(
        OptimizerConfig(learning_rate=1e-3, total_steps=10, warmup_ratio=0.0))
    state = create_train_state(params, optimizer)
    ref_params = jax.tree.map(jnp.copy, model_params)
    cfg = PPOConfig(logp_chunk_size=4)

    def score(p, batch, _aux):
        return bundle.hidden_fn(p, batch), bundle.head_kernel_fn(p)

    batch = _ppo_batch()
    exp_fn = make_experience_fn(score, cfg)
    old_logps, ref_logps, values = exp_fn(state.params, ref_params, batch)
    assert old_logps.shape == (2, 3) and values.shape == (2, 3)
    # identical policy/ref -> identical logps
    np.testing.assert_allclose(
        np.asarray(old_logps), np.asarray(ref_logps), atol=1e-5)

    step = make_ppo_update_step(score, optimizer, cfg)
    batch.update({
        "old_logps": old_logps,
        "old_values": values,
        "advantages": jnp.asarray(
            np.array([[1.0, 1.0, 1.0], [-1.0, -1.0, -1.0]]), jnp.float32),
        "returns": values + 0.5,
    })
    before = jax.tree.map(lambda x: np.asarray(x).copy(), state.params)
    new_state, metrics = step(state, ref_params, batch)
    for key in ("loss", "pg_loss", "vf_loss", "approx_kl", "clipfrac"):
        assert np.isfinite(float(metrics[key])), key
    # on-policy first step: ratio == 1 -> approx_kl == 0, no clipping
    assert abs(float(metrics["approx_kl"])) < 1e-9
    assert float(metrics["clipfrac"]) == 0.0
    moved = [
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(before),
                        jax.tree.leaves(new_state.params))
    ]
    assert all(moved)  # value head AND model both train


def test_ppo_trainer_smoke_run():
    tok = tiny_qwen_tokenizer()
    hf_cfg = {**TINY, "vocab_size": max(tok.vocab_size, 600)}
    bundle = make_qwen2_bundle(hf_cfg, attention="xla")
    model_params = bundle.init_params(jax.random.PRNGKey(0))
    params = make_ppo_state_params(model_params, TINY["hidden_size"])
    optimizer, schedule = make_optimizer(
        OptimizerConfig(learning_rate=1e-3, total_steps=20, warmup_ratio=0.0))
    state = create_train_state(params, optimizer)
    ref_params = jax.tree.map(jnp.copy, model_params)
    cfg = PPOConfig(
        max_prompt_length=8, max_completion_length=4, mini_batch_size=2,
        ppo_epochs=2, temperature=1.0, top_k=0, top_p=1.0,
        logp_chunk_size=8, score_norm=True, whiten_rewards=False,
    )
    target = tok.decode([33])

    def reward_fn(texts, examples):
        return [1.0 if target in t else -0.1 for t in texts]

    trainer = PPOTrainer(bundle, tok, optimizer, cfg, reward_fn, state,
                         ref_params, schedule=schedule)
    prompt_ids = tok.encode("Are there any defects", add_special_tokens=False)[:6]
    examples = [{"prompt_ids": prompt_ids}, {"prompt_ids": prompt_ids[:4]}]
    metrics = [trainer.step(examples) for _ in range(3)]
    for m in metrics:
        for key in ("loss", "pg_loss", "vf_loss", "reward", "kl", "kl_coef"):
            assert np.isfinite(m[key]), key
    # first step is on-policy: per-token KL vs the identical ref is ~0
    assert abs(metrics[0]["kl"]) < 1e-4
