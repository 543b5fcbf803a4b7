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
    bundle_score_fn,
    completion_logps,
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

    cfg = GRPOConfig(num_generations=2, beta=0.04, logp_chunk_size=4)
    step = make_grpo_update_step(bundle_score_fn(bundle), optimizer, cfg)

    batch = _grpo_batch()
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


def _grpo_batch(B=2, P=4, N=3):
    # rows must differ: identical rows with opposite advantages cancel
    # gradients exactly and would vacuously pass/fail params-moved checks
    rng = np.random.default_rng(7)
    ids = rng.integers(2, 500, (B, P + N))
    return {
        "input_ids": jnp.asarray(ids, jnp.int32),
        "segment_ids": jnp.ones((B, P + N), jnp.int32),
        "position_ids": jnp.asarray(
            np.broadcast_to(np.arange(P + N), (B, P + N)).copy(), jnp.int32),
        "completion_ids": jnp.asarray(ids[:, P:], jnp.int32),
        "completion_mask": jnp.ones((B, N), jnp.int32),
        "advantages": jnp.asarray([1.0, -1.0], jnp.float32),
        "prompt_len": P,
    }


def test_chunked_logps_match_dense():
    """completion_logps (chunked LM head) must equal the dense [B,T,V] path
    for both an even and an uneven chunk split."""
    bundle = make_qwen2_bundle(TINY, attention="xla")
    params = bundle.init_params(jax.random.PRNGKey(1))
    batch = _grpo_batch(B=2, P=5, N=4)

    logits = jax.jit(lambda p, b: bundle.forward(p, b))(params, batch)
    P, N = batch["prompt_len"], 4
    pred = np.asarray(logits)[:, P - 1 : P - 1 + N].astype(np.float64)
    dense = np.take_along_axis(
        pred - np.log(np.exp(pred).sum(-1, keepdims=True)),
        np.asarray(batch["completion_ids"])[..., None], axis=-1,
    )[..., 0]

    for chunk in (3, 4, 8, 64):
        chunked = jax.jit(
            lambda p, b: completion_logps(bundle_score_fn(bundle), p, b, chunk)
        )(params, batch)
        np.testing.assert_allclose(np.asarray(chunked), dense, atol=1e-4)


def test_lora_ref_elision_update_step():
    """LoRA mode: policy = base + LoRA, KL reference = frozen base, one
    weight copy total (trl PEFT-ref-None path)."""
    from iadr1_tpu.train.adapters import (
        TuningConfig, init_lora_params, merge_lora,
    )

    bundle = make_qwen2_bundle(TINY, attention="xla")
    base = bundle.init_params(jax.random.PRNGKey(0))
    tcfg = TuningConfig(finetuning_type="lora", lora_rank=4)
    lora = init_lora_params(jax.random.PRNGKey(1), base, tcfg)
    optimizer, _ = make_optimizer(
        OptimizerConfig(learning_rate=1e-2, total_steps=10, warmup_ratio=0.0)
    )
    state = create_train_state(lora, optimizer)

    base_score = bundle_score_fn(bundle)

    # the frozen base enters via the ref_params slot (jit argument, not a
    # baked constant)
    def score(lora_params, batch, base_aux):
        return base_score(merge_lora(base_aux, lora_params, tcfg), batch)

    cfg = GRPOConfig(num_generations=2, beta=0.04, logp_chunk_size=4)
    step = make_grpo_update_step(
        score, optimizer, cfg,
        ref_score_fn=lambda base_aux, b, _aux: base_score(base_aux, b),
    )
    batch = _grpo_batch()
    base_before = jax.tree.map(lambda x: np.asarray(x).copy(), base)
    lora_before = jax.tree.map(lambda x: np.asarray(x).copy(), state.params)
    new_state, metrics = step(state, base, batch)
    assert np.isfinite(float(metrics["loss"]))
    # LoRA B starts at zero -> merged == base -> KL to base is exactly 0
    assert abs(float(metrics["kl"])) < 1e-5
    # base weights untouched; LoRA factors moved
    for a, b in zip(jax.tree.leaves(base_before), jax.tree.leaves(base)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    lora_moved = [
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(lora_before),
                        jax.tree.leaves(new_state.params))
    ]
    assert any(lora_moved)


def test_vlm_prompt_truncation_guard():
    """Truncating a prompt that carries image tokens must fail loudly
    (silent slicing desyncs the feature scatter indices)."""
    tok = tiny_qwen_tokenizer()
    hf_cfg = {**TINY, "vocab_size": max(tok.vocab_size, 600)}
    bundle = make_qwen2_bundle(hf_cfg, attention="xla")
    bundle.multimodal = True
    bundle.cfg = type("Cfg", (), {
        "text": bundle.cfg, "image_token_id": 42,
        "mrope_section": None,
    })()
    params = bundle.init_params(jax.random.PRNGKey(0))
    optimizer, _ = make_optimizer(
        OptimizerConfig(learning_rate=1e-3, total_steps=5, warmup_ratio=0.0)
    )
    state = create_train_state(params, optimizer)
    cfg = GRPOConfig(num_generations=2, max_prompt_length=4,
                     max_completion_length=2)
    trainer = GRPOTrainer(
        bundle, tok, optimizer, cfg, [], state,
        jax.tree.map(jnp.copy, params),
    )
    with pytest.raises(ValueError, match="image"):
        trainer._collate_prompts([{"prompt_ids": [1, 42, 42, 3, 4, 5]}])


def test_trainer_dense_scoring_path():
    """shared_prompt_scoring=False exercises the dense repeated-batch
    update (the path families without a shared hook still use)."""
    tok = tiny_qwen_tokenizer()
    hf_cfg = {**TINY, "vocab_size": max(tok.vocab_size, 600)}
    bundle = make_qwen2_bundle(hf_cfg, attention="xla")
    params = bundle.init_params(jax.random.PRNGKey(0))
    optimizer, _ = make_optimizer(
        OptimizerConfig(learning_rate=1e-3, total_steps=10, warmup_ratio=0.0))
    state = create_train_state(params, optimizer)
    cfg = GRPOConfig(num_generations=2, max_prompt_length=8,
                     max_completion_length=4, logp_chunk_size=8,
                     shared_prompt_scoring=False)
    trainer = GRPOTrainer(bundle, tok, optimizer, cfg,
                          [_reward_contains_token("x")], state,
                          jax.tree.map(jnp.copy, params))
    assert not trainer._shared
    m = trainer.step([{"prompt_ids": [5, 6, 7], "solution": "s"}])
    assert np.isfinite(m["loss"]) and abs(m["kl"]) < 1e-4


def test_sync_ref_model():
    """TR-DPO-style periodic ref refresh (trl sync_ref_model): every
    sync_steps, ref <- alpha*policy + (1-alpha)*ref."""
    tok = tiny_qwen_tokenizer()
    hf_cfg = {**TINY, "vocab_size": max(tok.vocab_size, 600)}
    bundle = make_qwen2_bundle(hf_cfg, attention="xla")
    params = bundle.init_params(jax.random.PRNGKey(0))
    optimizer, _ = make_optimizer(
        OptimizerConfig(learning_rate=5e-3, total_steps=10, warmup_ratio=0.0))
    state = create_train_state(params, optimizer)
    ref_params = jax.tree.map(jnp.copy, params)
    cfg = GRPOConfig(
        num_generations=2, max_prompt_length=8, max_completion_length=2,
        sync_ref_model=True, ref_model_sync_steps=2,
        ref_model_mixup_alpha=0.6, logp_chunk_size=8,
    )
    trainer = GRPOTrainer(bundle, tok, optimizer, cfg,
                          [_reward_contains_token("x")], state, ref_params)
    ref_before = jax.tree.map(lambda x: np.asarray(x).copy(),
                              trainer.ref_params)
    examples = [{"prompt_ids": [5, 6, 7], "solution": "s"}]
    m1 = trainer.step(examples)      # step count 1: no sync
    assert m1["ref_synced"] == 0.0
    mid = jax.tree.map(lambda x: np.asarray(x).copy(), trainer.ref_params)
    for a, b in zip(jax.tree.leaves(ref_before), jax.tree.leaves(mid)):
        np.testing.assert_array_equal(a, b)
    # make policy visibly diverge from ref (zero rewards -> zero grads, so
    # the update itself leaves params unchanged in this toy run)
    trainer.state = trainer.state._replace(
        params=jax.tree.map(lambda x: x + 0.01, trainer.state.params))
    m2 = trainer.step(examples)      # step count 2: sync fires
    assert m2["ref_synced"] == 1.0
    after = jax.tree.leaves(trainer.ref_params)
    moved = [not np.allclose(np.asarray(a), np.asarray(b))
             for a, b in zip(jax.tree.leaves(ref_before), after)]
    assert all(moved)
    # mixed value matches alpha*policy + (1-alpha)*ref exactly
    pol = jax.tree.leaves(trainer.state.params)
    for r0, r1, p in zip(jax.tree.leaves(ref_before), after, pol):
        np.testing.assert_allclose(
            np.asarray(r1), 0.4 * np.asarray(r0) + 0.6 * np.asarray(p),
            atol=1e-5)


def _reward_contains_token(target_text):
    def fn(completions, **kwargs):
        return [
            1.0 if target_text in c[0]["content"] else 0.0 for c in completions
        ]
    fn.__name__ = "contains_token"
    return fn


def test_truncation_metric_and_warning():
    """A too-short max_completion_length truncates every completion and
    zeroes every structured reward; the trainer must surface that (metric
    + host warning) instead of training silently on nothing (the round-4
    pipeline e2e lost hours to exactly this)."""
    tok = tiny_qwen_tokenizer()
    hf_cfg = {**TINY, "vocab_size": max(tok.vocab_size, 600)}
    bundle = make_qwen2_bundle(hf_cfg, attention="xla")
    params = bundle.init_params(jax.random.PRNGKey(0))
    optimizer, _ = make_optimizer(
        OptimizerConfig(learning_rate=1e-3, total_steps=10, warmup_ratio=0.0))
    state = create_train_state(params, optimizer)
    cfg = GRPOConfig(num_generations=2, max_prompt_length=8,
                     max_completion_length=4, logp_chunk_size=8)

    def zero_reward(completions, **kwargs):
        return [0.0] * len(completions)
    zero_reward.__name__ = "zero_reward"

    trainer = GRPOTrainer(bundle, tok, optimizer, cfg, [zero_reward], state,
                          jax.tree.map(jnp.copy, params))
    with pytest.warns(UserWarning, match="truncated"):
        m = trainer.step([{"prompt_ids": [5, 6, 7], "solution": "s"},
                          {"prompt_ids": [8, 9], "solution": "s"}])
    # a 4-token budget on an untrained policy: essentially every row runs
    # out before sampling EOS
    assert m["completion_truncated_frac"] > 0.5


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
    # text bundles score through the factored shared-prompt path by default
    assert trainer._shared
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


def test_grpo_reward_improves():
    """The mean reward RISES over GRPO steps on a dense reward (decoded
    character length: every completion scores differently, so every group
    has nonzero advantages and the policy gradient always has signal --
    unlike a sparse contains-token reward, which a random tiny policy hits
    with p ~ 1/vocab and therefore cannot be asserted on)."""
    tok = tiny_qwen_tokenizer()
    hf_cfg = {**TINY, "vocab_size": max(tok.vocab_size, 600)}
    bundle = make_qwen2_bundle(hf_cfg, attention="xla")
    params = bundle.init_params(jax.random.PRNGKey(3))
    optimizer, schedule = make_optimizer(
        OptimizerConfig(learning_rate=2e-2, total_steps=100,
                        warmup_ratio=0.0, schedule="constant",
                        max_grad_norm=1.0))
    state = create_train_state(params, optimizer)
    ref_params = jax.tree.map(jnp.copy, params)

    cfg = GRPOConfig(
        num_generations=4, beta=0.0, temperature=1.0, top_k=0, top_p=1.0,
        max_prompt_length=8, max_completion_length=4,
    )

    def length_reward(completions, **kwargs):
        return [len(c[0]["content"]) / 10.0 for c in completions]
    length_reward.__name__ = "length"

    trainer = GRPOTrainer(
        bundle, tok, optimizer, cfg, [length_reward], state, ref_params,
        schedule=schedule,
    )
    prompt_ids = tok.encode("Are there any defects",
                            add_special_tokens=False)[:6]
    examples = [
        {"prompt_ids": prompt_ids, "solution": ""},
        {"prompt_ids": prompt_ids[:4], "solution": ""},
        {"prompt_ids": prompt_ids[:5], "solution": ""},
        {"prompt_ids": prompt_ids[1:], "solution": ""},
    ]
    metrics = [trainer.step(examples) for _ in range(24)]
    rewards = [m["reward"] for m in metrics]
    assert np.isfinite(rewards).all()
    first = float(np.mean(rewards[:6]))
    last = float(np.mean(rewards[-6:]))
    assert last > first, (
        f"GRPO did not improve the dense reward: {first:.3f} -> {last:.3f} "
        f"({rewards})")


def test_grpo_loss_types_and_clipping():
    """Upstream-trl GRPO features (grpo_trainer.py:1182-1234): loss_type
    grpo/bnpo/dr_grpo reductions and epsilon ratio clipping with
    old_logps."""
    import optax

    from iadr1_tpu.train.grpo import make_grpo_update_step
    from iadr1_tpu.train.state import create_train_state

    bundle = make_qwen2_bundle(TINY, attention="xla")
    params = bundle.init_params(jax.random.PRNGKey(0))
    optimizer = optax.sgd(1e-3)
    n, G, P, N = 2, 2, 8, 4
    rng = np.random.default_rng(0)
    comp_mask = np.ones((n * G, N), np.int32)
    comp_mask[0, 2:] = 0   # ragged completions exercise the reductions
    batch = {
        "input_ids": jnp.asarray(rng.integers(5, 500, (n * G, P + N)),
                                 jnp.int32),
        "segment_ids": jnp.ones((n * G, P + N), jnp.int32),
        "position_ids": jnp.asarray(
            np.broadcast_to(np.arange(P + N), (n * G, P + N)).copy(),
            jnp.int32),
        "completion_ids": jnp.asarray(
            rng.integers(5, 500, (n * G, N)), jnp.int32),
        "completion_mask": jnp.asarray(comp_mask),
        "advantages": jnp.asarray([1.0, -1.0, 0.5, -0.5], jnp.float32),
        "prompt_len": P,
    }
    losses = {}
    for loss_type in ("grpo", "bnpo", "dr_grpo"):
        cfg = GRPOConfig(num_generations=G, beta=0.0, loss_type=loss_type,
                         max_completion_length=N, logp_chunk_size=32,
                         shared_prompt_scoring=False)
        step = make_grpo_update_step(bundle_score_fn(bundle), optimizer, cfg)
        state = create_train_state(jax.tree.map(jnp.copy, params), optimizer)
        _, m = step(state, jax.tree.map(jnp.copy, params), batch)
        losses[loss_type] = float(m["loss"])
        # on-policy: ratio == 1 everywhere, nothing clips
        assert float(m["clip_ratio"]) == 0.0
        assert np.isfinite(losses[loss_type])
    # reductions genuinely differ on ragged masks
    assert losses["grpo"] != losses["bnpo"]
    assert losses["bnpo"] != losses["dr_grpo"]
    # dr_grpo divides by B*max_len >= total valid tokens
    assert abs(losses["dr_grpo"]) <= abs(losses["bnpo"]) + 1e-9

    # off-policy: old_logps far from current -> clipping engages
    cfg = GRPOConfig(num_generations=G, beta=0.0, epsilon=0.2,
                     max_completion_length=N, logp_chunk_size=32,
                     shared_prompt_scoring=False)
    step = make_grpo_update_step(bundle_score_fn(bundle), optimizer, cfg)
    state = create_train_state(jax.tree.map(jnp.copy, params), optimizer)
    old = jnp.full((n * G, N), -20.0, jnp.float32)  # tiny old prob -> huge ratio
    _, m = step(state, jax.tree.map(jnp.copy, params),
                {**batch, "old_logps": old})
    assert float(m["clip_ratio"]) > 0.5


def test_grpo_trainer_mu_iterations():
    """num_iterations > 1 snapshots generation-time logps and takes mu
    update passes per rollout (trl num_iterations)."""
    tok = tiny_qwen_tokenizer()
    hf_cfg = {**TINY, "vocab_size": max(tok.vocab_size, 600)}
    bundle = make_qwen2_bundle(hf_cfg, attention="xla")
    params = bundle.init_params(jax.random.PRNGKey(0))
    optimizer, schedule = make_optimizer(
        OptimizerConfig(learning_rate=5e-3, total_steps=30, warmup_ratio=0.0,
                        max_grad_norm=1.0))
    state = create_train_state(params, optimizer)
    ref_params = jax.tree.map(jnp.copy, params)
    cfg = GRPOConfig(num_generations=2, beta=0.02, temperature=1.0,
                     top_k=0, top_p=1.0, max_prompt_length=8,
                     max_completion_length=4, num_iterations=2)
    trainer = GRPOTrainer(
        bundle, tok, optimizer, cfg,
        [_reward_contains_token(tok.decode([33]))], state, ref_params,
        schedule=schedule)
    prompt_ids = tok.encode("Are there any defects",
                            add_special_tokens=False)[:6]
    examples = [{"prompt_ids": prompt_ids, "solution": "x"},
                {"prompt_ids": prompt_ids[:4], "solution": "y"}]
    m1 = trainer.step(examples)
    m2 = trainer.step(examples)
    assert np.isfinite(m1["loss"]) and np.isfinite(m2["loss"])
    # two updates per rollout step
    assert int(trainer.state.step) == 4
    assert "clip_ratio" in m1
