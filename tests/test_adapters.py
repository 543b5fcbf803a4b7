"""Tuning modes: vision-tower freeze, layer-wise freeze, LoRA training."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from iadr1_tpu.models.registry import make_qwen2_bundle, make_qwen2_vl_bundle
from iadr1_tpu.train import OptimizerConfig, make_optimizer, make_sft_step
from iadr1_tpu.train.adapters import (
    TuningConfig,
    apply_tuning,
    init_lora_params,
    make_lora_forward,
    merge_lora,
    trainable_mask,
)
from iadr1_tpu.train.state import create_train_state
from iadr1_tpu.data.tokenize import IGNORE_INDEX

TEXT = dict(
    vocab_size=128, hidden_size=64, intermediate_size=128,
    num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
    rope_theta=10000.0, tie_word_embeddings=True,
    architectures=["Qwen2ForCausalLM"],
)
VLM = dict(
    architectures=["Qwen2VLForConditionalGeneration"],
    text_config=dict(**{k: v for k, v in TEXT.items() if k != "architectures"},
                     rope_scaling={"type": "mrope", "mrope_section": [4, 2, 2]}),
    vision_config=dict(depth=2, embed_dim=32, hidden_size=64, num_heads=4,
                       patch_size=14, spatial_merge_size=2,
                       temporal_patch_size=2),
    image_token_id=7, vision_start_token_id=5, vision_end_token_id=6,
)


def _batch(B=2, T=32, vocab=128):
    rng = np.random.default_rng(0)
    ids = rng.integers(1, vocab, (B, T))
    return {
        "input_ids": jnp.asarray(ids, jnp.int32),
        "labels": jnp.asarray(ids, jnp.int32),
        "segment_ids": jnp.ones((B, T), jnp.int32),
        "position_ids": jnp.asarray(
            np.broadcast_to(np.arange(T), (B, T)).copy(), jnp.int32),
    }


def test_vision_tower_frozen():
    bundle = make_qwen2_vl_bundle(VLM, attention="xla")
    params = bundle.init_params(jax.random.PRNGKey(0))
    mask = trainable_mask(params, TuningConfig(freeze_vision_tower=True))
    assert mask["vision"]["blocks"]["attn"]["qkv"]["kernel"] is False
    assert mask["vision"]["patch_embed"]["kernel"] is False
    assert mask["vision"]["merger"]["fc1"]["kernel"] is True
    assert mask["text"]["layers"]["attn"]["q"]["kernel"] is True

    optimizer, schedule = make_optimizer(
        OptimizerConfig(learning_rate=1e-2, total_steps=5, warmup_ratio=0.0)
    )
    optimizer = apply_tuning(optimizer, params, TuningConfig())
    state = create_train_state(params, optimizer)
    step = make_sft_step(bundle.forward, optimizer, schedule)
    before = jax.tree.map(lambda x: np.asarray(x).copy(), params)
    batch = _batch()
    state, metrics = step(state, batch)
    assert np.allclose(
        before["vision"]["blocks"]["attn"]["qkv"]["kernel"],
        np.asarray(state.params["vision"]["blocks"]["attn"]["qkv"]["kernel"]),
    )
    assert not np.allclose(
        before["text"]["layers"]["mlp"]["gate"]["kernel"],
        np.asarray(state.params["text"]["layers"]["mlp"]["gate"]["kernel"]),
    )


def test_layerwise_freeze():
    bundle = make_qwen2_bundle(TEXT, attention="xla")
    params = bundle.init_params(jax.random.PRNGKey(0))
    cfg = TuningConfig(finetuning_type="freeze", freeze_trainable_layers=2)
    optimizer, schedule = make_optimizer(
        OptimizerConfig(learning_rate=1e-2, total_steps=5, warmup_ratio=0.0)
    )
    optimizer = apply_tuning(optimizer, params, cfg, num_layers=4)
    state = create_train_state(params, optimizer)
    step = make_sft_step(bundle.forward, optimizer, schedule)
    before = jax.tree.map(lambda x: np.asarray(x).copy(), params)
    state, _ = step(state, _batch())
    kern = np.asarray(state.params["layers"]["mlp"]["gate"]["kernel"])
    # first two layers frozen, last two train
    assert np.allclose(before["layers"]["mlp"]["gate"]["kernel"][:2], kern[:2])
    assert not np.allclose(before["layers"]["mlp"]["gate"]["kernel"][2:], kern[2:])


def test_lora_training():
    bundle = make_qwen2_bundle(TEXT, attention="xla")
    base = bundle.init_params(jax.random.PRNGKey(0))
    cfg = TuningConfig(finetuning_type="lora", lora_rank=4)
    lora = init_lora_params(jax.random.PRNGKey(1), base, cfg)
    n_lora = len([x for x in jax.tree.leaves(lora)])
    assert n_lora > 0

    # b starts at zero -> merged == base
    merged = merge_lora(base, lora, cfg)
    np.testing.assert_allclose(
        np.asarray(merged["layers"]["attn"]["q"]["kernel"]),
        np.asarray(base["layers"]["attn"]["q"]["kernel"]),
    )

    forward = make_lora_forward(bundle.forward, base, cfg)
    optimizer, schedule = make_optimizer(
        OptimizerConfig(learning_rate=1e-2, total_steps=10, warmup_ratio=0.0)
    )
    state = create_train_state(lora, optimizer)
    step = make_sft_step(forward, optimizer, schedule)
    batch = _batch()
    losses = []
    for _ in range(4):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]
    # lora B factors moved away from zero
    b = np.asarray(state.params["layers"]["attn"]["q"]["kernel"]["b"])
    assert np.abs(b).max() > 0


def test_factored_lora_matches_merged_forward():
    """apply(..., lora=) (factored, activation-shaped cotangents) must equal
    forward on merge_lora'd params."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from iadr1_tpu.models.registry import make_qwen2_bundle
    from iadr1_tpu.train.adapters import (
        TuningConfig, init_lora_params, merge_lora,
    )

    hf = dict(vocab_size=256, hidden_size=64, intermediate_size=128,
              num_hidden_layers=2, num_attention_heads=4,
              num_key_value_heads=2, rope_theta=1e4,
              tie_word_embeddings=True, architectures=["Qwen2ForCausalLM"])
    from iadr1_tpu.core.precision import FULL_PRECISION

    # full precision so factored-vs-merged differences are math, not bf16
    # rounding of the two different computation orders
    bundle = make_qwen2_bundle(hf, attention="xla", precision=FULL_PRECISION)
    base = bundle.init_params(jax.random.PRNGKey(0))
    tcfg = TuningConfig(finetuning_type="lora", lora_rank=4, lora_alpha=8.0)
    lora = init_lora_params(jax.random.PRNGKey(1), base, tcfg)
    # make B nonzero so the delta actually matters
    lora = jax.tree.map(lambda x: x + 0.03, lora)
    scale = tcfg.lora_alpha / tcfg.lora_rank

    rng = np.random.default_rng(0)
    B, T = 2, 16
    batch = {
        "input_ids": jnp.asarray(rng.integers(1, 250, (B, T)), jnp.int32),
        "position_ids": jnp.broadcast_to(jnp.arange(T), (B, T)),
        "segment_ids": jnp.ones((B, T), jnp.int32),
    }
    h_factored = jax.jit(
        lambda p, l, b: bundle.hidden_fn(p, b, remat=False, lora=l,
                                         lora_scale=scale)
    )(base, lora, batch)
    merged = merge_lora(base, lora, tcfg)
    h_merged = jax.jit(
        lambda p, b: bundle.hidden_fn(p, b, remat=False)
    )(merged, batch)
    np.testing.assert_allclose(
        np.asarray(h_factored), np.asarray(h_merged), atol=2e-5
    )
    # deltas are real: differs from the base-only forward
    h_base = jax.jit(lambda p, b: bundle.hidden_fn(p, b, remat=False))(base, batch)
    assert not np.allclose(np.asarray(h_factored), np.asarray(h_base))
