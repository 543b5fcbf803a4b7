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


def test_dora_factored_norms_match_merged_oracle():
    """DoRA forward (factored column norms, models/qwen2.py _lora_dense)
    equals the explicit merged computation m * x@(W+sAB)/||W+sAB||_col."""
    import jax
    import jax.numpy as jnp

    from iadr1_tpu.models.qwen2 import _lora_dense

    rng = np.random.default_rng(0)
    IN, OUT, R, B = 16, 12, 4, 5
    x = jnp.asarray(rng.standard_normal((B, IN)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((IN, OUT)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal(OUT), jnp.float32)
    a = jnp.asarray(rng.standard_normal((IN, R)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal((R, OUT)) * 0.1, jnp.float32)
    m = jnp.asarray(rng.random(OUT) + 0.5, jnp.float32)
    scale = 2.0

    got = _lora_dense(x, w, bias, {"a": a, "b": b, "m": m}, scale)

    merged = w + scale * (a @ b)
    norm = jnp.sqrt(jnp.sum(merged**2, axis=0))
    want = (x @ merged) * (m / norm)[None, :] + bias
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_dora_init_identity_and_trains():
    """At init (B=0, m=||W||) DoRA output equals plain dense; magnitudes
    are part of the adapter pytree and move under training."""
    import jax
    import jax.numpy as jnp
    import optax

    from iadr1_tpu.models.registry import make_qwen2_bundle

    hf = dict(vocab_size=128, hidden_size=32, intermediate_size=64,
              num_hidden_layers=2, num_attention_heads=4,
              num_key_value_heads=2, rope_theta=1e4,
              tie_word_embeddings=True,
              architectures=["Qwen2ForCausalLM"])
    bundle = make_qwen2_bundle(hf, attention="xla")
    params = bundle.init_params(jax.random.PRNGKey(0))
    cfg = TuningConfig(finetuning_type="lora", lora_rank=4, use_dora=True)
    lora = init_lora_params(jax.random.PRNGKey(1), params, cfg)
    is_ab = lambda x: isinstance(x, dict) and "a" in x
    ab_leaves = [l for l in jax.tree.leaves(lora, is_leaf=is_ab) if is_ab(l)]
    assert ab_leaves and all("m" in l for l in ab_leaves)

    rng = np.random.default_rng(2)
    batch = {
        "input_ids": jnp.asarray(rng.integers(1, 128, (2, 16)), jnp.int32),
        "segment_ids": jnp.ones((2, 16), jnp.int32),
        "position_ids": jnp.asarray(
            np.broadcast_to(np.arange(16), (2, 16)).copy(), jnp.int32),
    }
    scale = cfg.lora_alpha / cfg.lora_rank
    plain = bundle.hidden_fn(params, batch, remat=False)
    dora0 = bundle.hidden_fn(params, batch, remat=False, lora=lora,
                             lora_scale=scale)
    np.testing.assert_allclose(np.asarray(dora0), np.asarray(plain),
                               rtol=3e-5, atol=3e-5)

    def loss_fn(lo):
        h = bundle.hidden_fn(params, batch, remat=False, lora=lo,
                             lora_scale=scale)
        return jnp.sum(h * h)

    g = jax.grad(loss_fn)(lora)
    g_leaves = [l for l in jax.tree.leaves(g, is_leaf=is_ab) if is_ab(l)]
    m_grads = [l["m"] for l in g_leaves]
    assert m_grads and any(float(np.abs(x).max()) > 0 for x in m_grads)


def test_pissa_init_principal_components():
    """PiSSA: residual + scale*A@B reconstructs W exactly, and the adapter
    captures the principal singular directions (residual energy ==
    tail-singular-value energy)."""
    import jax
    import jax.numpy as jnp

    from iadr1_tpu.train.adapters import pissa_init

    rng = np.random.default_rng(0)
    # synthetic low-rank-dominated kernel
    u = rng.standard_normal((32, 6))
    v = rng.standard_normal((6, 24))
    w = (u * [50, 20, 10, 1, 0.5, 0.1]) @ v
    params = {"layers": {"attn": {"q": {"kernel": jnp.asarray(w, jnp.float32)}}}}
    cfg = TuningConfig(finetuning_type="lora", lora_rank=3, lora_alpha=6.0)
    lora, residual = pissa_init(params, cfg, niter=8)

    ab = lora["layers"]["attn"]["q"]["kernel"]
    res = np.asarray(residual["layers"]["attn"]["q"]["kernel"])
    scale = cfg.lora_alpha / cfg.lora_rank
    recon = res + scale * np.asarray(ab["a"]) @ np.asarray(ab["b"])
    np.testing.assert_allclose(recon, w, rtol=1e-4, atol=1e-4)

    s = np.linalg.svd(w, compute_uv=False)
    tail = np.sqrt((s[3:] ** 2).sum())
    assert np.linalg.norm(res) <= tail * 1.05

    # dora+pissa rejected like peft
    import pytest as _pytest

    with _pytest.raises(ValueError):
        pissa_init(params, TuningConfig(finetuning_type="lora",
                                        use_dora=True, pissa_init=True))


def test_resize_embeddings():
    """Noisy-mean vocab growth with pad-to-64 (reference
    model_utils/embedding.py:38-70), tied and untied heads."""
    import jax
    import jax.numpy as jnp

    from iadr1_tpu.train.adapters import resize_embeddings

    rng = np.random.default_rng(0)
    old_v, dim = 100, 16
    embed = jnp.asarray(rng.standard_normal((old_v, dim)), jnp.float32)
    head = jnp.asarray(rng.standard_normal((dim, old_v)), jnp.float32)
    params = {"embed": {"weight": embed}, "lm_head": {"kernel": head}}
    out, padded = resize_embeddings(params, 130, jax.random.PRNGKey(0))
    assert padded == 192  # 130 padded to the next multiple of 64
    assert out["embed"]["weight"].shape == (192, dim)
    assert out["lm_head"]["kernel"].shape == (dim, 192)
    # old rows untouched; new rows centered on the old mean
    np.testing.assert_array_equal(np.asarray(out["embed"]["weight"][:old_v]),
                                  np.asarray(embed))
    new_rows = np.asarray(out["embed"]["weight"][old_v:])
    np.testing.assert_allclose(new_rows.mean(axis=0),
                               np.asarray(embed).mean(axis=0), atol=0.3)
    # no-op when the vocab already fits
    same, v = resize_embeddings(params, 80, jax.random.PRNGKey(0))
    assert v == old_v and same is params

    # nested {"text": ...} VLM layout
    nested = {"text": params, "vision": {"x": jnp.zeros(3)}}
    out2, _ = resize_embeddings(nested, 130, jax.random.PRNGKey(1))
    assert out2["text"]["embed"]["weight"].shape == (192, dim)
    assert out2["vision"]["x"].shape == (3,)


def test_pissa_convert_roundtrip():
    """residual + s*A'B' == original + s*convert(A',B') exactly (rank-2r
    concatenation; reference PissaConvertCallback semantics)."""
    import jax
    import jax.numpy as jnp

    from iadr1_tpu.train.adapters import merge_lora, pissa_convert, pissa_init

    rng = np.random.default_rng(1)
    w = rng.standard_normal((20, 14)).astype(np.float32)
    params = {"attn": {"q": {"kernel": jnp.asarray(w)}}}
    cfg = TuningConfig(finetuning_type="lora", lora_rank=3, lora_alpha=6.0)
    lora0, residual = pissa_init(params, cfg, niter=6)

    # simulate training: perturb the adapter
    trained = jax.tree.map(
        lambda x: x + 0.1 * jnp.asarray(
            np.random.default_rng(2).standard_normal(x.shape), x.dtype),
        lora0,
        is_leaf=lambda x: x is None,
    )
    converted = pissa_convert(trained, lora0)
    ab = converted["attn"]["q"]["kernel"]
    assert ab["a"].shape == (20, 6) and ab["b"].shape == (6, 14)

    scale = cfg.lora_scale
    eff_trained = (np.asarray(residual["attn"]["q"]["kernel"])
                   + scale * np.asarray(trained["attn"]["q"]["kernel"]["a"])
                   @ np.asarray(trained["attn"]["q"]["kernel"]["b"]))
    eff_converted = w + scale * np.asarray(ab["a"]) @ np.asarray(ab["b"])
    np.testing.assert_allclose(eff_converted, eff_trained, rtol=1e-5,
                               atol=1e-5)

    # merge_lora over the ORIGINAL base with a rank-2r config agrees too
    cfg2r = TuningConfig(finetuning_type="lora", lora_rank=6,
                         lora_alpha=12.0)
    merged = merge_lora(params, converted, cfg2r)
    np.testing.assert_allclose(np.asarray(merged["attn"]["q"]["kernel"]),
                               eff_trained, rtol=1e-5, atol=1e-5)
