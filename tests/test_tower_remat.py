"""Vision-tower remat modes (round-5): remat="save_acts" checkpoint-names
the qkv/attn/fc1 activations so the replayed backward DCEs every big
matmul except the o-projection.  Gradients must be exactly those of the
unrematerialized tower for both tower implementations (SigLIP =
OneVision, CLIP = llava/llava-next/video families), and the mode must be
reachable through the bundle surface the CLI drives
(hidden_fn(tower_remat=...)).

Measured winner on v5e: +4.4% full-step throughput on the packed
OneVision SFT leg (tools/probe_vlm_perf.py, docs/validation_r5.md).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iadr1_tpu.models import clip_vit, siglip


def _grad_diff(loss_fn, params, modes):
    grads = [jax.jit(jax.grad(lambda p, m=m: loss_fn(p, m)))(params)
             for m in modes]
    return max(
        float(jnp.abs(a - b).max())
        for a, b in zip(jax.tree.leaves(grads[0]), jax.tree.leaves(grads[1]))
    )


def test_siglip_save_acts_grads_match_noremat():
    cfg = siglip.SiglipVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=4, image_size=28, patch_size=14)
    params = siglip.init_params(jax.random.PRNGKey(0), cfg)
    tiles = jnp.asarray(
        np.random.default_rng(0).standard_normal(
            (2, cfg.num_patches, cfg.patch_dim)), jnp.float32)

    def loss(p, mode):
        f = siglip.apply(p, cfg, tiles, remat=mode)
        return jnp.sum(f.astype(jnp.float32) ** 2) * 1e-3

    assert _grad_diff(loss, params, [False, "save_acts"]) < 1e-5


def test_clip_save_acts_grads_match_noremat():
    cfg = clip_vit.ClipVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=4, image_size=28, patch_size=14)
    params = clip_vit.init_params(jax.random.PRNGKey(0), cfg)
    tiles = jnp.asarray(
        np.random.default_rng(0).standard_normal(
            (2, cfg.num_patches, cfg.patch_dim)), jnp.float32)

    def loss(p, mode):
        f = clip_vit.apply(p, cfg, tiles, remat=mode)
        return jnp.sum(f.astype(jnp.float32) ** 2) * 1e-3

    # 1e-4: the checkpointed backward recomputes attention grads from the
    # saved attn OUTPUT while the unrematerialized one reuses fwd probs --
    # same math, different XLA fusion order (f32 rounding only)
    assert _grad_diff(loss, params, [False, "save_acts"]) < 1e-4


def test_onevision_bundle_tower_remat_step_parity():
    """tower_remat must flow bundle.hidden_fn -> llava_onevision.apply ->
    siglip.apply with unchanged loss (the CLI's model.tower_remat path)."""
    from PIL import Image

    from iadr1_tpu.data.collator import VLMBatchBuilder
    from iadr1_tpu.data.tokenize import IGNORE_INDEX
    from iadr1_tpu.models.registry import make_llava_onevision_bundle

    text = dict(vocab_size=512, hidden_size=64, intermediate_size=128,
                num_hidden_layers=2, num_attention_heads=4,
                num_key_value_heads=2, rope_theta=1e4,
                tie_word_embeddings=True)
    vis = dict(hidden_size=32, intermediate_size=64, num_hidden_layers=2,
               num_attention_heads=4, image_size=56, patch_size=14)
    hf = dict(architectures=["LlavaOnevisionForConditionalGeneration"],
              text_config=text, vision_config=vis, image_token_index=499,
              image_grid_pinpoints=[[56, 56], [56, 112], [112, 56]])
    bundle = make_llava_onevision_bundle(hf, attention="xla")
    rng = np.random.default_rng(0)
    img = Image.fromarray((rng.random((100, 52, 3)) * 255).astype(np.uint8))
    patches, grid, seqlen = bundle.preprocess_image(img)
    T = 128
    rows = []
    for _ in range(2):
        ids = rng.integers(10, 512, T)
        ids[1:1 + seqlen] = 499
        labels = ids.copy()
        labels[:1 + seqlen] = IGNORE_INDEX
        rows.append({"input_ids": ids, "labels": labels,
                     "segment_ids": np.ones(T, np.int64),
                     "position_ids": np.arange(T),
                     "extras": [{"patches": [patches], "grid_thw": [grid]}]})
    builder = VLMBatchBuilder(
        bundle=bundle, patch_budget=2 * patches.shape[0] * patches.shape[1])
    batch = {k: jnp.asarray(v) for k, v in builder(rows).items()}
    params = bundle.init_params(jax.random.PRNGKey(0))

    def hidden_sum(mode):
        h = jax.jit(lambda p, b: bundle.hidden_fn(
            p, b, remat=True, tower_remat=mode))(params, batch)
        return float(jnp.sum(h.astype(jnp.float32) ** 2))

    ref = hidden_sum(False)
    assert hidden_sum("save_acts") == pytest.approx(ref, rel=1e-6)
