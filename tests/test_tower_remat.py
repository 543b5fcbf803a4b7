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


def test_qwen2vl_bundle_tower_remat_step_parity():
    from iadr1_tpu.models.registry import bundle_from_hf_config
    from iadr1_tpu.vision import preprocess as vp
    from iadr1_tpu.vision.mrope import get_mrope_positions

    hf = dict(
        architectures=["Qwen2VLForConditionalGeneration"],
        text_config=dict(
            vocab_size=512, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, rms_norm_eps=1e-6, rope_theta=1e6,
            tie_word_embeddings=True,
            rope_scaling={"type": "mrope", "mrope_section": [4, 6, 6]},
        ),
        vision_config=dict(depth=2, embed_dim=64, hidden_size=64,
                           num_heads=4, patch_size=14, spatial_merge_size=2,
                           temporal_patch_size=2),
        image_token_id=7, video_token_id=8,
        vision_start_token_id=5, vision_end_token_id=6,
    )
    bundle = bundle_from_hf_config(hf, attention="xla")
    rng = np.random.default_rng(0)
    grid = (1, 4, 4)
    n_feats = 16 // 4
    B, T = 2, 32
    ids = np.full((B, T), 1, np.int64)
    for b in range(B):
        ids[b, 1] = 5
        ids[b, 2:2 + n_feats] = 7
        ids[b, 2 + n_feats] = 6
        ids[b, 3 + n_feats:] = rng.integers(10, 512, T - 3 - n_feats)
    grid_thw = np.asarray([grid] * B)
    pos, _ = get_mrope_positions(ids, grid_thw, 7, 5)
    cos, sin = vp.vision_rotary_tables(grid_thw, 64 // 4)
    segs = vp.vision_segment_ids(grid_thw)
    rows, cols = np.nonzero(ids == 7)
    patches = rng.standard_normal((B * 16, 3 * 2 * 14 * 14)).astype(np.float32)
    batch = {
        "input_ids": jnp.asarray(ids, jnp.int32),
        "position_ids": jnp.asarray(pos, jnp.int32),
        "segment_ids": jnp.ones((B, T), jnp.int32),
        "patches": jnp.asarray(patches),
        "rot_cos": jnp.asarray(cos), "rot_sin": jnp.asarray(sin),
        "vision_segments": jnp.asarray(segs),
        "scatter_rows": jnp.asarray(rows, jnp.int32),
        "scatter_cols": jnp.asarray(cols, jnp.int32),
    }
    params = bundle.init_params(jax.random.PRNGKey(0))

    def hidden_sum(mode):
        h = jax.jit(lambda p, b: bundle.hidden_fn(
            p, b, remat=True, tower_remat=mode))(params, batch)
        return float(jnp.sum(h.astype(jnp.float32) ** 2))

    assert hidden_sum("save_acts") == pytest.approx(hidden_sum(False),
                                                    rel=1e-6)


def test_internvl_bundle_tower_remat_step_parity():
    from PIL import Image

    from iadr1_tpu.models.registry import bundle_from_hf_config

    hf = dict(
        architectures=["InternVLForConditionalGeneration"],
        text_config=dict(vocab_size=512, hidden_size=64,
                         intermediate_size=128, num_hidden_layers=2,
                         num_attention_heads=4, num_key_value_heads=2,
                         rope_theta=1e4, tie_word_embeddings=True),
        vision_config=dict(hidden_size=32, intermediate_size=64,
                           num_hidden_layers=2, num_attention_heads=4,
                           image_size=[56, 56], patch_size=[14, 14],
                           layer_norm_eps=1e-6, attention_bias=True,
                           use_qk_norm=False, norm_type="layer_norm"),
        image_token_id=7, downsample_ratio=0.5,
    )
    bundle = bundle_from_hf_config(hf, attention="xla")
    img = Image.fromarray((np.random.default_rng(0).random((64, 64, 3))
                           * 255).astype(np.uint8))
    patches, grid, seqlen = bundle.preprocess_image(img)
    T = 32
    rng = np.random.default_rng(1)
    ids = rng.integers(10, 512, (2, T))
    ids[:, 1:1 + seqlen] = 7
    rows, cols = np.nonzero(ids == 7)
    batch = {
        "input_ids": jnp.asarray(ids, jnp.int32),
        "position_ids": jnp.asarray(
            np.broadcast_to(np.arange(T), (2, T)).copy(), jnp.int32),
        "segment_ids": jnp.ones((2, T), jnp.int32),
        "tiles": jnp.asarray(np.concatenate([patches, patches]), jnp.float32),
        "scatter_rows": jnp.asarray(rows, jnp.int32),
        "scatter_cols": jnp.asarray(cols, jnp.int32),
    }
    params = bundle.init_params(jax.random.PRNGKey(0))

    def hidden_sum(mode):
        h = jax.jit(lambda p, b: bundle.hidden_fn(
            p, b, remat=True, tower_remat=mode))(params, batch)
        return float(jnp.sum(h.astype(jnp.float32) ** 2))

    assert hidden_sum("save_acts") == pytest.approx(hidden_sum(False),
                                                    rel=1e-6)
