"""Qwen2-VL parity vs HF transformers on a random tiny config:
image preprocessing, vision tower, M-RoPE grids, and full VLM forward."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # torch HF model build + logits parity

import jax
import jax.numpy as jnp

from iadr1_tpu.core.precision import FULL_PRECISION
from iadr1_tpu.models import qwen2, qwen2_vl
from iadr1_tpu.models.params_io import hf_state_from_torch
from iadr1_tpu.vision import preprocess as vp
from iadr1_tpu.vision.mrope import get_mrope_positions

VISION = dict(
    depth=2, embed_dim=32, hidden_size=48, num_heads=4, in_channels=3,
    patch_size=14, spatial_merge_size=2, temporal_patch_size=2,
)
TEXT = dict(
    vocab_size=160, hidden_size=48, intermediate_size=96,
    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    rope_theta=10000.0, rms_norm_eps=1e-6, tie_word_embeddings=False,
)
IMAGE_TOKEN = 151655 % 160  # tiny vocab; we use explicit small ids below
IDS = dict(
    image_token_id=7, video_token_id=8, vision_start_token_id=5,
    vision_end_token_id=6,
)


@pytest.fixture(scope="module")
def hf_model():
    torch = pytest.importorskip("torch")
    from transformers import Qwen2VLConfig as HFConfig
    from transformers import Qwen2VLForConditionalGeneration

    torch.manual_seed(0)
    cfg = HFConfig(
        vision_config=dict(**VISION),
        text_config=dict(
            **TEXT, attention_dropout=0.0, max_position_embeddings=512,
            rope_scaling={"type": "mrope", "mrope_section": [2, 2, 2]},
        ),
        **IDS,
    )
    return Qwen2VLForConditionalGeneration(cfg).eval()


@pytest.fixture(scope="module")
def jax_setup(hf_model):
    vcfg = qwen2_vl.Qwen2VLVisionConfig(**VISION)
    tcfg = qwen2.Qwen2Config(**TEXT, mrope_section=(2, 2, 2),
                             max_position_embeddings=512)
    cfg = qwen2_vl.Qwen2VLConfig(text=tcfg, vision=vcfg, **IDS)
    params = qwen2_vl.convert_hf(hf_state_from_torch(hf_model), cfg)
    return cfg, params


def _fake_image(w, h, seed=0):
    from PIL import Image

    rng = np.random.default_rng(seed)
    return Image.fromarray(rng.integers(0, 255, (h, w, 3), np.uint8))


def test_preprocess_matches_hf_processor():
    from transformers import Qwen2VLImageProcessor

    img = _fake_image(120, 90)
    proc = Qwen2VLImageProcessor(min_pixels=56 * 56, max_pixels=28 * 28 * 64)
    hf_out = proc(images=[img], return_tensors="np")
    flat, grid = vp.qwen2vl_preprocess(
        img, min_pixels=56 * 56, max_pixels=28 * 28 * 64
    )
    np.testing.assert_array_equal(
        np.asarray(grid), hf_out["image_grid_thw"][0]
    )
    np.testing.assert_allclose(
        flat, hf_out["pixel_values"], rtol=2e-5, atol=2e-5
    )


def test_vision_tower_parity(hf_model, jax_setup):
    import torch

    cfg, params = jax_setup
    img = _fake_image(112, 84, seed=1)
    flat, grid = vp.qwen2vl_preprocess(img, min_pixels=56 * 56,
                                       max_pixels=28 * 28 * 256)
    grid_thw = np.asarray([grid])

    with torch.no_grad():
        hf_feats = hf_model.model.visual(
            torch.tensor(flat), grid_thw=torch.tensor(grid_thw)
        ).numpy()

    cos, sin = vp.vision_rotary_tables(grid_thw, cfg.vision.head_dim)
    segs = vp.vision_segment_ids(grid_thw)
    feats = qwen2_vl.apply_vision(
        params["vision"], cfg.vision, jnp.asarray(flat),
        jnp.asarray(cos), jnp.asarray(sin), jnp.asarray(segs),
        precision=FULL_PRECISION,
    )
    np.testing.assert_allclose(np.asarray(feats), hf_feats, rtol=3e-4, atol=3e-4)


def test_vision_tower_padding_invariance(jax_setup):
    # padding the patch stream must not change real features
    cfg, params = jax_setup
    img = _fake_image(56, 56, seed=2)
    flat, grid = vp.qwen2vl_preprocess(img)
    grid_thw = np.asarray([grid])
    cos, sin = vp.vision_rotary_tables(grid_thw, cfg.vision.head_dim)
    segs = vp.vision_segment_ids(grid_thw)
    n = flat.shape[0]

    feats = qwen2_vl.apply_vision(
        params["vision"], cfg.vision, jnp.asarray(flat),
        jnp.asarray(cos), jnp.asarray(sin), jnp.asarray(segs),
        precision=FULL_PRECISION,
    )

    pad_to = n + 32
    flat_p = np.concatenate([flat, np.zeros((32, flat.shape[1]), np.float32)])
    cos_p = np.concatenate([cos, np.ones((32, cos.shape[1]), np.float32)])
    sin_p = np.concatenate([sin, np.zeros((32, sin.shape[1]), np.float32)])
    segs_p = vp.vision_segment_ids(grid_thw, pad_to=pad_to)
    feats_p = qwen2_vl.apply_vision(
        params["vision"], cfg.vision, jnp.asarray(flat_p),
        jnp.asarray(cos_p), jnp.asarray(sin_p), jnp.asarray(segs_p),
        precision=FULL_PRECISION,
    )
    np.testing.assert_allclose(
        np.asarray(feats_p)[: n // 4], np.asarray(feats), rtol=1e-5, atol=1e-5
    )


def _build_mm_inputs(grid):
    """input_ids with a vision span: [1 2 <vs> <pad>*n <ve> 3 4]"""
    n_feats = int(np.prod(grid)) // 4
    ids = [1, 2, IDS["vision_start_token_id"]] + [IDS["image_token_id"]] * n_feats + [
        IDS["vision_end_token_id"], 3, 4,
    ]
    return np.asarray([ids])


def test_mrope_positions_match_hf(hf_model):
    import torch

    grid = (1, 4, 6)
    input_ids = _build_mm_inputs(grid)
    grid_thw = np.asarray([grid])

    hf_pos, hf_delta = hf_model.model.get_rope_index(
        torch.tensor(input_ids), image_grid_thw=torch.tensor(grid_thw)
    )
    pos, delta = get_mrope_positions(
        input_ids, grid_thw, IDS["image_token_id"], IDS["vision_start_token_id"]
    )
    np.testing.assert_array_equal(pos, hf_pos.numpy())
    np.testing.assert_array_equal(delta, hf_delta.numpy().squeeze(1))


def test_mrope_with_left_padding(hf_model):
    import torch

    grid = (1, 2, 2)
    core = _build_mm_inputs(grid)[0]
    pad = 3
    input_ids = np.asarray([[0] * pad + list(core)])
    mask = np.asarray([[0] * pad + [1] * len(core)])
    grid_thw = np.asarray([grid])

    hf_pos, hf_delta = hf_model.model.get_rope_index(
        torch.tensor(input_ids), image_grid_thw=torch.tensor(grid_thw),
        attention_mask=torch.tensor(mask),
    )
    pos, delta = get_mrope_positions(
        input_ids, grid_thw, IDS["image_token_id"],
        IDS["vision_start_token_id"], attention_mask=mask,
    )
    np.testing.assert_array_equal(pos, hf_pos.numpy())
    np.testing.assert_array_equal(delta, hf_delta.numpy().squeeze(1))


def test_full_vlm_forward_parity(hf_model, jax_setup):
    import torch

    cfg, params = jax_setup
    img = _fake_image(56, 84, seed=3)
    flat, grid = vp.qwen2vl_preprocess(img)
    grid_thw = np.asarray([grid])
    input_ids = _build_mm_inputs(grid)

    pos, _ = get_mrope_positions(
        input_ids, grid_thw, IDS["image_token_id"], IDS["vision_start_token_id"]
    )
    with torch.no_grad():
        hf_out = hf_model(
            input_ids=torch.tensor(input_ids),
            pixel_values=torch.tensor(flat),
            image_grid_thw=torch.tensor(grid_thw),
            position_ids=torch.tensor(pos),
        ).logits.numpy()
    cos, sin = vp.vision_rotary_tables(grid_thw, cfg.vision.head_dim)
    segs = vp.vision_segment_ids(grid_thw)
    rows, cols = np.nonzero(input_ids == IDS["image_token_id"])

    h, _ = qwen2_vl.apply(
        params, cfg, jnp.asarray(input_ids), jnp.asarray(pos),
        patches=jnp.asarray(flat), rot_cos=jnp.asarray(cos),
        rot_sin=jnp.asarray(sin), vision_segments=jnp.asarray(segs),
        scatter_rows=jnp.asarray(rows), scatter_cols=jnp.asarray(cols),
        precision=FULL_PRECISION,
    )
    ours = np.asarray(qwen2_vl.logits(params, cfg, h, FULL_PRECISION))
    np.testing.assert_allclose(ours, hf_out, rtol=4e-4, atol=4e-4)
