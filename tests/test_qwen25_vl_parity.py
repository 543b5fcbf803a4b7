"""Qwen2.5-VL parity vs HF transformers: windowed vision tower (with window
padding + full-attention blocks) and full VLM forward."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # torch HF model build + logits parity

import jax
import jax.numpy as jnp

from iadr1_tpu.core.precision import FULL_PRECISION
from iadr1_tpu.models import qwen2, qwen25_vl
from iadr1_tpu.models.params_io import hf_state_from_torch
from iadr1_tpu.vision import preprocess as vp
from iadr1_tpu.vision.mrope import get_mrope_positions

VISION = dict(
    depth=3, hidden_size=32, intermediate_size=64, out_hidden_size=48,
    num_heads=4, in_channels=3, patch_size=14, spatial_merge_size=2,
    temporal_patch_size=2, window_size=56, fullatt_block_indexes=[1],
)
TEXT = dict(
    vocab_size=160, hidden_size=48, intermediate_size=96,
    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    rope_theta=10000.0, rms_norm_eps=1e-6, tie_word_embeddings=False,
)
IDS = dict(
    image_token_id=7, video_token_id=8, vision_start_token_id=5,
    vision_end_token_id=6,
)


@pytest.fixture(scope="module")
def hf_model():
    torch = pytest.importorskip("torch")
    from transformers import Qwen2_5_VLConfig, Qwen2_5_VLForConditionalGeneration

    torch.manual_seed(0)
    cfg = Qwen2_5_VLConfig(
        vision_config=dict(**VISION),
        text_config=dict(
            **TEXT, attention_dropout=0.0, max_position_embeddings=512,
            rope_scaling={"type": "mrope", "mrope_section": [2, 2, 2]},
        ),
        **IDS,
    )
    return Qwen2_5_VLForConditionalGeneration(cfg).eval()


@pytest.fixture(scope="module")
def jax_setup(hf_model):
    vcfg = qwen25_vl.Qwen25VLVisionConfig(
        **{**VISION, "fullatt_block_indexes": tuple(VISION["fullatt_block_indexes"])}
    )
    tcfg = qwen2.Qwen2Config(**TEXT, mrope_section=(2, 2, 2),
                             max_position_embeddings=512)
    cfg = qwen25_vl.Qwen25VLConfig(text=tcfg, vision=vcfg, **IDS)
    params = qwen25_vl.convert_hf(hf_state_from_torch(hf_model), cfg)
    return cfg, params


def _image(w, h, seed):
    from PIL import Image

    rng = np.random.default_rng(seed)
    return Image.fromarray(rng.integers(0, 255, (h, w, 3), np.uint8))


def test_window_partition_matches_hf(hf_model, jax_setup):
    import torch

    cfg, _ = jax_setup
    grid_thw = np.asarray([[1, 8, 6]])
    hf_idx, hf_cu = hf_model.model.visual.get_window_index(
        torch.tensor(grid_thw)
    )
    perm, window_segs, feature_order = qwen25_vl.window_partition(
        grid_thw, cfg.vision
    )
    np.testing.assert_array_equal(feature_order, hf_idx.numpy())


@pytest.mark.parametrize("size", [(112, 84), (56, 56)])
def test_vision_tower_parity(hf_model, jax_setup, size):
    import torch

    cfg, params = jax_setup
    img = _image(*size, seed=1)
    flat, grid = vp.qwen2vl_preprocess(img, min_pixels=56 * 56,
                                       max_pixels=28 * 28 * 256)
    grid_thw = np.asarray([grid])

    with torch.no_grad():
        hf_feats = hf_model.model.visual(
            torch.tensor(flat), grid_thw=torch.tensor(grid_thw)
        ).numpy()

    arrs = qwen25_vl.qwen25vl_vision_arrays(grid_thw, cfg.vision)
    feats = qwen25_vl.apply_vision(
        params["vision"], cfg.vision,
        jnp.asarray(flat[arrs["patch_perm"]]),
        jnp.asarray(arrs["rot_cos"]), jnp.asarray(arrs["rot_sin"]),
        jnp.asarray(arrs["full_segs"]), jnp.asarray(arrs["window_segs"]),
        precision=FULL_PRECISION,
    )
    # our features are in window order; HF reverses to reading order
    ours = np.asarray(feats)[np.argsort(arrs["feature_order"])]
    np.testing.assert_allclose(ours, hf_feats, rtol=3e-4, atol=3e-4)


def test_full_vlm_forward_parity(hf_model, jax_setup):
    import torch

    cfg, params = jax_setup
    img = _image(112, 84, seed=2)
    flat, grid = vp.qwen2vl_preprocess(img)
    grid_thw = np.asarray([grid])
    n_feats = int(np.prod(grid)) // 4
    ids = [1, 2, IDS["vision_start_token_id"]] + [IDS["image_token_id"]] * n_feats
    ids += [IDS["vision_end_token_id"], 3, 4]
    input_ids = np.asarray([ids])
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

    arrs = qwen25_vl.qwen25vl_vision_arrays(grid_thw, cfg.vision)
    rows, cols = np.nonzero(input_ids == IDS["image_token_id"])
    # features come out in window order: feature i lands at the slot of
    # reading-order position feature_order[i]
    srows = rows[arrs["feature_order"]]
    scols = cols[arrs["feature_order"]]

    h, _ = qwen25_vl.apply(
        params, cfg, jnp.asarray(input_ids), jnp.asarray(pos),
        patches=jnp.asarray(flat[arrs["patch_perm"]]),
        rot_cos=jnp.asarray(arrs["rot_cos"]),
        rot_sin=jnp.asarray(arrs["rot_sin"]),
        full_segs=jnp.asarray(arrs["full_segs"]),
        window_segs=jnp.asarray(arrs["window_segs"]),
        scatter_rows=jnp.asarray(srows), scatter_cols=jnp.asarray(scols),
        precision=FULL_PRECISION,
    )
    ours = np.asarray(qwen25_vl.logits(params, cfg, h, FULL_PRECISION))
    np.testing.assert_allclose(ours, hf_out, rtol=5e-4, atol=5e-4)
