"""InternVL parity vs HF transformers on a tiny config: tower + pixel
shuffle + projector + full VLM forward + dynamic tiling."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # torch HF model build + logits parity

import jax
import jax.numpy as jnp

from iadr1_tpu.core.precision import FULL_PRECISION
from iadr1_tpu.models.params_io import hf_state_from_torch
from iadr1_tpu.models.registry import make_internvl_bundle

TILE = 56  # tiny "448": 4x4 patches of 14px
VISION = dict(
    hidden_size=32, intermediate_size=64, num_hidden_layers=2,
    num_attention_heads=4, image_size=[TILE, TILE], patch_size=[14, 14],
    layer_norm_eps=1e-6, attention_bias=True, use_qk_norm=False,
    norm_type="layer_norm", hidden_dropout_prob=0.0, attention_dropout=0.0,
    projection_dropout=0.0, use_absolute_position_embeddings=True,
    layer_scale_init_value=0.1, use_mean_pooling=True,
)
TEXT = dict(
    vocab_size=160, hidden_size=48, intermediate_size=96,
    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    rope_theta=10000.0, rms_norm_eps=1e-6, tie_word_embeddings=False,
)
CFG_DICT = dict(
    architectures=["InternVLForConditionalGeneration"],
    text_config={**TEXT},
    vision_config={**VISION},
    image_token_id=7,
    downsample_ratio=0.5,
)


@pytest.fixture(scope="module")
def setup():
    torch = pytest.importorskip("torch")
    from transformers import InternVLConfig, InternVLForConditionalGeneration

    torch.manual_seed(0)
    hf = InternVLForConditionalGeneration(InternVLConfig(
        vision_config=dict(VISION),
        text_config=dict(**TEXT, model_type="qwen2", attention_dropout=0.0),
        image_token_id=7,
        downsample_ratio=0.5,
        vision_feature_layer=-1,
        vision_feature_select_strategy="default",
        projector_hidden_act="gelu",
    )).eval()
    bundle = make_internvl_bundle(CFG_DICT, attention="xla",
                                  precision=FULL_PRECISION)
    params = bundle.convert_hf(hf_state_from_torch(hf))
    return hf, bundle, params


def _image(w, h, seed=0):
    from PIL import Image

    rng = np.random.default_rng(seed)
    return Image.fromarray(rng.integers(0, 255, (h, w, 3), np.uint8))


def test_image_features_parity(setup):
    import torch

    hf, bundle, params = setup
    from iadr1_tpu.models import internvl
    from iadr1_tpu.vision.anyres import patchify_tiles

    img = _image(TILE, TILE, seed=0)
    tiles, n = internvl.internvl_tiles(img, TILE, 1, 1, use_thumbnail=True)
    assert n == 1
    with torch.no_grad():
        hf_feats = hf.model.get_image_features(
            torch.tensor(tiles), vision_feature_layer=-1,
            vision_feature_select_strategy="default",
        ).numpy()
    patches = patchify_tiles(tiles, 14)
    ours = internvl.image_features(
        params, bundle.cfg, jnp.asarray(patches), FULL_PRECISION
    )
    np.testing.assert_allclose(
        np.asarray(ours), hf_feats.reshape(-1, hf_feats.shape[-1]),
        rtol=3e-4, atol=3e-4,
    )


def test_full_forward_parity(setup):
    import torch

    hf, bundle, params = setup
    img = _image(100, 60, seed=1)
    patches, grid, seqlen = bundle.preprocess_image(img)
    n_tiles = patches.shape[0]
    assert seqlen == n_tiles * bundle.cfg.features_per_tile

    ids = [1, 2] + [7] * seqlen + [3, 4]
    input_ids = np.asarray([ids])
    from iadr1_tpu.models import internvl

    tiles_raw, _ = internvl.internvl_tiles(
        img, TILE, bundle.cfg.min_tiles, bundle.cfg.max_tiles
    )
    with torch.no_grad():
        hf_out = hf(
            input_ids=torch.tensor(input_ids),
            pixel_values=torch.tensor(tiles_raw),
        ).logits.numpy()

    arrays = bundle.vision_arrays(
        input_ids, [patches], [grid], patch_budget=patches.shape[0] * 16
    )
    batch = {
        "input_ids": jnp.asarray(input_ids, jnp.int32),
        "position_ids": jnp.asarray(
            np.broadcast_to(np.arange(len(ids)), (1, len(ids))).copy(),
            jnp.int32),
        **{k: jnp.asarray(v) for k, v in arrays.items()},
    }
    ours = np.asarray(bundle.forward(params, batch, remat=False))
    np.testing.assert_allclose(ours, hf_out, rtol=5e-4, atol=5e-4)


def test_tiling_grid_selection():
    from iadr1_tpu.models.internvl import optimal_tile_grid

    # wide image favors more columns
    cols, rows = optimal_tile_grid(100, 300, 56, 1, 12)
    assert cols > rows
    # square image -> square grid
    cols, rows = optimal_tile_grid(200, 200, 56, 1, 12)
    assert cols == rows
