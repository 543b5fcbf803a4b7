"""LLaVA-OneVision parity vs HF transformers: anyres tiling, feature
packing plan, and full VLM forward on a random tiny config."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # torch HF model build + logits parity

import jax
import jax.numpy as jnp

from iadr1_tpu.core.precision import FULL_PRECISION
from iadr1_tpu.models.params_io import hf_state_from_torch
from iadr1_tpu.models.registry import make_llava_onevision_bundle
from iadr1_tpu.vision import anyres

TILE = 56  # tiny "384": 4x4 grid of 14px patches
PINPOINTS = [[56, 56], [56, 112], [112, 56], [112, 112], [112, 168]]
VISION = dict(
    hidden_size=32, intermediate_size=64, num_hidden_layers=2,
    num_attention_heads=4, image_size=TILE, patch_size=14,
)
TEXT = dict(
    vocab_size=160, hidden_size=48, intermediate_size=96,
    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    rope_theta=10000.0, rms_norm_eps=1e-6, tie_word_embeddings=False,
)
HF_CONFIG = dict(
    architectures=["LlavaOnevisionForConditionalGeneration"],
    text_config=TEXT,
    vision_config=VISION,
    image_token_index=7,
    image_grid_pinpoints=PINPOINTS,
    vision_aspect_ratio="anyres_max_9",
)


@pytest.fixture(scope="module")
def hf_model():
    torch = pytest.importorskip("torch")
    from transformers import (
        LlavaOnevisionConfig,
        LlavaOnevisionForConditionalGeneration,
    )

    torch.manual_seed(0)
    cfg = LlavaOnevisionConfig(
        vision_config=dict(**VISION, hidden_act="gelu_pytorch_tanh"),
        text_config=dict(**TEXT, attention_dropout=0.0),
        image_token_index=7,
        image_grid_pinpoints=PINPOINTS,
        vision_aspect_ratio="anyres_max_9",
        vision_feature_select_strategy="full",
        vision_feature_layer=-1,
        video_token_index=8,
    )
    return LlavaOnevisionForConditionalGeneration(cfg).eval()


@pytest.fixture(scope="module")
def jax_setup(hf_model):
    bundle = make_llava_onevision_bundle(HF_CONFIG, attention="xla")
    params = bundle.convert_hf(hf_state_from_torch(hf_model))
    return bundle, params


def _image(w, h, seed=0):
    from PIL import Image

    rng = np.random.default_rng(seed)
    return Image.fromarray(rng.integers(0, 255, (h, w, 3), np.uint8))


def test_tiles_match_hf_processor():
    from transformers import LlavaOnevisionImageProcessor

    img = _image(100, 70, seed=0)
    proc = LlavaOnevisionImageProcessor(
        size={"height": TILE, "width": TILE},
        image_grid_pinpoints=PINPOINTS,
    )
    hf_out = proc(images=[img], return_tensors="np")
    tiles, grid = anyres.onevision_tiles(img, PINPOINTS, TILE)
    hf_tiles = hf_out["pixel_values"][0][: tiles.shape[0]]
    np.testing.assert_allclose(tiles, hf_tiles, rtol=2e-5, atol=2e-5)
    np.testing.assert_array_equal(hf_out["image_sizes"][0], [70, 100])


def test_pack_plan_matches_hf_pack(hf_model, jax_setup):
    import torch

    bundle, params = jax_setup
    img = _image(100, 70, seed=1)
    tiles, grid = anyres.onevision_tiles(img, PINPOINTS, TILE)
    n = tiles.shape[0]
    g = 4  # 56/14

    # random per-tile "features" after projector [n, 16, D]
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((n, g * g, TEXT["hidden_size"])).astype(np.float32)
    newline = rng.standard_normal(TEXT["hidden_size"]).astype(np.float32)

    hf_packed, lens = hf_model.model.pack_image_features(
        [torch.tensor(feats)], torch.tensor([[70, 100]]),
        image_newline=torch.tensor(newline),
        vision_aspect_ratio="anyres_max_9",
    )
    plan = anyres.onevision_pack_plan((70, 100), grid, g, 9)
    ours = anyres.pack_features_numpy(feats.reshape(-1, feats.shape[-1]),
                                      plan, newline)
    assert plan["length"] == int(lens[0])
    np.testing.assert_allclose(ours, hf_packed[0].numpy(), rtol=2e-5, atol=2e-5)


def test_full_vlm_forward_parity(hf_model, jax_setup):
    import torch

    bundle, params = jax_setup
    img = _image(100, 70, seed=2)
    patches, full_grid, seqlen = bundle.preprocess_image(img)

    ids = [1, 2] + [7] * seqlen + [3, 4]
    input_ids = np.asarray([ids])

    from transformers import LlavaOnevisionImageProcessor

    proc = LlavaOnevisionImageProcessor(
        size={"height": TILE, "width": TILE}, image_grid_pinpoints=PINPOINTS
    )
    hf_pix = proc(images=[img], return_tensors="pt")
    with torch.no_grad():
        hf_out = hf_model(
            input_ids=torch.tensor(input_ids),
            pixel_values=hf_pix["pixel_values"],
            image_sizes=hf_pix["image_sizes"],
        ).logits.numpy()

    arrays = bundle.vision_arrays(input_ids, [patches], [full_grid],
                                  patch_budget=patches.shape[0] * 16)
    batch = {
        "input_ids": jnp.asarray(input_ids, jnp.int32),
        "position_ids": jnp.asarray(
            np.broadcast_to(np.arange(len(ids)), (1, len(ids))).copy(), jnp.int32),
        **{k: jnp.asarray(v) for k, v in arrays.items()},
    }
    bundle_fp = make_llava_onevision_bundle(HF_CONFIG, attention="xla",
                                            precision=FULL_PRECISION)
    ours = np.asarray(bundle_fp.forward(params, batch, remat=False))
    np.testing.assert_allclose(ours, hf_out, rtol=5e-4, atol=5e-4)
