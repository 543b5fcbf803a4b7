"""LLaVA-1.5 and LLaVA-NeXT parity vs HF transformers on tiny configs."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # torch HF model build + logits parity

import jax
import jax.numpy as jnp

from iadr1_tpu.core.precision import FULL_PRECISION
from iadr1_tpu.models.params_io import hf_state_from_torch
from iadr1_tpu.models.registry import make_llava_bundle

TILE = 56  # tiny "336": 4x4 grid of 14px patches
VISION = dict(
    hidden_size=32, intermediate_size=64, num_hidden_layers=3,
    num_attention_heads=4, image_size=TILE, patch_size=14,
    # CLIP-family defaults
    hidden_act="quick_gelu", layer_norm_eps=1e-5,
)
TEXT = dict(
    vocab_size=160, hidden_size=48, intermediate_size=96,
    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    rope_theta=10000.0, rms_norm_eps=1e-6, tie_word_embeddings=False,
)
PINPOINTS = [[56, 112], [112, 56], [112, 112], [56, 168]]


def _image(w, h, seed=0):
    from PIL import Image

    rng = np.random.default_rng(seed)
    return Image.fromarray(rng.integers(0, 255, (h, w, 3), np.uint8))


@pytest.fixture(scope="module")
def llava15():
    torch = pytest.importorskip("torch")
    from transformers import LlavaConfig, LlavaForConditionalGeneration

    torch.manual_seed(0)
    hf = LlavaForConditionalGeneration(LlavaConfig(
        vision_config=dict(VISION),
        text_config=dict(**TEXT, model_type="llama",
                         attention_bias=False, attention_dropout=0.0),
        image_token_index=7,
        vision_feature_layer=-2,
        vision_feature_select_strategy="default",
    )).eval()
    cfg_dict = dict(
        architectures=["LlavaForConditionalGeneration"],
        text_config=TEXT, vision_config=VISION,
        image_token_index=7, vision_feature_layer=-2,
        vision_feature_select_strategy="default",
    )
    bundle = make_llava_bundle(cfg_dict, attention="xla",
                               precision=FULL_PRECISION)
    params = bundle.convert_hf(hf_state_from_torch(hf))
    return hf, bundle, params


def test_llava15_preprocess_matches_hf(llava15):
    from transformers import CLIPImageProcessor

    from iadr1_tpu.vision.anyres import clip_resize_center_crop

    img = _image(90, 70, seed=0)
    proc = CLIPImageProcessor(
        size={"shortest_edge": TILE}, crop_size={"height": TILE, "width": TILE}
    )
    hf_pix = proc(images=[img], return_tensors="np")["pixel_values"][0]
    ours = clip_resize_center_crop(img, TILE)
    np.testing.assert_allclose(ours, hf_pix, rtol=2e-5, atol=2e-5)


def test_llava15_full_forward_parity(llava15):
    import torch

    hf, bundle, params = llava15
    img = _image(80, 60, seed=1)
    patches, grid, seqlen = bundle.preprocess_image(img)
    assert seqlen == 16

    ids = [1, 2] + [7] * seqlen + [3, 4]
    input_ids = np.asarray([ids])

    from transformers import CLIPImageProcessor

    proc = CLIPImageProcessor(
        size={"shortest_edge": TILE}, crop_size={"height": TILE, "width": TILE}
    )
    pix = proc(images=[img], return_tensors="pt")["pixel_values"]
    with torch.no_grad():
        hf_out = hf(input_ids=torch.tensor(input_ids),
                    pixel_values=pix).logits.numpy()

    arrays = bundle.vision_arrays(input_ids, [patches], [grid],
                                  patch_budget=16)
    batch = {
        "input_ids": jnp.asarray(input_ids, jnp.int32),
        "position_ids": jnp.asarray(
            np.broadcast_to(np.arange(len(ids)), (1, len(ids))).copy(),
            jnp.int32),
        **{k: jnp.asarray(v) for k, v in arrays.items()},
    }
    ours = np.asarray(bundle.forward(params, batch, remat=False))
    np.testing.assert_allclose(ours, hf_out, rtol=5e-4, atol=5e-4)


@pytest.fixture(scope="module")
def llava_next():
    torch = pytest.importorskip("torch")
    from transformers import LlavaNextConfig, LlavaNextForConditionalGeneration

    torch.manual_seed(1)
    hf = LlavaNextForConditionalGeneration(LlavaNextConfig(
        vision_config=dict(VISION),
        text_config=dict(**TEXT, model_type="llama",
                         attention_bias=False, attention_dropout=0.0),
        image_token_index=7,
        vision_feature_layer=-2,
        vision_feature_select_strategy="default",
        image_grid_pinpoints=PINPOINTS,
    )).eval()
    cfg_dict = dict(
        architectures=["LlavaNextForConditionalGeneration"],
        text_config=TEXT, vision_config=VISION,
        image_token_index=7, vision_feature_layer=-2,
        vision_feature_select_strategy="default",
        image_grid_pinpoints=PINPOINTS,
    )
    bundle = make_llava_bundle(cfg_dict, attention="xla",
                               precision=FULL_PRECISION)
    params = bundle.convert_hf(hf_state_from_torch(hf))
    return hf, bundle, params


def test_llava_next_full_forward_parity(llava_next):
    import torch

    hf, bundle, params = llava_next
    img = _image(100, 60, seed=2)
    patches, grid, seqlen = bundle.preprocess_image(img)

    ids = [1, 2] + [7] * seqlen + [3, 4]
    input_ids = np.asarray([ids])

    from transformers import LlavaNextImageProcessor

    proc = LlavaNextImageProcessor(
        size={"shortest_edge": TILE},
        crop_size={"height": TILE, "width": TILE},
        image_grid_pinpoints=PINPOINTS,
    )
    hf_pix = proc(images=[img], return_tensors="pt")
    with torch.no_grad():
        hf_out = hf(
            input_ids=torch.tensor(input_ids),
            pixel_values=hf_pix["pixel_values"],
            image_sizes=hf_pix["image_sizes"],
        ).logits.numpy()

    arrays = bundle.vision_arrays(input_ids, [patches], [grid],
                                  patch_budget=patches.shape[0] * 16)
    batch = {
        "input_ids": jnp.asarray(input_ids, jnp.int32),
        "position_ids": jnp.asarray(
            np.broadcast_to(np.arange(len(ids)), (1, len(ids))).copy(),
            jnp.int32),
        **{k: jnp.asarray(v) for k, v in arrays.items()},
    }
    ours = np.asarray(bundle.forward(params, batch, remat=False))
    np.testing.assert_allclose(ours, hf_out, rtol=6e-4, atol=6e-4)
