"""Pixtral end-to-end parity vs HF.

Round-4 VERDICT listed Pixtral among the consciously-omitted towers
(plugin/template data plane only).  models/pixtral.py now runs it
first-party: 2-D-RoPE vision tower (RMSNorm eps 1e-5, unbiased qkv/o,
no final norm) + Mistral decoder (the qwen2 module with
attention_bias=False).  The HF reference ships Pixtral as
LlavaForConditionalGeneration with a pixtral vision_config; variable
image sizes become a packed patch stream + host-precomputed meshgrid
position ids + per-image segment ids (block-diagonal attention) instead
of HF's per-image conv + python-loop mask.  These tests pin forward
logits (incl. a TWO-image row exercising the block-diagonal mask and
per-image rope restart) and greedy generate against HF on tiny random
checkpoints, pixel inputs bit-identical on both sides.
Reference: llamafactory/data/mm_plugin.py:742-805,
llamafactory/model/loader.py:186-189, HF modeling_pixtral.py.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # HF logits+generate parity (minutes)

import jax
import jax.numpy as jnp

from iadr1_tpu.core.precision import FULL_PRECISION
from iadr1_tpu.models.params_io import hf_state_from_torch
from iadr1_tpu.models.registry import bundle_from_hf_config

from test_vlm_generate_parity import (
    EOS,
    PAD,
    _compare,
    _generate_ours,
    _hf_left_padded,
    _image,
)

TEXT = dict(
    model_type="mistral", vocab_size=160, hidden_size=48,
    intermediate_size=96, num_hidden_layers=2, num_attention_heads=4,
    num_key_value_heads=2, rope_theta=10000.0, rms_norm_eps=1e-6,
    tie_word_embeddings=False, sliding_window=None,
)
VISION = dict(
    model_type="pixtral", hidden_size=32, intermediate_size=64,
    num_hidden_layers=2, num_attention_heads=4, image_size=64,
    patch_size=16, rope_theta=10000.0,
)
IMG_ID, BRK, END = 7, 150, 151
PS = 16


def _case():
    torch = pytest.importorskip("torch")
    from transformers import LlavaConfig, LlavaForConditionalGeneration

    torch.manual_seed(7)
    hf_model = LlavaForConditionalGeneration(LlavaConfig(
        vision_config=dict(VISION),
        text_config=dict(**TEXT, attention_dropout=0.0),
        image_token_index=IMG_ID, vision_feature_layer=-1,
        vision_feature_select_strategy="full",
    )).eval()
    cfg_dict = dict(
        architectures=["LlavaForConditionalGeneration"],
        text_config=dict(TEXT), vision_config=dict(VISION),
        image_token_index=IMG_ID, vision_feature_layer=-1,
        vision_feature_select_strategy="full",
    )
    bundle = bundle_from_hf_config(cfg_dict, attention="xla",
                                   precision=FULL_PRECISION)
    assert bundle.family == "pixtral"
    params = bundle.convert_hf(hf_state_from_torch(hf_model))
    return torch, hf_model, bundle, params


def _img_run(grid):
    gh, gw = grid
    run = []
    for r in range(gh):
        run += [IMG_ID] * gw + [BRK if r < gh - 1 else END]
    return run


def _pixels(pil, grid):
    from iadr1_tpu.data.mm_plugins import _normalize, _to_array

    return _normalize(_to_array(pil, (grid[0] * PS, grid[1] * PS)))


def test_pixtral_forward_two_images_matches_hf():
    """One row with TWO different-size images: the block-diagonal patch
    mask and the per-image meshgrid rope restart are the parts a packed
    single-stream wiring bug would silently break."""
    torch, hf_model, bundle, params = _case()
    pils = [_image(52, 40, seed=5), _image(30, 62, seed=6)]
    pre = [bundle.preprocess_image(p) for p in pils]
    grids = [g for _, g, _ in pre]
    assert grids[0] != grids[1]

    rng = np.random.default_rng(5)
    text = list(rng.integers(10, 149, 6))
    prompt = ([2] + text[:2] + _img_run(grids[0]) + text[2:4]
              + _img_run(grids[1]) + text[4:])
    T = len(prompt)
    ids = np.asarray([prompt], np.int64)
    budget = sum(p.shape[0] for p, _, _ in pre) + 4
    arrays = bundle.vision_arrays(ids, [p for p, _, _ in pre], grids, budget)
    batch = {
        "input_ids": jnp.asarray(ids, jnp.int32),
        "position_ids": jnp.asarray(np.arange(T)[None], jnp.int32),
        "segment_ids": jnp.ones((1, T), jnp.int32),
        **{k: jnp.asarray(v) for k, v in arrays.items()},
    }
    ours = np.asarray(jax.jit(bundle.forward)(params, batch))

    # HF: zero-pad both images onto one canvas; image_sizes recovers them
    sizes = [(g[0] * PS, g[1] * PS) for g in grids]
    H = max(s[0] for s in sizes)
    W = max(s[1] for s in sizes)
    pix = np.zeros((2, 3, H, W), np.float32)
    for i, (pil, (h, w)) in enumerate(zip(pils, sizes)):
        pix[i, :, :h, :w] = _pixels(pil, grids[i])
    with torch.no_grad():
        theirs = hf_model(
            input_ids=torch.tensor(ids),
            pixel_values=torch.tensor(pix),
            image_sizes=torch.tensor(sizes),
        ).logits.numpy()
    np.testing.assert_allclose(ours[0], theirs[0], rtol=2e-4, atol=2e-4)


def test_pixtral_generate_matches_hf():
    torch, hf_model, bundle, params = _case()
    rng = np.random.default_rng(21)
    pils = [_image(52, 40, seed=5), _image(30, 62, seed=6)]
    prompts, examples, grids = [], [], []
    for pil, text_len in zip(pils, (4, 7)):
        patches, grid, seqlen = bundle.preprocess_image(pil)
        assert seqlen == grid
        text = list(rng.integers(10, 149, text_len))
        prompt = [2] + text[:2] + _img_run(grid) + text[2:]
        prompts.append(prompt)
        grids.append(grid)
        examples.append({"prompt_ids": prompt, "patches": [patches],
                         "grid_thw": [grid]})

    P = max(len(p) for p in prompts) + 2
    N = 8
    sizes = [(g[0] * PS, g[1] * PS) for g in grids]
    H = max(s[0] for s in sizes)
    W = max(s[1] for s in sizes)
    pix = np.zeros((2, 3, H, W), np.float32)
    for i, (pil, (h, w)) in enumerate(zip(pils, sizes)):
        pix[i, :, :h, :w] = _pixels(pil, grids[i])
    ids, mask = _hf_left_padded(prompts, P)
    with torch.no_grad():
        hf_out = hf_model.generate(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask),
            pixel_values=torch.tensor(pix), image_sizes=torch.tensor(sizes),
            max_new_tokens=N, do_sample=False,
            pad_token_id=PAD, eos_token_id=EOS,
        ).numpy()[:, P:]
    budget = sum(g[0] * g[1] for g in grids) + 4
    ours = _generate_ours(bundle, params, examples, P, N, budget)
    _compare(ours, hf_out)
