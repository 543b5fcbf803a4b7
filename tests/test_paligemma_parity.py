"""PaliGemma end-to-end parity vs HF.

Round-4 VERDICT listed PaliGemma among the consciously-omitted towers
(plugin/template data plane only).  models/paligemma.py now runs it
first-party: SigLIP tower + linear projector + Gemma decoder (the qwen2
module with rms_norm_offset=1, gelu_pytorch_tanh, sqrt(hidden) embed
scaling) and the prefix-LM attention mask (training unmasks the
token_type_ids==0 image prefix; inference prefill unmasks the whole
block; positions are 1-indexed).  These tests pin forward logits (under
the TRAINING mask -- HF requires attention_mask + token_type_ids +
labels to enable it) and greedy generate against HF on tiny random
checkpoints, pixel inputs bit-identical on both sides.
Reference: llamafactory/data/mm_plugin.py:680-739,
llamafactory/model/loader.py:186-189 (AutoModelForVision2Seq routing),
HF modeling_paligemma.py _update_causal_mask.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # HF logits+generate parity (minutes)

import jax
import jax.numpy as jnp

from iadr1_tpu.core.precision import FULL_PRECISION
from iadr1_tpu.models.params_io import hf_state_from_torch
from iadr1_tpu.models.registry import make_paligemma_bundle

from test_vlm_generate_parity import (
    EOS,
    PAD,
    _compare,
    _generate_ours,
    _hf_left_padded,
    _image,
)

TEXT = dict(
    vocab_size=160, hidden_size=48, intermediate_size=96,
    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    head_dim=16, rope_theta=10000.0, rms_norm_eps=1e-6,
)
VISION = dict(
    hidden_size=32, intermediate_size=64, num_hidden_layers=2,
    num_attention_heads=4, image_size=28, patch_size=14,
    projection_dim=48,
)
IMG_ID = 7
SEQLEN = (28 // 14) ** 2  # 4 image tokens per image


def _case():
    torch = pytest.importorskip("torch")
    from transformers import PaliGemmaConfig, PaliGemmaForConditionalGeneration

    torch.manual_seed(3)
    hf_model = PaliGemmaForConditionalGeneration(PaliGemmaConfig(
        text_config=dict(**TEXT, attention_dropout=0.0),
        vision_config=dict(VISION),
        image_token_index=IMG_ID, projection_dim=TEXT["hidden_size"],
    )).eval()
    cfg_dict = dict(
        architectures=["PaliGemmaForConditionalGeneration"],
        text_config=dict(TEXT, tie_word_embeddings=True),
        vision_config=dict(VISION), image_token_index=IMG_ID,
    )
    bundle = make_paligemma_bundle(cfg_dict, attention="xla",
                                   precision=FULL_PRECISION)
    params = bundle.convert_hf(hf_state_from_torch(hf_model))
    return torch, hf_model, bundle, params


def _pixels(pil):
    from iadr1_tpu.data.mm_plugins import _normalize, _to_array

    return _normalize(_to_array(pil, (28, 28)),
                      mean=(0.5,) * 3, std=(0.5,) * 3)


def test_paligemma_forward_matches_hf_training_mask():
    torch, hf_model, bundle, params = _case()
    pil = _image(52, 40, seed=5)
    patches, grid, seqlen = bundle.preprocess_image(pil)
    assert seqlen == SEQLEN

    rng = np.random.default_rng(5)
    text = list(rng.integers(10, TEXT["vocab_size"], 6))
    prompt = [IMG_ID] * seqlen + [2] + text
    T = len(prompt)
    ids = np.asarray([prompt], np.int64)
    arrays = bundle.vision_arrays(ids, [patches], [grid], 2 * SEQLEN)
    batch = {
        "input_ids": jnp.asarray(ids, jnp.int32),
        "position_ids": jnp.asarray(np.arange(T)[None], jnp.int32),
        "segment_ids": jnp.ones((1, T), jnp.int32),
        **{k: jnp.asarray(v) for k, v in arrays.items()},
    }
    ours = np.asarray(jax.jit(bundle.forward)(params, batch))

    # HF only applies the prefix-LM unmask when attention_mask AND
    # token_type_ids AND labels are all present (is_training)
    tt = np.asarray([[0] * seqlen + [1] * (T - seqlen)], np.int64)
    labels = np.where(tt == 0, -100, ids)
    with torch.no_grad():
        theirs = hf_model(
            input_ids=torch.tensor(ids),
            pixel_values=torch.tensor(_pixels(pil)[None],
                                      dtype=torch.float32),
            attention_mask=torch.ones((1, T), dtype=torch.long),
            token_type_ids=torch.tensor(tt),
            labels=torch.tensor(labels),
        ).logits.numpy()
    np.testing.assert_allclose(ours[0], theirs[0], rtol=2e-4, atol=2e-4)


def test_paligemma_generate_matches_hf():
    torch, hf_model, bundle, params = _case()
    rng = np.random.default_rng(21)
    pils = [_image(52, 40, seed=5), _image(36, 60, seed=6)]
    prompts, examples, pix = [], [], []
    for pil, text_len in zip(pils, (4, 7)):
        patches, grid, seqlen = bundle.preprocess_image(pil)
        text = list(rng.integers(10, TEXT["vocab_size"], text_len))
        prompt = [IMG_ID] * seqlen + [2] + text
        prompts.append(prompt)
        examples.append({"prompt_ids": prompt, "patches": [patches],
                         "grid_thw": [grid]})
        pix.append(_pixels(pil))

    P = max(len(p) for p in prompts) + 2
    N = 8
    ids, mask = _hf_left_padded(prompts, P)
    with torch.no_grad():
        hf_out = hf_model.generate(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask),
            pixel_values=torch.tensor(np.stack(pix), dtype=torch.float32),
            max_new_tokens=N, do_sample=False,
            pad_token_id=PAD, eos_token_id=EOS,
        ).numpy()[:, P:]
    ours = _generate_ours(bundle, params, examples, P, N, 2 * 2 * SEQLEN)
    _compare(ours, hf_out)
