"""VLM decode parity: greedy RolloutEngine generate vs HF `generate` on
tiny random checkpoints for qwen2-vl, qwen2.5-vl, and llava-onevision.

Round-2 gap (VERDICT.md weak #5): the VLM decode paths (M-RoPE decode
positions, cache write/read, grouped prefill) were pinned only by
internal-consistency tests.  These pin them against HF generate — the
vLLM-vs-HF equivalence the reference assumes
(vLLM_Qwen_detect_format.py:214-230).
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # multi-family HF greedy-generate sweep (minutes)

import jax
import jax.numpy as jnp

from iadr1_tpu.cli.train_grpo import GRPODataSection, make_vlm_prompt_collator
from iadr1_tpu.data.template import get_template
from iadr1_tpu.models.params_io import hf_state_from_torch
from iadr1_tpu.models.registry import bundle_from_hf_config
from iadr1_tpu.train.rollout import RolloutEngine, SamplingConfig

PAD, EOS = 0, 1

TEXT = dict(
    vocab_size=160, hidden_size=48, intermediate_size=96,
    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    rope_theta=10000.0, rms_norm_eps=1e-6, tie_word_embeddings=False,
)
QWEN_IDS = dict(
    image_token_id=7, video_token_id=8, vision_start_token_id=5,
    vision_end_token_id=6,
)


class _Tok:
    eos_token_id = EOS
    pad_token_id = PAD


def _image(w, h, seed=0):
    from PIL import Image

    rng = np.random.default_rng(seed)
    return Image.fromarray(rng.integers(0, 255, (h, w, 3), np.uint8))


def _generate_ours(bundle, params, examples, P, N, budget):
    collator = make_vlm_prompt_collator(
        bundle, _Tok(), get_template(bundle.template),
        GRPODataSection(patch_budget=budget), P, num_generations=1,
    )
    batch = collator(examples, 1)
    engine = RolloutEngine(
        bundle,
        SamplingConfig(max_new_tokens=N, temperature=0.0,
                       eos_token_id=EOS, pad_token_id=PAD),
        max_len=P + N, cache_dtype=jnp.float32,
    )
    out = engine.generate(params, batch, jax.random.PRNGKey(0))
    return np.asarray(out["completion_ids"])


def _compare(ours, hf_new):
    for b in range(hf_new.shape[0]):
        hf_row, row = hf_new[b], ours[b]
        # up to each row's first EOS (HF pads after EOS)
        stop = len(hf_row)
        if EOS in hf_row:
            stop = int(np.argmax(hf_row == EOS)) + 1
        np.testing.assert_array_equal(
            row[:stop], hf_row[:stop], err_msg=f"row {b}"
        )


def _hf_left_padded(prompts, P):
    B = len(prompts)
    ids = np.full((B, P), PAD, np.int64)
    mask = np.zeros((B, P), np.int64)
    for i, p in enumerate(prompts):
        ids[i, P - len(p):] = p
        mask[i, P - len(p):] = 1
    return ids, mask


def _qwen_family_case(hf_cls, hf_cfg_cls, vision_cfg, mrope_section):
    torch = pytest.importorskip("torch")

    torch.manual_seed(0)
    hf_model = hf_cls(hf_cfg_cls(
        vision_config=dict(vision_cfg),
        text_config=dict(
            **TEXT, attention_dropout=0.0, max_position_embeddings=512,
            rope_scaling={"type": "mrope", "mrope_section": mrope_section},
        ),
        **QWEN_IDS,
    )).eval()
    hf_dict = dict(
        architectures=[hf_cls.__name__],
        text_config=dict(
            **TEXT, max_position_embeddings=512,
            rope_scaling={"type": "mrope", "mrope_section": mrope_section},
        ),
        vision_config=dict(vision_cfg),
        **QWEN_IDS,
    )
    bundle = bundle_from_hf_config(hf_dict, attention="xla")
    params = bundle.convert_hf(hf_state_from_torch(hf_model))

    # two prompts, different text lengths, one image each
    rng = np.random.default_rng(3)
    patches_all, grids, prompts, examples = [], [], [], []
    for i, text_len in enumerate((6, 11)):
        patches, grid, seqlen = bundle.preprocess_image(
            _image(112, 84, seed=i), min_pixels=56 * 56,
            max_pixels=28 * 28 * 256,
        )
        text = list(rng.integers(10, TEXT["vocab_size"], text_len))
        prompt = (text[:3] + [QWEN_IDS["vision_start_token_id"]]
                  + [QWEN_IDS["image_token_id"]] * seqlen
                  + [QWEN_IDS["vision_end_token_id"]] + text[3:])
        prompts.append(prompt)
        examples.append({"prompt_ids": prompt, "patches": [patches],
                         "grid_thw": [grid]})
        patches_all.append(patches)
        grids.append(grid)

    P = max(len(p) for p in prompts) + 3
    N = 8
    ids, mask = _hf_left_padded(prompts, P)
    with torch.no_grad():
        hf_out = hf_model.generate(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask),
            pixel_values=torch.tensor(np.concatenate(patches_all, axis=0)),
            image_grid_thw=torch.tensor(np.asarray(grids)),
            max_new_tokens=N, do_sample=False,
            pad_token_id=PAD, eos_token_id=EOS,
        ).numpy()[:, P:]

    budget = sum(p.shape[0] for p in patches_all)
    ours = _generate_ours(bundle, params, examples, P, N, budget)
    _compare(ours, hf_out)


def test_qwen2_vl_generate_matches_hf():
    from transformers import Qwen2VLConfig, Qwen2VLForConditionalGeneration

    _qwen_family_case(
        Qwen2VLForConditionalGeneration, Qwen2VLConfig,
        dict(depth=2, embed_dim=32, hidden_size=48, num_heads=4,
             in_channels=3, patch_size=14, spatial_merge_size=2,
             temporal_patch_size=2),
        [2, 2, 2],
    )


def test_qwen25_vl_generate_matches_hf():
    from transformers import (
        Qwen2_5_VLConfig,
        Qwen2_5_VLForConditionalGeneration,
    )

    _qwen_family_case(
        Qwen2_5_VLForConditionalGeneration, Qwen2_5_VLConfig,
        dict(depth=3, hidden_size=32, intermediate_size=64,
             out_hidden_size=48, num_heads=4, in_channels=3, patch_size=14,
             spatial_merge_size=2, temporal_patch_size=2, window_size=56,
             fullatt_block_indexes=[1]),
        [2, 2, 2],
    )


def test_llava_onevision_generate_matches_hf():
    torch = pytest.importorskip("torch")
    from transformers import (
        LlavaOnevisionConfig,
        LlavaOnevisionForConditionalGeneration,
    )

    TILE = 56
    PINPOINTS = [[56, 56], [56, 112], [112, 56], [112, 112]]
    VISION = dict(hidden_size=32, intermediate_size=64, num_hidden_layers=2,
                  num_attention_heads=4, image_size=TILE, patch_size=14)
    torch.manual_seed(0)
    hf_model = LlavaOnevisionForConditionalGeneration(LlavaOnevisionConfig(
        vision_config=dict(**VISION, hidden_act="gelu_pytorch_tanh"),
        text_config=dict(**TEXT, attention_dropout=0.0),
        image_token_index=7,
        image_grid_pinpoints=PINPOINTS,
        vision_aspect_ratio="anyres_max_9",
        vision_feature_select_strategy="full",
        vision_feature_layer=-1,
        video_token_index=8,
    )).eval()
    hf_dict = dict(
        architectures=["LlavaOnevisionForConditionalGeneration"],
        text_config=TEXT, vision_config=VISION, image_token_index=7,
        image_grid_pinpoints=PINPOINTS,
        vision_aspect_ratio="anyres_max_9",
    )
    bundle = bundle_from_hf_config(hf_dict, attention="xla")
    params = bundle.convert_hf(hf_state_from_torch(hf_model))

    from iadr1_tpu.vision import anyres

    rng = np.random.default_rng(5)
    img = _image(100, 70, seed=2)  # same size both rows: equal tile counts
    # HF generate wants raw pixel tiles [n, 3, H, W]; our engine takes the
    # packed patch-stream from preprocess_image
    hf_tiles, _ = anyres.onevision_tiles(img, PINPOINTS, TILE)
    patches, grid, seqlen = bundle.preprocess_image(img)
    prompts, examples = [], []
    for text_len in (5, 9):
        text = list(rng.integers(10, TEXT["vocab_size"], text_len))
        prompt = text[:2] + [7] * seqlen + text[2:]
        prompts.append(prompt)
        examples.append({"prompt_ids": prompt, "patches": [patches],
                         "grid_thw": [grid]})

    P = max(len(p) for p in prompts) + 2
    N = 8
    ids, mask = _hf_left_padded(prompts, P)
    pixel_values = torch.tensor(np.stack([hf_tiles, hf_tiles]))
    image_sizes = torch.tensor([[70, 100], [70, 100]])
    with torch.no_grad():
        hf_out = hf_model.generate(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask),
            pixel_values=pixel_values, image_sizes=image_sizes,
            max_new_tokens=N, do_sample=False,
            pad_token_id=PAD, eos_token_id=EOS,
        ).numpy()[:, P:]

    ours = _generate_ours(bundle, params, examples, P, N,
                          budget=2 * patches.shape[0] * patches.shape[1])
    _compare(ours, hf_out)


# --- LLaVA-1.5 / LLaVA-NeXT / InternVL (VERDICT r3 weak #2: these three
# families had logits parity only; anyres unpad ordering and cache/position
# handling in DECODE are pinned here against HF generate) ----------------

TILE = 56
CLIP_VISION = dict(
    hidden_size=32, intermediate_size=64, num_hidden_layers=3,
    num_attention_heads=4, image_size=TILE, patch_size=14,
    hidden_act="quick_gelu", layer_norm_eps=1e-5,
)
PINPOINTS = [[56, 112], [112, 56], [112, 112], [56, 168]]


def _llava_generate_case(next_mode: bool):
    torch = pytest.importorskip("torch")
    from iadr1_tpu.core.precision import FULL_PRECISION
    from iadr1_tpu.models.registry import make_llava_bundle

    torch.manual_seed(2 + int(next_mode))
    common = dict(
        vision_config=dict(CLIP_VISION),
        text_config=dict(**TEXT, model_type="llama",
                         attention_bias=False, attention_dropout=0.0),
        image_token_index=7,
        vision_feature_layer=-2,
        vision_feature_select_strategy="default",
    )
    if next_mode:
        from transformers import (
            LlavaNextConfig,
            LlavaNextForConditionalGeneration,
        )

        hf_model = LlavaNextForConditionalGeneration(LlavaNextConfig(
            **common, image_grid_pinpoints=PINPOINTS)).eval()
        arch = "LlavaNextForConditionalGeneration"
    else:
        from transformers import LlavaConfig, LlavaForConditionalGeneration

        hf_model = LlavaForConditionalGeneration(LlavaConfig(**common)).eval()
        arch = "LlavaForConditionalGeneration"

    cfg_dict = dict(
        architectures=[arch], text_config=TEXT, vision_config=CLIP_VISION,
        image_token_index=7, vision_feature_layer=-2,
        vision_feature_select_strategy="default",
    )
    if next_mode:
        cfg_dict["image_grid_pinpoints"] = PINPOINTS
    bundle = make_llava_bundle(cfg_dict, attention="xla",
                               precision=FULL_PRECISION)
    params = bundle.convert_hf(hf_state_from_torch(hf_model))

    rng = np.random.default_rng(7)
    img = _image(100, 60, seed=3)  # same size both rows: equal tile counts
    patches, grid, seqlen = bundle.preprocess_image(img)
    prompts, examples = [], []
    for text_len in (5, 9):
        text = list(rng.integers(10, TEXT["vocab_size"], text_len))
        prompt = text[:2] + [7] * seqlen + text[2:]
        prompts.append(prompt)
        examples.append({"prompt_ids": prompt, "patches": [patches],
                         "grid_thw": [grid]})

    P = max(len(p) for p in prompts) + 2
    N = 8
    ids, mask = _hf_left_padded(prompts, P)
    if next_mode:
        from transformers import LlavaNextImageProcessor

        proc = LlavaNextImageProcessor(
            size={"shortest_edge": TILE},
            crop_size={"height": TILE, "width": TILE},
            image_grid_pinpoints=PINPOINTS,
        )
        pix = proc(images=[img, img], return_tensors="pt")
        vision_kw = dict(pixel_values=pix["pixel_values"],
                         image_sizes=pix["image_sizes"])
    else:
        from transformers import CLIPImageProcessor

        proc = CLIPImageProcessor(
            size={"shortest_edge": TILE},
            crop_size={"height": TILE, "width": TILE},
        )
        pix = proc(images=[img, img], return_tensors="pt")
        vision_kw = dict(pixel_values=pix["pixel_values"])
    with torch.no_grad():
        hf_out = hf_model.generate(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask),
            max_new_tokens=N, do_sample=False,
            pad_token_id=PAD, eos_token_id=EOS, **vision_kw,
        ).numpy()[:, P:]

    budget = 2 * patches.shape[0] * patches.shape[1]
    ours = _generate_ours(bundle, params, examples, P, N, budget)
    _compare(ours, hf_out)


def test_llava15_generate_matches_hf():
    _llava_generate_case(next_mode=False)


def test_llava_next_generate_matches_hf():
    _llava_generate_case(next_mode=True)


def test_internvl_generate_matches_hf():
    torch = pytest.importorskip("torch")
    from transformers import InternVLConfig, InternVLForConditionalGeneration

    from iadr1_tpu.core.precision import FULL_PRECISION
    from iadr1_tpu.models import internvl
    from iadr1_tpu.models.registry import make_internvl_bundle

    VISION = dict(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, image_size=[TILE, TILE], patch_size=[14, 14],
        layer_norm_eps=1e-6, attention_bias=True, use_qk_norm=False,
        norm_type="layer_norm", hidden_dropout_prob=0.0,
        attention_dropout=0.0, projection_dropout=0.0,
        use_absolute_position_embeddings=True, layer_scale_init_value=0.1,
        use_mean_pooling=True,
    )
    torch.manual_seed(4)
    hf_model = InternVLForConditionalGeneration(InternVLConfig(
        vision_config=dict(VISION),
        text_config=dict(**TEXT, model_type="qwen2", attention_dropout=0.0),
        image_token_id=7, downsample_ratio=0.5,
        vision_feature_layer=-1, vision_feature_select_strategy="default",
        projector_hidden_act="gelu",
    )).eval()
    cfg_dict = dict(
        architectures=["InternVLForConditionalGeneration"],
        text_config={**TEXT}, vision_config={**VISION},
        image_token_id=7, downsample_ratio=0.5,
    )
    bundle = make_internvl_bundle(cfg_dict, attention="xla",
                                  precision=FULL_PRECISION)
    params = bundle.convert_hf(hf_state_from_torch(hf_model))

    rng = np.random.default_rng(9)
    img = _image(90, 62, seed=5)  # non-square: exercises dynamic tiling
    tiles, n_tiles = internvl.internvl_tiles(
        img, TILE, bundle.cfg.min_tiles, bundle.cfg.max_tiles)
    patches, grid, seqlen = bundle.preprocess_image(img)
    prompts, examples = [], []
    for text_len in (5, 9):
        text = list(rng.integers(10, TEXT["vocab_size"], text_len))
        prompt = text[:2] + [7] * seqlen + text[2:]
        prompts.append(prompt)
        examples.append({"prompt_ids": prompt, "patches": [patches],
                         "grid_thw": [grid]})

    P = max(len(p) for p in prompts) + 2
    N = 8
    ids, mask = _hf_left_padded(prompts, P)
    with torch.no_grad():
        hf_out = hf_model.generate(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask),
            pixel_values=torch.tensor(np.concatenate([tiles, tiles], axis=0)),
            max_new_tokens=N, do_sample=False,
            pad_token_id=PAD, eos_token_id=EOS,
        ).numpy()[:, P:]

    budget = 2 * patches.shape[0] * patches.shape[1]
    ours = _generate_ours(bundle, params, examples, P, N, budget)
    _compare(ours, hf_out)
