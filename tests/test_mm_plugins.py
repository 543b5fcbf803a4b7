"""Out-of-recipe mm-plugin parity vs the HF processors.

Each family's pixel arrays (and Mllama's cross-attention machinery) are
compared against the transformers implementation the reference's plugins
delegate to (mm_plugin.py:382-1147).  MiniCPM-V's processor is hub
remote code (not importable offline): its geometry gets structural tests
only -- recorded in COVERAGE.md.
"""

import numpy as np
import pytest

from iadr1_tpu.data.mm_plugins import (
    LlavaNextVideoPlugin,
    MiniCPMVPlugin,
    MllamaPlugin,
    PaliGemmaPlugin,
    PixtralPlugin,
    VideoLlavaPlugin,
    get_mm_plugin,
)


def _image(w, h, seed=0):
    from PIL import Image

    rng = np.random.default_rng(seed)
    return Image.fromarray(rng.integers(0, 255, (h, w, 3), np.uint8))


def test_registry():
    assert isinstance(get_mm_plugin("pixtral"), PixtralPlugin)
    with pytest.raises(KeyError):
        get_mm_plugin("nope")


# --- VideoLLaVA ---------------------------------------------------------


def test_videollava_pixels_match_hf():
    from transformers import VideoLlavaImageProcessor

    plugin = VideoLlavaPlugin(tile_size=224)
    proc = VideoLlavaImageProcessor()
    imgs = [_image(300, 200, seed=1), _image(180, 260, seed=2)]
    ours = plugin.get_mm_inputs(images=imgs)["pixel_values_images"]
    ref = proc(images=imgs, return_tensors="np")["pixel_values_images"]
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_videollava_token_expansion():
    plugin = VideoLlavaPlugin(tile_size=224, patch_size=14)
    msgs = [{"role": "user", "content": "<image>hi<video>"}]
    out = plugin.process_messages(
        msgs, images=[_image(64, 64)], videos=[[_image(64, 64)] * 3])
    # image: 16*16 (CLS dropped under "default"); video: (16*16+1)*3
    assert out[0]["content"].count("<image>") == 256
    assert out[0]["content"].count("<video>") == 257 * 3


# --- LLaVA-NeXT-Video ---------------------------------------------------


def test_llava_next_video_image_seqlen_matches_hf():
    from transformers import LlavaNextVideoProcessor
    from transformers.models.llava_next_video.processing_llava_next_video import (  # noqa: E501
        LlavaNextVideoProcessor as _P,
    )

    pins = [[336, 672], [672, 336], [672, 672], [1008, 336], [336, 1008]]
    plugin = LlavaNextVideoPlugin(tile_size=336, patch_size=14,
                                  grid_pinpoints=tuple(map(tuple, pins)))
    from types import SimpleNamespace

    proc = _P.__new__(_P)
    proc.patch_size = 14
    proc.vision_feature_select_strategy = "default"
    proc.num_additional_image_tokens = 1
    proc.image_processor = SimpleNamespace(image_grid_pinpoints=pins)
    for w, h in ((500, 300), (336, 336), (250, 700)):
        ours = plugin.image_seqlen(_image(w, h))
        ref = proc._get_number_of_features(h, w, 336, 336) - 1
        assert ours == ref, (w, h, ours, ref)


def test_llava_next_video_video_pixels_match_hf():
    from transformers import LlavaNextVideoImageProcessor

    plugin = LlavaNextVideoPlugin(tile_size=336)
    # frames go through the CLIP resize+crop path; drive the HF image
    # processor per-frame at the model's 336 geometry
    proc = LlavaNextVideoImageProcessor(
        size={"shortest_edge": 336},
        crop_size={"height": 336, "width": 336})
    frames = [_image(400, 280, seed=i) for i in range(4)]
    ours = plugin.get_mm_inputs(videos=[frames])["pixel_values_videos"][0]
    ref = np.asarray(proc(images=frames, return_tensors="np")
                     ["pixel_values_videos"]).reshape(ours.shape)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)
    # token expansion: (336/14)^2 // 4 per frame
    assert plugin.video_seqlen(frames) == (24 * 24) // 4 * 4


# --- PaliGemma ----------------------------------------------------------


def test_paligemma_pixels_match_hf():
    from transformers import SiglipImageProcessor

    plugin = PaliGemmaPlugin(image_size=224)
    proc = SiglipImageProcessor(size={"height": 224, "width": 224})
    imgs = [_image(300, 200, seed=3)]
    ours = plugin.get_mm_inputs(images=imgs)["pixel_values"]
    ref = proc(images=imgs, return_tensors="np")["pixel_values"]
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_paligemma_token_plumbing():
    plugin = PaliGemmaPlugin(image_size=224, patch_size=14)
    msgs = plugin.process_messages(
        [{"role": "user", "content": "<image>describe"}],
        images=[_image(64, 64)])
    assert msgs[0]["content"] == "describe"   # placeholder stripped
    ids, labels = plugin.process_token_ids(
        [5, 6, 7], [5, 6, 7], [_image(64, 64)], image_token_id=9)
    n = plugin.image_seqlen
    assert ids[:n] == [9] * n and ids[n:] == [5, 6, 7]
    assert labels[:n] == [-100] * n and labels[n:] == [5, 6, 7]
    tt = plugin.token_type_ids([1], [n + 3])
    assert tt == [[0] * n + [1] * 3]


# --- Pixtral ------------------------------------------------------------


def test_pixtral_pixels_and_expansion_match_hf():
    from transformers import PixtralImageProcessor

    plugin = PixtralPlugin(longest_edge=1024, patch_size=16)
    proc = PixtralImageProcessor(
        size={"longest_edge": 1024}, patch_size={"height": 16, "width": 16})
    for w, h in ((300, 200), (2000, 500), (64, 64)):
        img = _image(w, h, seed=4)
        ours = plugin.get_mm_inputs(images=[img])["pixel_values"][0]
        out = proc(images=[img], return_tensors="np")
        ref = np.asarray(out["pixel_values"][0])
        assert ours.shape == ref.shape, (w, h, ours.shape, ref.shape)
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)
        # expansion: [IMG]*cols + [IMG_BREAK] per row, [IMG_END] last
        text = plugin.expansion(h, w)
        th, tw = ours.shape[1] // 16, ours.shape[2] // 16
        assert text.count("[IMG]") == th * tw
        assert text.count("[IMG_BREAK]") == th - 1
        assert text.count("[IMG_END]") == 1


# --- Mllama -------------------------------------------------------------


def test_mllama_pixels_match_hf():
    from transformers import MllamaImageProcessor

    plugin = MllamaPlugin(tile_size=560, max_tiles=4)
    proc = MllamaImageProcessor(
        size={"height": 560, "width": 560}, max_image_tiles=4)
    batch = [[_image(800, 400, seed=5)], [_image(300, 900, seed=6),
                                          _image(560, 560, seed=7)]]
    ours = plugin.get_mm_inputs(batch)
    ref = proc(images=batch, return_tensors="np")
    np.testing.assert_allclose(
        ours["pixel_values"], np.asarray(ref["pixel_values"]),
        rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(
        ours["aspect_ratio_ids"], np.asarray(ref["aspect_ratio_ids"]))
    np.testing.assert_array_equal(
        ours["aspect_ratio_mask"], np.asarray(ref["aspect_ratio_mask"]))
    assert ours["num_tiles"] == ref["num_tiles"]


def test_mllama_cross_attention_mask_matches_hf():
    from transformers.models.mllama.processing_mllama import (
        convert_sparse_cross_attention_mask_to_dense,
        get_cross_attention_token_mask,
    )

    plugin = MllamaPlugin(max_tiles=4)
    tok_id = 99
    batch_ids = [
        [1, tok_id, 2, 3, tok_id, 4, 5, 6],
        [tok_id, 7, 8],
    ]
    num_tiles = [[4, 2], [3]]
    length = max(len(x) for x in batch_ids)
    for ids in batch_ids:
        assert (plugin.cross_attention_token_mask(ids, tok_id)
                == get_cross_attention_token_mask(ids, tok_id))
    ref = convert_sparse_cross_attention_mask_to_dense(
        [get_cross_attention_token_mask(ids, tok_id) for ids in batch_ids],
        num_tiles=num_tiles, max_num_tiles=4, length=length)
    ours = plugin.dense_cross_attention_mask(
        batch_ids, num_tiles, tok_id, length)
    np.testing.assert_array_equal(ours, np.asarray(ref))


def test_mllama_message_expansion():
    plugin = MllamaPlugin()
    out = plugin.process_messages(
        [{"role": "user", "content": "<image>a<image>b"}],
        images=[_image(32, 32), _image(32, 32)])
    assert out[0]["content"] == "<|image|>a<|image|>b"
    with pytest.raises(ValueError):
        plugin.process_messages(
            [{"role": "user", "content": "<image>"}], images=[])


# --- MiniCPM-V (structural only: processor is hub remote code) ----------


def test_minicpmv_geometry_and_placeholders():
    plugin = MiniCPMVPlugin(query_num=64, max_slice_nums=9)
    # small image: no slicing, single source view
    assert plugin.best_grid(224, 224) is None
    ph = plugin.image_placeholder(224, 224, 0)
    assert ph.count("<unk>") == 64 and "<slice>" not in ph
    assert ph.startswith("<image_id>0</image_id>")
    # large wide image: sliced; slices follow on newline-joined rows
    grid = plugin.best_grid(1000, 3000)
    assert grid is not None
    rows, cols = grid
    assert rows * cols <= 9 and cols > rows   # wide -> more columns
    ph = plugin.image_placeholder(1000, 3000, 1)
    assert ph.count("<slice>") == rows * cols
    assert ph.count("<unk>") == 64 * (1 + rows * cols)
    # pixel views: 1 source + slices, every side patch-divisible
    mm = plugin.get_mm_inputs(images=[_image(3000, 1000, seed=8)])
    views = mm["pixel_values"][0]
    assert len(views) == 1 + rows * cols
    for v in views:
        assert v.shape[1] % 14 == 0 and v.shape[2] % 14 == 0


def test_minicpmv_image_bounds():
    plugin = MiniCPMVPlugin()
    ids = [1, 10, 5, 5, 11, 2, 12, 5, 13, 3]
    bounds = plugin.image_bounds(ids, im_start_id=10, im_end_id=11,
                                 slice_start_id=12, slice_end_id=13)
    np.testing.assert_array_equal(bounds, [[2, 4], [7, 8]])


def test_minicpmv_video_frames():
    plugin = MiniCPMVPlugin(query_num=64)
    out = plugin.process_messages(
        [{"role": "user", "content": "<video>"}],
        videos=[[_image(64, 64), _image(64, 64)]])
    # two frames, no image ids, no slicing at 64x64
    assert out[0]["content"].count("<image>") == 2
    assert "<image_id>" not in out[0]["content"]
    with pytest.raises(ValueError):
        plugin.process_messages([{"role": "user", "content": "x"}],
                                images=[_image(8, 8)],
                                videos=[[_image(8, 8)]])
