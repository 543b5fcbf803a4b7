"""Data pipeline tests: templates, supervised encoding, packing, aligners."""

import numpy as np
import pytest

from iadr1_tpu.data import (
    IGNORE_INDEX,
    align_sharegpt,
    encode_supervised_example,
    get_template,
    greedy_knapsack,
    infer_seqlen,
    pack_examples,
)
from iadr1_tpu.data.registry import DatasetAttr

from helpers import tiny_qwen_tokenizer


MESSAGES = [
    {"role": "user", "content": "Are there any defects in the image?"},
    {"role": "assistant", "content": "<think>ok</think><answer>No</answer>"},
]


def test_qwen2_vl_template_rendering():
    t = get_template("qwen2_vl")
    text = t.render_conversation(MESSAGES)
    assert text == (
        "<|im_start|>system\nYou are a helpful assistant.<|im_end|>\n"
        "<|im_start|>user\nAre there any defects in the image?<|im_end|>\n"
        "<|im_start|>assistant\n"
        "<think>ok</think><answer>No</answer><|im_end|>\n"
    )


def test_qwen2_vl_generation_prompt():
    t = get_template("qwen2_vl")
    text = t.render_conversation(MESSAGES[:1], add_generation_prompt=True)
    assert text.endswith("<|im_end|>\n<|im_start|>assistant\n")


def test_llava_template_rendering():
    t = get_template("llava")
    text = t.render_conversation(MESSAGES[:1], add_generation_prompt=True)
    assert text == (
        "A chat between a curious user and an artificial intelligence "
        "assistant. The assistant gives helpful, detailed, and polite "
        "answers to the user's questions."
        "USER: Are there any defects in the image? ASSISTANT:"
    )


def test_llava_next_mistral_rendering():
    t = get_template("llava_next_mistral")
    text = t.render_conversation(
        MESSAGES, eos_text="</s>", bos_text="<s>"
    )
    assert text == (
        "<s>[INST] Are there any defects in the image?[/INST]"
        " <think>ok</think><answer>No</answer></s>"
    )


def test_supervised_encoding_masks_prompt():
    tok = tiny_qwen_tokenizer()
    t = get_template("qwen2_vl")
    ids, labels = encode_supervised_example(MESSAGES, t, tok)
    assert len(ids) == len(labels)
    # prompt span fully masked
    n_masked = sum(1 for l in labels if l == IGNORE_INDEX)
    assert 0 < n_masked < len(labels)
    # the response tokens appear unmasked at the tail
    tail = [l for l in labels if l != IGNORE_INDEX]
    resp_ids = tok.encode(
        "<think>ok</think><answer>No</answer><|im_end|>\n",
        add_special_tokens=False,
    )
    assert tail == resp_ids
    # round trip: ids decode back to the rendered conversation
    assert tok.decode(ids) == t.render_conversation(MESSAGES)


def test_multiturn_masking():
    tok = tiny_qwen_tokenizer()
    t = get_template("qwen2_vl")
    convo = MESSAGES + [
        {"role": "user", "content": "And the second image?"},
        {"role": "assistant", "content": "<answer>Yes</answer>"},
    ]
    ids, labels = encode_supervised_example(convo, t, tok)
    # both responses train; both prompts masked
    pairs = t.encode_multiturn(tok, convo)
    expected_trainable = len(pairs[0][1]) + len(pairs[1][1])
    assert sum(1 for l in labels if l != IGNORE_INDEX) == expected_trainable

    # mask_history: only last turn trains
    ids2, labels2 = encode_supervised_example(convo, t, tok, mask_history=True)
    assert sum(1 for l in labels2 if l != IGNORE_INDEX) == len(pairs[1][1])


def test_infer_seqlen():
    assert infer_seqlen(10, 4, 20) == (10, 4)      # everything fits
    assert infer_seqlen(100, 4, 20) == (16, 4)     # truncate source
    assert infer_seqlen(4, 100, 20) == (4, 16)     # truncate target
    assert infer_seqlen(50, 50, 20) == (10, 10)    # proportional split


def test_greedy_knapsack():
    bins = greedy_knapsack([8, 4, 4, 2, 2, 2], 10)
    assert all(sum(b) <= 10 for b in bins)
    assert sorted(x for b in bins for x in b) == [2, 2, 2, 4, 4, 8]
    # greedy fills the first bin with the largest + best fits
    assert sum(bins[0]) == 10


def test_pack_examples():
    examples = [
        {"input_ids": [1] * 30, "labels": [1] * 30, "extras": {"i": 0}},
        {"input_ids": [2] * 20, "labels": [2] * 20, "extras": {"i": 1}},
        {"input_ids": [3] * 50, "labels": [3] * 50, "extras": {"i": 2}},
        {"input_ids": [4] * 200, "labels": [4] * 200},  # dropped (> cutoff)
    ]
    rows = pack_examples(examples, cutoff_len=64, pad_token_id=0)
    total_tokens = sum(int((r["segment_ids"] != 0).sum()) for r in rows)
    assert total_tokens == 100
    for r in rows:
        assert r["input_ids"].shape == (64,)
        # positions restart at each segment
        segs = r["segment_ids"]
        pos = r["position_ids"]
        for s in np.unique(segs[segs != 0]):
            span = pos[segs == s]
            assert list(span) == list(range(len(span)))
        # padding is labeled IGNORE_INDEX
        assert (r["labels"][segs == 0] == IGNORE_INDEX).all()


def test_align_sharegpt():
    attr = DatasetAttr(
        name="x", formatting="sharegpt", messages="messages", images="images",
        role_tag="role", content_tag="content", user_tag="user",
        assistant_tag="assistant",
    )
    row = {
        "messages": [
            {"role": "user", "content": "<image>What is this?"},
            {"role": "assistant", "content": "A scratch."},
        ],
        "images": ["imgs/a.png"],
    }
    rec = align_sharegpt(row, attr, image_dir="/data")
    assert rec["messages"][0]["role"] == "user"
    assert rec["images"] == ["/data/imgs/a.png"]

    # malformed: starts with assistant
    bad = {"messages": [{"role": "assistant", "content": "hi"}]}
    assert align_sharegpt(bad, attr) is None


def test_vlm_batch_builder_llava_anyres_grids():
    """VLMBatchBuilder must pass llava's 4-tuple anyres grids through to
    vision_arrays untouched (the (t,h,w) reshape is M-RoPE-only)."""
    import numpy as np
    from PIL import Image

    import jax
    import jax.numpy as jnp

    from iadr1_tpu.data.collator import VLMBatchBuilder
    from iadr1_tpu.models.registry import make_llava_onevision_bundle

    hf = dict(
        architectures=["LlavaOnevisionForConditionalGeneration"],
        text_config=dict(vocab_size=512, hidden_size=64, intermediate_size=128,
                         num_hidden_layers=2, num_attention_heads=4,
                         num_key_value_heads=2, rope_theta=1e4,
                         tie_word_embeddings=True),
        vision_config=dict(hidden_size=32, intermediate_size=64,
                           num_hidden_layers=2, num_attention_heads=4,
                           image_size=56, patch_size=14),
        image_token_index=500,
        image_grid_pinpoints=[[56, 56], [56, 112], [112, 56]],
    )
    bundle = make_llava_onevision_bundle(hf, attention="xla")
    img = Image.new("RGB", (100, 52), (128, 40, 40))
    patches, grid, seqlen = bundle.preprocess_image(img)
    assert len(grid) == 4  # (n_h, n_w, orig_h, orig_w)

    T = 64
    ids = np.full(T, 3, np.int64)
    ids[1 : 1 + seqlen] = hf["image_token_index"]
    labels = ids.copy()
    pos = np.arange(T)
    rows = [{
        "input_ids": ids, "labels": labels,
        "segment_ids": np.ones(T, np.int64), "position_ids": pos,
        "extras": [{"patches": [patches], "grid_thw": [grid]}],
    }]
    builder = VLMBatchBuilder(bundle=bundle, patch_budget=patches.shape[0] * 16)
    batch = builder(rows)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    logits = jax.jit(lambda p, b: bundle.forward(p, b, remat=False))(
        bundle.init_params(jax.random.PRNGKey(0)), batch
    )
    assert np.isfinite(np.asarray(logits)).all()


def test_tokenized_cache_roundtrip(tmp_path):
    import numpy as np

    from iadr1_tpu.data.cache import load_tokenized, save_tokenized

    rows = [{
        "input_ids": np.arange(8) + i, "labels": np.arange(8),
        "segment_ids": np.ones(8, np.int64), "position_ids": np.arange(8),
    } for i in range(3)]
    path = str(tmp_path / "cache.npz")
    assert save_tokenized(path, rows)
    back = load_tokenized(path)
    assert len(back) == 3
    for a, b in zip(rows, back):
        for k in a:
            np.testing.assert_array_equal(a[k], b[k])
    # multimodal rows refuse the cache
    rows[0]["extras"] = [{"patches": [np.zeros((2, 4))]}]
    assert not save_tokenized(str(tmp_path / "c2.npz"), rows)
    assert load_tokenized(str(tmp_path / "missing.npz")) is None


def test_description_transformer_backend(tmp_path):
    """The HF mean-pooled backend: identical texts -> 1.0, plugged through
    description_score."""
    pytest.importorskip("torch")
    import torch
    from transformers import BertConfig, BertModel, BertTokenizerFast

    from iadr1_tpu.rewards import description as D

    # tiny local BERT-shaped encoder + a minimal WordPiece vocab
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "a", "small", "crack",
             "scratch", "on", "the", "surface"]
    vocab_file = tmp_path / "vocab.txt"
    vocab_file.write_text("\n".join(vocab))
    tok = BertTokenizerFast(vocab_file=str(vocab_file))
    cfg = BertConfig(vocab_size=len(vocab), hidden_size=32,
                     num_hidden_layers=2, num_attention_heads=2,
                     intermediate_size=64, max_position_embeddings=64)
    torch.manual_seed(0)
    model = BertModel(cfg)
    model.save_pretrained(tmp_path / "enc")
    tok.save_pretrained(tmp_path / "enc")

    backend = D.make_transformer_embedding_backend(str(tmp_path / "enc"))
    try:
        D.register_embedding_backend(backend)
        same = D.description_score("a small crack", "a small crack")
        diff = D.description_score("a small crack", "scratch on the surface")
        assert same == pytest.approx(1.0, abs=1e-5)
        assert 0.0 <= diff < same
    finally:
        D.register_embedding_backend(None)


def test_video_preprocess_and_expansion():
    """Video front-end: frame sampling, temporal patchify, token expansion,
    M-RoPE temporal positions, scatter through the video token."""
    import numpy as np
    from PIL import Image

    import jax
    import jax.numpy as jnp

    from iadr1_tpu.data.mm import expand_video_tokens
    from iadr1_tpu.models.registry import make_qwen2_vl_bundle
    from iadr1_tpu.vision.mrope import get_mrope_positions
    from iadr1_tpu.vision.preprocess import (
        qwen2vl_preprocess_video,
        sample_frame_indices,
    )

    # sampling rule: floor(duration*fps) capped, even count
    idx = sample_frame_indices(total_frames=100, duration_sec=5.0,
                               video_fps=2.0, video_maxlen=64)
    assert len(idx) == 10 and idx[0] == 0 and idx[-1] == 99
    assert len(sample_frame_indices(7, 100.0, 2.0, 64)) == 6  # capped+even

    rng = np.random.default_rng(0)
    frames = [Image.fromarray((rng.random((56, 84, 3)) * 255).astype(np.uint8))
              for _ in range(4)]
    flat, grid = qwen2vl_preprocess_video(
        frames, min_pixels=28 * 28, max_pixels=56 * 84)
    t, h, w = grid
    assert t == 2  # 4 frames / temporal_patch_size
    assert flat.shape == (t * h * w, 3 * 2 * 14 * 14)
    seqlen = t * h * w // 4

    # full forward with the video scattered through vision arrays
    hf = dict(
        architectures=["Qwen2VLForConditionalGeneration"],
        text_config=dict(vocab_size=512, hidden_size=64, intermediate_size=128,
                         num_hidden_layers=2, num_attention_heads=4,
                         num_key_value_heads=2, rope_theta=1e4,
                         tie_word_embeddings=True,
                         rope_scaling={"type": "mrope",
                                       "mrope_section": [4, 2, 2]}),
        vision_config=dict(depth=2, embed_dim=32, hidden_size=64, num_heads=4,
                           patch_size=14, spatial_merge_size=2,
                           temporal_patch_size=2),
        image_token_id=500, video_token_id=501,
        vision_start_token_id=502, vision_end_token_id=503,
    )
    bundle = make_qwen2_vl_bundle(hf, attention="xla")

    msgs = expand_video_tokens(
        [{"role": "user", "content": "<video> any motion defects?"}],
        [seqlen], "qwen2_vl", video_token="V")
    assert msgs[0]["content"].count("V") == seqlen
    assert msgs[0]["content"].startswith("<|vision_start|>")

    T = seqlen + 8
    ids = np.full((1, T), 7, np.int64)
    ids[0, 0] = hf["vision_start_token_id"]
    ids[0, 1 : 1 + seqlen] = hf["video_token_id"]
    ids[0, 1 + seqlen] = hf["vision_end_token_id"]
    pos, deltas = get_mrope_positions(
        ids, np.asarray([grid]), hf["image_token_id"],
        hf["vision_start_token_id"], video_token_id=hf["video_token_id"])
    # temporal axis advances across the two frame groups
    tpos = pos[0, 0, 1 : 1 + seqlen]
    assert tpos.min() + 1 == tpos.max()  # grid_t == 2 -> two temporal values

    arrays = bundle.vision_arrays(ids, [flat], [grid], flat.shape[0])
    # every video token has a feature scattered onto it (row 0, not sentinel)
    assert (arrays["scatter_rows"][:seqlen] == 0).all()
    batch = {
        "input_ids": jnp.asarray(ids, jnp.int32),
        "position_ids": jnp.asarray(pos, jnp.int32),
        "segment_ids": jnp.ones((1, T), jnp.int32),
        **{k: jnp.asarray(v) for k, v in arrays.items()},
    }
    params = bundle.init_params(jax.random.PRNGKey(0))
    h = jax.jit(lambda p, b: bundle.hidden_fn(p, b, remat=False))(params, batch)
    assert np.isfinite(np.asarray(h)).all()


def test_registry_hub_sources(tmp_path):
    """hf_hub/ms_hub-backed entries parse (reference data/parser.py) and
    fail with an actionable error when the hub is unreachable."""
    import json as _json

    import pytest as _pytest

    from iadr1_tpu.data.registry import load_dataset_registry, load_json_dataset

    info = {
        "hub_ds": {"hf_hub_url": "org/name", "formatting": "sharegpt"},
        "ms_ds": {"ms_hub_url": "org/name"},
    }
    p = tmp_path / "dataset_info.json"
    p.write_text(_json.dumps(info))
    reg = load_dataset_registry(str(p))
    assert reg["hub_ds"].hf_hub_url == "org/name"
    assert reg["ms_ds"].ms_hub_url == "org/name"
    with _pytest.raises(RuntimeError, match="ModelScope"):
        load_json_dataset(reg["ms_ds"])
    with _pytest.raises(ValueError, match="no file_name"):
        load_json_dataset(reg["hub_ds"].__class__(name="x"))


def test_hub_fetcher_dispatch(tmp_path):
    """Hub-backed dataset_info rows load through the injectable fetcher
    registry (reference data/loader.py:44-150 load_from dispatch), fully
    offline via a fake hub."""
    import json as _json

    from iadr1_tpu.data.registry import (
        hub_source,
        load_dataset_registry,
        load_json_dataset,
        register_hub_fetcher,
    )

    info = {
        "remote_sft": {
            "hf_hub_url": "org/expert-ad",
            "subset": "stage1",
            "split": "train",
            "num_samples": 2,
            "formatting": "sharegpt",
        },
        "ms_remote": {"ms_hub_url": "ms-org/data"},
        "local": {"file_name": "rows.json"},
    }
    path = tmp_path / "dataset_info.json"
    path.write_text(_json.dumps(info))
    reg = load_dataset_registry(path)
    attr = reg["remote_sft"]
    assert hub_source(attr) == ("hf_hub", "org/expert-ad")
    assert attr.subset == "stage1"
    assert hub_source(reg["ms_remote"]) == ("ms_hub", "ms-org/data")
    assert hub_source(reg["local"]) is None

    calls = []

    def fake_hub(a):
        calls.append((a.name, a.subset, a.split))
        return [{"conversations": [i]} for i in range(5)]

    # per-call override
    rows = load_json_dataset(attr, hub_fetcher=fake_hub)
    assert rows == [{"conversations": [0]}, {"conversations": [1]}]  # num_samples=2
    assert calls == [("remote_sft", "stage1", "train")]

    # registry override + restore
    prev = register_hub_fetcher("ms_hub", fake_hub)
    try:
        rows = load_json_dataset(reg["ms_remote"])
        assert len(rows) == 5
    finally:
        register_hub_fetcher("ms_hub", prev)

    # without datasets/network the default hf_hub fetcher raises a
    # pointed error rather than hanging
    import pytest as _pytest

    with _pytest.raises((RuntimeError, Exception)):
        load_json_dataset(reg["remote_sft"])
