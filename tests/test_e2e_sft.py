"""End-to-end PA-SFT slice: tiny local HF Qwen2-VL checkpoint + synthetic
Expert-AD-style sharegpt dataset with images, driven through the real CLI
(config file -> tokenizer -> align -> expand -> encode -> pack -> VLM
collate -> mesh -> train steps -> checkpoint + trainer_log.jsonl).

This is BASELINE.json config territory: the "one model running" milestone
(SURVEY.md section 7 build order #3).
"""

import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # CLI e2e chain (minutes)

from helpers import tiny_qwen_tokenizer


@pytest.fixture(scope="module")
def checkpoint_dir(tmp_path_factory):
    """A tiny Qwen2-VL HF checkpoint dir: config.json + safetensors +
    tokenizer, with special-token ids taken from the tiny tokenizer."""
    torch = pytest.importorskip("torch")
    from transformers import Qwen2VLConfig, Qwen2VLForConditionalGeneration

    d = tmp_path_factory.mktemp("tiny_qwen2vl")
    tok = tiny_qwen_tokenizer()
    tok.save_pretrained(str(d))

    ids = {
        "image_token_id": tok.convert_tokens_to_ids("<|image_pad|>"),
        "vision_start_token_id": tok.convert_tokens_to_ids("<|vision_start|>"),
        "vision_end_token_id": tok.convert_tokens_to_ids("<|vision_end|>"),
        "video_token_id": 0,
    }
    torch.manual_seed(0)
    cfg = Qwen2VLConfig(
        vision_config=dict(
            depth=2, embed_dim=32, hidden_size=64, num_heads=4,
            patch_size=14, spatial_merge_size=2, temporal_patch_size=2,
        ),
        text_config=dict(
            vocab_size=max(tok.vocab_size, 600), hidden_size=64,
            intermediate_size=128, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2,
            rms_norm_eps=1e-6, rope_theta=10000.0, tie_word_embeddings=True,
            max_position_embeddings=512,
            rope_scaling={"type": "mrope", "mrope_section": [4, 2, 2]},
        ),
        **ids,
    )
    model = Qwen2VLForConditionalGeneration(cfg)
    model.save_pretrained(str(d))
    return str(d)


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    """Synthetic Expert-AD-style sharegpt JSON + images."""
    from PIL import Image

    d = tmp_path_factory.mktemp("expert_ad")
    img_dir = d / "images"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    rows = []
    for i in range(12):
        name = f"img_{i}.png"
        Image.fromarray(
            rng.integers(0, 255, (56, 56, 3), np.uint8)
        ).save(img_dir / name)
        anomalous = i % 2 == 0
        answer = (
            "<think>inspecting surface</think><location>top left</location>"
            "<type>scratch</type><answer>Yes</answer>"
            if anomalous
            else "<think>looks clean</think><answer>No</answer>"
        )
        rows.append(
            {
                "messages": [
                    {"role": "user",
                     "content": "<image>Are there any defects in the image?"},
                    {"role": "assistant", "content": answer},
                ],
                "images": [name],
            }
        )
    path = d / "expert_ad.json"
    path.write_text(json.dumps(rows))
    return str(path), str(img_dir)


def test_cli_sft_end_to_end(checkpoint_dir, dataset, tmp_path):
    from iadr1_tpu.cli.train_sft import main

    data_path, img_dir = dataset
    out_dir = str(tmp_path / "run")
    cfg = {
        "model": {"model_name_or_path": checkpoint_dir, "attention": "xla"},
        "data": {
            "dataset": data_path,
            "image_dir": img_dir,
            "template": "qwen2_vl",
            "cutoff_len": 256,
            "patch_budget": 128,
            "min_pixels": 56 * 56,
            "max_pixels": 56 * 56 * 4,
        },
        "mesh": {"dp": 1, "fsdp": 4, "tp": 2},
        "optim": {"learning_rate": 5e-3, "warmup_ratio": 0.0},
        "train": {
            "output_dir": out_dir, "max_steps": 6, "batch_size": 2,
            "logging_steps": 2, "save_steps": 0, "plot_loss": True,
        },
        "predict": {"do_predict": True, "max_samples": 2,
                    "max_new_tokens": 4, "batch_size": 2},
    }
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))

    assert main(["--config", str(cfg_path)]) == 0

    # trainer log exists and loss decreased
    log_path = os.path.join(out_dir, "trainer_log.jsonl")
    records = [json.loads(l) for l in open(log_path)]
    assert records[-1]["current_steps"] == 6
    losses = [r["loss"] for r in records]
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]

    # plot_loss wrote the curve PNG (reference extras/ploting.py)
    assert os.path.exists(os.path.join(out_dir, "training_loss.png"))

    # do_predict wrote save_predictions-schema jsonl (sft/trainer.py:137-171)
    preds = [json.loads(l) for l in
             open(os.path.join(out_dir, "generated_predictions.jsonl"))]
    assert len(preds) == 2
    assert all(set(p) == {"prompt", "label", "predict"} for p in preds)
    assert all(p["label"].endswith("</answer>") for p in preds)

    # predict_results.json carries the ComputeSimilarity-analogue scores
    # (reference train/sft/metric.py ROUGE/BLEU, logged by predict)
    scores = json.load(open(os.path.join(out_dir, "predict_results.json")))
    assert set(scores) == {"predict_rouge-1", "predict_rouge-2",
                           "predict_rouge-l", "predict_bleu-4"}
    assert all(0.0 <= v <= 100.0 for v in scores.values())

    # checkpoint written
    ckpts = os.listdir(os.path.join(out_dir, "checkpoints"))
    assert any(c.isdigit() or c == "6" for c in ckpts), ckpts
