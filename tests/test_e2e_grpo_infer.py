"""End-to-end SC-GRPO training and benchmark inference through the CLIs,
on a tiny local Qwen2-VL checkpoint with synthetic IAD data."""

import json
import os

import numpy as np
import pytest

from helpers import (
    build_benchmark_json,
    build_iad_rl_dataset,
    build_tiny_vlm_checkpoint,
)


@pytest.fixture(scope="module")
def checkpoint_dir(tmp_path_factory):
    pytest.importorskip("torch")
    return build_tiny_vlm_checkpoint(str(tmp_path_factory.mktemp("ckpt")))


def test_cli_grpo_end_to_end(checkpoint_dir, tmp_path):
    from iadr1_tpu.cli.train_grpo import main

    data_path, img_dir = build_iad_rl_dataset(tmp_path)
    out_dir = str(tmp_path / "grpo_run")
    cfg = {
        "model": {"model_name_or_path": checkpoint_dir, "attention": "xla",
                  "ref_dtype": "float32"},
        "data": {
            "dataset_name": data_path, "image_path": img_dir,
            "template": "qwen2_vl", "patch_budget": 64,
            "min_pixels": 56 * 56, "max_pixels": 56 * 56 * 4,
        },
        "grpo": {
            "num_generations": 2, "max_prompt_length": 128,
            "max_completion_length": 8, "beta": 0.04,
        },
        "mesh": {"dp": 1, "fsdp": 4, "tp": 2},
        "optim": {"learning_rate": 1e-4, "warmup_ratio": 0.0},
        "train": {"output_dir": out_dir, "max_steps": 3, "batch_size": 2,
                  "logging_steps": 1, "save_steps": 0},
    }
    cfg_path = tmp_path / "grpo.json"
    cfg_path.write_text(json.dumps(cfg))
    assert main(["--config", str(cfg_path)]) == 0

    records = [json.loads(l) for l in
               open(os.path.join(out_dir, "trainer_log.jsonl"))]
    assert len(records) == 3
    for r in records:
        assert np.isfinite(r["loss"])
        assert np.isfinite(r["kl"])
        assert "reward" in r and "rewards/accuracy_reward" in r
    assert os.path.isdir(os.path.join(out_dir, "checkpoints"))


def test_cli_infer_end_to_end(checkpoint_dir, tmp_path):
    from iadr1_tpu.cli.infer import main

    bench_path, img_root = build_benchmark_json(tmp_path)
    out_dir = str(tmp_path / "results")
    assert main([
        "--model-path", checkpoint_dir,
        "--test-data", bench_path,
        "--image-dir", img_root,
        "--output-dir", out_dir,
        "--batch-size", "2",
        "--max-prompt-length", "128",
        "--max-new-tokens", "8",
        "--patch-budget", "64",
        "--max-pixels", str(56 * 56 * 4),
        "--attention", "xla",
    ]) == 0

    answers_path = os.path.join(out_dir, "answers_0_shot.json")
    answers = json.load(open(answers_path))
    assert len(answers) == 8
    for a in answers:
        assert a["gpt_answer"] in "ABE"
        assert a["correct_answer"] in "AB"
    csv_path = answers_path.replace(".json", "_accuracy.csv")
    assert os.path.exists(csv_path)

    # resumability: a second run must skip all answered items quickly and
    # keep the same answer count
    assert main([
        "--model-path", checkpoint_dir,
        "--test-data", bench_path,
        "--image-dir", img_root,
        "--output-dir", out_dir,
        "--batch-size", "2",
        "--max-prompt-length", "128",
        "--max-new-tokens", "8",
        "--patch-budget", "64",
        "--max-pixels", str(56 * 56 * 4),
        "--attention", "xla",
    ]) == 0
    assert len(json.load(open(answers_path))) == 8


def test_cli_grpo_lora_ref_elision(checkpoint_dir, tmp_path):
    """LoRA GRPO through the CLI: factored adapters over a frozen base,
    reference model elided (one weight copy)."""
    from iadr1_tpu.cli.train_grpo import main

    data_path, img_dir = build_iad_rl_dataset(tmp_path)
    out_dir = str(tmp_path / "grpo_lora_run")
    cfg = {
        "model": {"model_name_or_path": checkpoint_dir, "attention": "xla"},
        "data": {
            "dataset_name": data_path, "image_path": img_dir,
            "template": "qwen2_vl", "patch_budget": 64,
            "min_pixels": 56 * 56, "max_pixels": 56 * 56 * 4,
        },
        "grpo": {
            "num_generations": 2, "max_prompt_length": 128,
            "max_completion_length": 8, "beta": 0.04,
        },
        "finetuning": {"finetuning_type": "lora", "lora_rank": 4},
        "mesh": {"dp": 1, "fsdp": 4, "tp": 2},
        "optim": {"learning_rate": 1e-4, "warmup_ratio": 0.0},
        "train": {"output_dir": out_dir, "max_steps": 2, "batch_size": 2,
                  "logging_steps": 1, "save_steps": 0},
    }
    cfg_path = tmp_path / "grpo_lora.json"
    cfg_path.write_text(json.dumps(cfg))
    assert main(["--config", str(cfg_path)]) == 0
    records = [json.loads(l) for l in
               open(os.path.join(out_dir, "trainer_log.jsonl"))]
    assert len(records) == 2
    for r in records:
        assert np.isfinite(r["loss"]) and np.isfinite(r["kl"])
    # LoRA starts with B=0: the policy equals the frozen base, so the KL
    # to the elided reference must be exactly 0 at step 1
    assert abs(records[0]["kl"]) < 1e-5
