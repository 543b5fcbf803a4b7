"""End-to-end preference stages (DPO/KTO/RM) and continued pretraining
through the CLIs on a tiny local checkpoint."""

import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # CLI e2e chain (minutes)

from helpers import build_tiny_vlm_checkpoint


@pytest.fixture(scope="module")
def checkpoint_dir(tmp_path_factory):
    pytest.importorskip("torch")
    return build_tiny_vlm_checkpoint(str(tmp_path_factory.mktemp("ckpt")))


def _ranking_dataset(tmp_path):
    rows = [
        {
            "messages": [{"role": "user",
                          "content": f"Are there defects in sample {i}?"}],
            "chosen": "<think>clear surface</think><answer>No</answer>",
            "rejected": "maybe?",
        }
        for i in range(6)
    ]
    p = tmp_path / "ranking.json"
    p.write_text(json.dumps(rows))
    return str(p)


def _feedback_dataset(tmp_path):
    rows = []
    for i in range(6):
        rows.append({
            "messages": [
                {"role": "user", "content": f"Check sample {i}."},
                {"role": "assistant",
                 "content": "<answer>No</answer>" if i % 2 else "bad"},
            ],
            "label": bool(i % 2),
        })
    p = tmp_path / "feedback.json"
    p.write_text(json.dumps(rows))
    return str(p)


def _run(stage, data_path, checkpoint_dir, tmp_path, extra=None):
    from iadr1_tpu.cli.train_pref import main

    out_dir = str(tmp_path / f"{stage}_run")
    cfg = {
        "stage": stage,
        "model": {"model_name_or_path": checkpoint_dir, "attention": "xla"},
        "data": {"dataset_name": data_path, "template": "qwen2_vl",
                 "cutoff_len": 96},
        "pref": {"beta": 0.1, "ref_dtype": "float32", **(extra or {})},
        "mesh": {"dp": 1, "fsdp": 4, "tp": 2},
        "optim": {"learning_rate": 1e-4, "warmup_ratio": 0.0},
        "train": {"output_dir": out_dir, "max_steps": 2, "batch_size": 2,
                  "logging_steps": 1, "save_steps": 0},
    }
    p = tmp_path / f"{stage}.json"
    p.write_text(json.dumps(cfg))
    assert main(["--config", str(p)]) == 0
    records = [json.loads(l) for l in
               open(os.path.join(out_dir, "trainer_log.jsonl"))]
    assert len(records) == 2
    assert all(np.isfinite(r["loss"]) for r in records)
    return records


def test_cli_dpo(checkpoint_dir, tmp_path):
    records = _run("dpo", _ranking_dataset(tmp_path), checkpoint_dir, tmp_path)
    assert "rewards/margins" in records[0]
    assert "rewards/accuracies" in records[0]


def test_cli_dpo_simpo_ref_free(checkpoint_dir, tmp_path):
    _run("dpo", _ranking_dataset(tmp_path), checkpoint_dir, tmp_path,
         extra={"loss_type": "simpo"})


def test_cli_kto(checkpoint_dir, tmp_path):
    records = _run("kto", _feedback_dataset(tmp_path), checkpoint_dir,
                   tmp_path)
    assert all(r["kl"] >= 0 for r in records)


def test_cli_rm(checkpoint_dir, tmp_path):
    records = _run("rm", _ranking_dataset(tmp_path), checkpoint_dir, tmp_path)
    assert "accuracy" in records[0]


def test_cli_ppo(checkpoint_dir, tmp_path):
    from iadr1_tpu.cli.train_pref import main

    rows = [
        {"messages": [{"role": "user",
                       "content": f"Are there defects in sample {i}?"}],
         "solution": "<answer>No</answer>"}
        for i in range(6)
    ]
    data = tmp_path / "ppo_prompts.json"
    data.write_text(json.dumps(rows))
    out_dir = str(tmp_path / "ppo_run")
    cfg = {
        "stage": "ppo",
        "model": {"model_name_or_path": checkpoint_dir, "attention": "xla"},
        "data": {"dataset_name": str(data), "template": "qwen2_vl",
                 "cutoff_len": 96},
        "pref": {"ref_dtype": "float32",
                 "reward_funcs": ["format", "accuracy"]},
        "ppo": {"max_prompt_length": 32, "max_completion_length": 8,
                "mini_batch_size": 2, "ppo_epochs": 2, "logp_chunk_size": 16},
        "mesh": {"dp": 1, "fsdp": 4, "tp": 2},
        "optim": {"learning_rate": 1e-4, "warmup_ratio": 0.0},
        "train": {"output_dir": out_dir, "max_steps": 2, "batch_size": 2,
                  "logging_steps": 1, "save_steps": 0},
    }
    p = tmp_path / "ppo_cfg.json"
    p.write_text(json.dumps(cfg))
    assert main(["--config", str(p)]) == 0
    records = [json.loads(l) for l in
               open(os.path.join(out_dir, "trainer_log.jsonl"))]
    assert len(records) == 2
    for r in records:
        assert np.isfinite(r["loss"]) and np.isfinite(r["vf_loss"])
        assert "kl_coef" in r


def test_cli_pt_stage(checkpoint_dir, tmp_path):
    from iadr1_tpu.cli.train_sft import main

    rows = [{"messages": [{"role": "user", "content": f"plain text {i} " * 5}],
             "images": []} for i in range(6)]
    data = tmp_path / "pt.json"
    data.write_text(json.dumps(rows))
    out_dir = str(tmp_path / "pt_run")
    cfg = {
        "stage": "pt",
        "model": {"model_name_or_path": checkpoint_dir, "attention": "xla"},
        "data": {"dataset": str(data), "template": "qwen2_vl",
                 "cutoff_len": 64, "packing": True},
        "mesh": {"dp": 1, "fsdp": 4, "tp": 2},
        "optim": {"learning_rate": 1e-4, "warmup_ratio": 0.0},
        "train": {"output_dir": out_dir, "max_steps": 2, "batch_size": 2,
                  "logging_steps": 1, "save_steps": 0},
    }
    p = tmp_path / "pt_cfg.json"
    p.write_text(json.dumps(cfg))
    assert main(["--config", str(p)]) == 0
    records = [json.loads(l) for l in
               open(os.path.join(out_dir, "trainer_log.jsonl"))]
    assert all(np.isfinite(r["loss"]) for r in records)


def _prompt_dataset(tmp_path, name="prompts.json"):
    rows = [
        {"messages": [{"role": "user",
                       "content": f"Are there defects in sample {i}?"}],
         "solution": "<answer>No</answer>"}
        for i in range(6)
    ]
    p = tmp_path / name
    p.write_text(json.dumps(rows))
    return str(p)


def test_cli_rloo(checkpoint_dir, tmp_path):
    records = _run(
        "rloo", _prompt_dataset(tmp_path), checkpoint_dir, tmp_path,
        extra={"reward_funcs": ["format", "accuracy"],
               "num_generations": 2, "max_completion_length": 8,
               "kl_coef": 0.02},
    )
    assert "reward" in records[0] and "kl" in records[0]


def test_cli_online_dpo(checkpoint_dir, tmp_path):
    records = _run(
        "online_dpo", _prompt_dataset(tmp_path), checkpoint_dir, tmp_path,
        extra={"reward_funcs": ["format", "accuracy"],
               "max_completion_length": 8, "missing_eos_penalty": 0.1},
    )
    assert "rewards/accuracies" in records[0]
    assert "objective/scores" in records[0]


def test_cli_dpo_cpo_loss(checkpoint_dir, tmp_path):
    records = _run("dpo", _ranking_dataset(tmp_path), checkpoint_dir,
                   tmp_path, extra={"loss_type": "cpo", "ftx": 1.0})
    assert "rewards/accuracies" in records[0]


def test_cli_bco(checkpoint_dir, tmp_path):
    records = _run("bco", _feedback_dataset(tmp_path), checkpoint_dir,
                   tmp_path)
    assert "rewards/chosen" in records[0]
    assert "delta" in records[0]


def test_cli_prm(checkpoint_dir, tmp_path):
    rows = [
        {"prompt": f"Inspect sample {i}.",
         "completions": ["Step one looks clean", "so no defect"],
         "labels": [True, bool(i % 2)]}
        for i in range(6)
    ]
    p = tmp_path / "prm_data.json"
    p.write_text(json.dumps(rows))
    records = _run("prm", str(p), checkpoint_dir, tmp_path)
    assert "accuracy" in records[0]
    assert all(r["n_label_tokens"] > 0 for r in records)


def test_cli_xpo(checkpoint_dir, tmp_path):
    records = _run(
        "xpo", _prompt_dataset(tmp_path), checkpoint_dir, tmp_path,
        extra={"reward_funcs": ["format", "accuracy"],
               "max_completion_length": 8, "xpo_alpha": 1e-4},
    )
    assert "loss/xpo" in records[0] and "loss/dpo" in records[0]


def test_cli_nash_md(checkpoint_dir, tmp_path):
    records = _run(
        "nash_md", _prompt_dataset(tmp_path), checkpoint_dir, tmp_path,
        extra={"reward_funcs": ["format", "accuracy"],
               "max_completion_length": 8, "mixture_coef": 0.5},
    )
    assert "objective/probability" in records[0]


def test_cli_gkd(checkpoint_dir, tmp_path):
    rows = [
        {"messages": [
            {"role": "user", "content": f"Check sample {i}."},
            {"role": "assistant", "content": "<answer>No</answer>"},
        ]}
        for i in range(6)
    ]
    p = tmp_path / "gkd_data.json"
    p.write_text(json.dumps(rows))
    records = _run(
        "gkd", str(p), checkpoint_dir, tmp_path,
        extra={"teacher_model_name_or_path": checkpoint_dir,
               "max_completion_length": 8, "gkd_lmbda": 0.5},
    )
    assert all(np.isfinite(r["loss"]) for r in records)
    assert "on_policy" in records[0]
