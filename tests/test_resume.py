"""Training resume: interrupted-then-resumed run equals an uninterrupted one
(reference analogue: trainer.train(resume_from_checkpoint=...),
train/sft/workflow.py:101)."""

import json
import os

import numpy as np
import pytest

from helpers import (
    build_iad_rl_dataset,
    build_iad_sft_dataset,
    build_tiny_vlm_checkpoint,
)


@pytest.fixture(scope="module")
def checkpoint_dir(tmp_path_factory):
    pytest.importorskip("torch")
    return build_tiny_vlm_checkpoint(str(tmp_path_factory.mktemp("ckpt")))


def _read_latest_state(ckpt_dir):
    import orbax.checkpoint as ocp

    mgr = ocp.CheckpointManager(os.path.abspath(ckpt_dir))
    step = mgr.latest_step()
    restored = mgr.restore(step)
    mgr.close()
    return step, restored["state"]


def _sft_cfg(checkpoint_dir, data_path, img_dir, out_dir, max_steps,
             save_steps, resume=False):
    return {
        "model": {"model_name_or_path": checkpoint_dir, "attention": "xla"},
        "data": {
            "dataset": data_path, "image_dir": img_dir,
            "template": "qwen2_vl", "cutoff_len": 128, "packing": True,
            "patch_budget": 64, "min_pixels": 56 * 56,
            "max_pixels": 56 * 56 * 4,
        },
        "mesh": {"dp": 1, "fsdp": 4, "tp": 2},
        # the schedule horizon is pinned so the interrupted run (launched
        # with a shorter max_steps to simulate a kill) follows the same LR
        # curve as the uninterrupted one
        "optim": {"learning_rate": 1e-4, "warmup_ratio": 0.0,
                  "total_steps": 4},
        "train": {"output_dir": out_dir, "max_steps": max_steps,
                  "batch_size": 2, "logging_steps": 1,
                  "save_steps": save_steps, "resume": resume},
    }


def test_sft_resume_bitwise_equals_uninterrupted(checkpoint_dir, tmp_path):
    from iadr1_tpu.cli.train_sft import main

    data_path, img_dir = build_iad_sft_dataset(tmp_path)

    # uninterrupted run: 4 steps
    full_dir = str(tmp_path / "full")
    cfg = _sft_cfg(checkpoint_dir, data_path, img_dir, full_dir, 4, 0)
    p = tmp_path / "full.json"
    p.write_text(json.dumps(cfg))
    assert main(["--config", str(p)]) == 0
    step_a, state_a = _read_latest_state(os.path.join(full_dir, "checkpoints"))
    assert step_a == 4

    # interrupted at 2, then resumed to 4
    part_dir = str(tmp_path / "part")
    cfg = _sft_cfg(checkpoint_dir, data_path, img_dir, part_dir, 2, 0)
    p = tmp_path / "part.json"
    p.write_text(json.dumps(cfg))
    assert main(["--config", str(p)]) == 0

    cfg = _sft_cfg(checkpoint_dir, data_path, img_dir, part_dir, 4, 0,
                   resume=True)
    p = tmp_path / "resume.json"
    p.write_text(json.dumps(cfg))
    assert main(["--config", str(p)]) == 0
    step_b, state_b = _read_latest_state(os.path.join(part_dir, "checkpoints"))
    assert step_b == 4

    # continuous step numbering in the appended trainer log
    records = [json.loads(l) for l in
               open(os.path.join(part_dir, "trainer_log.jsonl"))]
    assert [r["current_steps"] for r in records] == [1, 2, 3, 4]

    # bitwise-identical final state (params + optimizer moments + step)
    leaves_a, leaves_b = (
        list(zip(*sorted(_flat(state_a).items()))),
        list(zip(*sorted(_flat(state_b).items()))),
    )
    assert leaves_a[0] == leaves_b[0]
    for key, a, b in zip(leaves_a[0], leaves_a[1], leaves_b[1]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=key)


def _flat(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flat(v, f"{prefix}/{k}"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flat(v, f"{prefix}/{i}"))
    else:
        out[prefix] = tree
    return out


def test_grpo_resume_continues_step_numbering(checkpoint_dir, tmp_path):
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
        "grpo": {"num_generations": 2, "max_prompt_length": 128,
                 "max_completion_length": 8},
        "mesh": {"dp": 1, "fsdp": 4, "tp": 2},
        "optim": {"learning_rate": 1e-4, "warmup_ratio": 0.0},
        "train": {"output_dir": out_dir, "max_steps": 2, "batch_size": 2,
                  "logging_steps": 1, "save_steps": 2},
    }
    p = tmp_path / "grpo1.json"
    p.write_text(json.dumps(cfg))
    assert main(["--config", str(p)]) == 0

    cfg["train"]["max_steps"] = 3
    cfg["train"]["resume"] = True
    p = tmp_path / "grpo2.json"
    p.write_text(json.dumps(cfg))
    assert main(["--config", str(p)]) == 0

    records = [json.loads(l) for l in
               open(os.path.join(out_dir, "trainer_log.jsonl"))]
    steps = [r["current_steps"] for r in records]
    assert steps == [1, 2, 3]
    _, state = _read_latest_state(os.path.join(out_dir, "checkpoints"))
    assert np.isfinite([r["loss"] for r in records]).all()
