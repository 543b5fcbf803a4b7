"""Reporters (wandb-style), loss-curve plotting, and the MMLU evaluator."""

import json
import os
import sys
import types

import numpy as np
import pytest

import jax


def test_smooth_matches_reference_ema():
    """EMA goldens from executing the reference smooth() (ploting.py:34-48)."""
    from iadr1_tpu.train.reporters import smooth

    vals = [2.0, 1.5, 1.2, 1.0, 0.9]
    out = smooth(vals)
    import math
    w = 1.8 * (1 / (1 + math.exp(-0.05 * 5)) - 0.5)
    last, want = vals[0], []
    for v in vals:
        last = last * w + (1 - w) * v
        want.append(last)
    np.testing.assert_allclose(out, want)
    assert smooth([]) == []


def test_plot_loss_writes_png(tmp_path):
    from iadr1_tpu.train.reporters import plot_loss

    log = tmp_path / "trainer_log.jsonl"
    with open(log, "w") as f:
        for i in range(5):
            f.write(json.dumps({"current_steps": i + 1,
                                "loss": 2.0 / (i + 1)}) + "\n")
    paths = plot_loss(str(tmp_path))
    assert paths and os.path.exists(paths[0])
    assert paths[0].endswith("training_loss.png")
    assert os.path.getsize(paths[0]) > 1000


def test_wandb_reporter_with_fake_module(monkeypatch):
    calls = {"log": [], "finished": False}

    fake = types.ModuleType("wandb")

    class _Run:
        def finish(self):
            calls["finished"] = True

    def init(project=None, name=None, config=None):
        calls["init"] = dict(project=project, name=name, config=config)
        return _Run()

    fake.init = init
    fake.log = lambda metrics, step=None: calls["log"].append((step, metrics))
    monkeypatch.setitem(sys.modules, "wandb", fake)

    from iadr1_tpu.train.reporters import make_reporters

    rep = make_reporters(["wandb"], run_name="run1", config={"lr": 1e-4})
    rep.log(3, {"loss": 0.5})
    rep.finish()
    assert calls["init"]["project"] == "iadr1_tpu"
    assert calls["log"] == [(3, {"loss": 0.5})]
    assert calls["finished"]

    assert make_reporters(["none"]).reporters == []
    with pytest.raises(ValueError):
        make_reporters(["swanlab"])


def test_mmlu_evaluator(tmp_path):
    from helpers import tiny_qwen_tokenizer
    from iadr1_tpu.eval.mmlu import MMLUEvaluator, format_example
    from iadr1_tpu.models.registry import make_qwen2_bundle

    tok = tiny_qwen_tokenizer()
    hf = dict(vocab_size=max(tok.vocab_size, 600), hidden_size=64,
              intermediate_size=128, num_hidden_layers=2,
              num_attention_heads=4, num_key_value_heads=2,
              rope_theta=1e4, tie_word_embeddings=True,
              architectures=["Qwen2ForCausalLM"])
    bundle = make_qwen2_bundle(hf, attention="xla")
    params = bundle.init_params(jax.random.PRNGKey(0))

    # prompt format matches the reference eval template (eval/template.py)
    ex = {"question": "Is this a defect?", "A": "yes", "B": "no",
          "C": "maybe", "D": "unknown", "answer": "B"}
    text, ans = format_example(ex, [ex], "anomaly detection")
    assert text.startswith(
        "The following are multiple choice questions (with answers) about "
        "anomaly detection.\n\n")
    assert "\nA. yes\nB. no\nC. maybe\nD. unknown\nAnswer:" in text
    assert text.count("Answer:") == 2  # 1-shot + target
    assert " B\n\n" in text            # support answer inlined
    assert ans == "B"

    task_dir = tmp_path / "task"
    task_dir.mkdir()
    subject = {
        "train": [ex],
        "test": [ex, {**ex, "answer": "A"}],
    }
    (task_dir / "anomaly.json").write_text(json.dumps(subject))
    (task_dir / "mapping.json").write_text(json.dumps(
        {"anomaly": {"name": "anomaly detection", "category": "STEM"}}))

    ev = MMLUEvaluator(bundle, params, tok, max_length=128, batch_size=2)
    scores = ev.eval_task(str(task_dir), n_shot=1,
                          save_dir=str(tmp_path / "out"))
    assert set(scores) == {"STEM", "Average"}
    assert 0.0 <= scores["Average"] <= 100.0
    saved = json.load(open(tmp_path / "out" / "results.json"))
    assert "anomaly" in saved["results"]
    preds = list(saved["results"]["anomaly"].values())
    assert all(p in "ABCD" for p in preds)


def test_zh_eval_template():
    """CMMLU / C-Eval use the zh template (reference eval/template.py:74-79)."""
    from iadr1_tpu.eval.mmlu import format_example

    ex = {"question": "题目", "A": "甲", "B": "乙", "answer": "B"}
    p, a = format_example(ex, [], "数学", lang="zh")
    assert p == (
        "以下是中国关于数学考试的单项选择题，请选出其中的正确答案。\n\n"
        "题目\nA. 甲\nB. 乙\n答案："
    )
    assert a == "B"
