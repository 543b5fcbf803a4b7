"""Web UI: form -> job config, runner subprocess lifecycle, HTTP routes.

Counterpart of llamafactory/webui/ (interface + runner + chatter)."""

import json
import os
import time
import urllib.request

import pytest

from iadr1_tpu.webui.app import create_server
from iadr1_tpu.webui.runner import Runner, build_job_config


def test_build_job_config_sft(tmp_path):
    module, cfg = build_job_config({
        "stage": "sft", "model_name_or_path": "/ckpt", "dataset": "d.json",
        "learning_rate": "2e-5", "max_steps": "7", "batch_size": "2",
        "output_dir": str(tmp_path), "extra": {"mesh.tp": 2},
    })
    assert module == "iadr1_tpu.cli.train_sft"
    assert "stage" not in cfg          # plain sft: default stage
    assert cfg["optim"]["learning_rate"] == 2e-5
    assert cfg["train"]["max_steps"] == 7
    assert cfg["mesh"]["tp"] == 2


def test_build_job_config_stages(tmp_path):
    for stage, module, data_key in [
        ("grpo", "iadr1_tpu.cli.train_grpo", "dataset_name"),
        ("dpo", "iadr1_tpu.cli.train_pref", "dataset_name"),
        ("ppo", "iadr1_tpu.cli.train_pref", "dataset_name"),
        ("pt", "iadr1_tpu.cli.train_sft", "dataset"),
    ]:
        mod, cfg = build_job_config({
            "stage": stage, "model_name_or_path": "/ckpt",
            "dataset": "d.json", "output_dir": str(tmp_path),
        })
        assert mod == module
        assert cfg["data"][data_key] == "d.json"
        assert cfg["stage"] == stage
    with pytest.raises(ValueError, match="unknown stage"):
        build_job_config({"stage": "nope", "model_name_or_path": "x",
                          "dataset": "d", "output_dir": str(tmp_path)})


def test_runner_dry_run_and_progress(tmp_path):
    out = str(tmp_path / "run")
    runner = Runner()
    info = runner.launch({
        "stage": "sft", "model_name_or_path": "/ckpt", "dataset": "d.json",
        "output_dir": out,
    }, dry_run=True)
    # config written to disk; command points at the SFT CLI
    assert os.path.exists(os.path.join(out, "webui_job.json"))
    assert "iadr1_tpu.cli.train_sft" in info["command"]
    assert runner.progress()["state"] == "idle"

    # progress reads trainer_log.jsonl like LlamaBoard
    with open(os.path.join(out, "trainer_log.jsonl"), "w") as f:
        f.write(json.dumps({"current_steps": 1, "loss": 2.0}) + "\n")
        f.write(json.dumps({"current_steps": 2, "loss": 1.5}) + "\n")
    p = runner.progress()
    assert p["n_records"] == 2
    assert p["latest"]["loss"] == 1.5
    assert p["loss_curve"] == [[1, 2.0], [2, 1.5]]


def test_runner_subprocess_lifecycle(tmp_path):
    """launch -> running -> finished with a stub CLI module (no JAX spin-up)."""
    runner = Runner()
    runner.output_dir = str(tmp_path)
    import subprocess, sys

    runner.proc = subprocess.Popen(
        [sys.executable, "-c", "import time; time.sleep(60)"])
    assert runner.running
    assert runner.abort()
    assert not runner.running
    assert runner.progress()["state"] == "finished"


def test_http_routes(tmp_path):
    server = create_server(chat_fn=lambda m: f"echo:{m}", port=0)
    port = server.start_background()
    base = f"http://127.0.0.1:{port}"
    try:
        html = urllib.request.urlopen(base + "/").read().decode()
        assert "iadr1-tpu board" in html and "/api/train" in html

        def post(path, body):
            req = urllib.request.Request(
                base + path, data=json.dumps(body).encode(), method="POST")
            try:
                resp = urllib.request.urlopen(req)
                return resp.status, json.loads(resp.read())
            except urllib.error.HTTPError as e:
                return e.code, json.loads(e.read())

        code, out = post("/api/train", {
            "stage": "sft", "model_name_or_path": "/ckpt",
            "dataset": "d.json", "output_dir": str(tmp_path / "r"),
            "dry_run": True,
        })
        assert code == 200 and out["ok"]

        code, out = post("/api/train", {"stage": "bogus",
                                        "model_name_or_path": "x",
                                        "dataset": "d", "dry_run": True,
                                        "output_dir": str(tmp_path)})
        assert code == 400 and "unknown stage" in out["error"]

        prog = json.loads(urllib.request.urlopen(base + "/api/progress").read())
        assert prog["state"] == "idle"

        code, out = post("/api/chat", {"message": "hi"})
        assert code == 200 and out["response"] == "echo:hi"
    finally:
        server.shutdown()
