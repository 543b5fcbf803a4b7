"""Commercial-API eval client with a mock transport (offline), reproducing
reference GPT4Query behavior (GPT4/gpt4v.py:50-395)."""

import json
import os

import pytest

from iadr1_tpu.eval.commercial import (
    APIConfig,
    CommercialQuery,
    INSTRUCTION,
    encode_image_to_base64,
    parse_answer,
    run_commercial_eval,
)

from helpers import build_benchmark_json


def _resp(text):
    return {"choices": [{"message": {"content": text}}]}


def _gt(n_questions=1):
    return {
        "image_path": "ds/good/x.png",
        "conversation": [
            {
                "Question": f"Q{i}: any defects?",
                "Answer": "B",
                "Options": {"A": "Yes.", "B": "No."},
                "type": "Anomaly Detection",
            }
            for i in range(n_questions)
        ],
    }


def test_parse_answer_letters_and_fuzzy():
    assert parse_answer("Answer: B.") == ["B"]
    assert parse_answer("1. A\n2. B") == ["A", "B"]
    # no letter -> fuzzy match against option VALUES (gpt4v.py:228-239);
    # the expected letters below are difflib's actual choices
    options = {"A": "Yes.", "B": "No."}
    assert parse_answer("No", options) == ["B"]
    assert parse_answer("yes", options) == ["A"]
    assert parse_answer("", None) == []


def test_image_encoding_resizes_into_box(tmp_path):
    from PIL import Image

    img = Image.new("RGB", (1024, 256), (200, 10, 10))
    b64 = encode_image_to_base64(img, (512, 512))
    import base64, io

    decoded = Image.open(io.BytesIO(base64.b64decode(b64)))
    assert decoded.size == (512, 128)  # min-scale rule keeps aspect
    assert decoded.format == "JPEG"


def test_payload_structure(tmp_path):
    from PIL import Image

    img_path = str(tmp_path / "q.png")
    Image.new("RGB", (64, 64)).save(img_path)
    captured = {}

    def transport(payload, headers):
        captured.update(payload=payload, headers=headers)
        return _resp("Answer: B.")

    cfg = APIConfig(api_key="k123", model="gpt-4o")
    q = CommercialQuery(cfg, img_path, _gt(), transport=transport)
    questions, gts, got = q.generate_answer()
    assert got == ["B"] and gts == ["B"]
    payload = captured["payload"]
    assert payload["model"] == "gpt-4o"
    assert payload["max_tokens"] == 600
    sys_text = payload["messages"][0]["content"][0]["text"]
    assert sys_text == INSTRUCTION
    user = payload["messages"][1]["content"]
    kinds = [part["type"] for part in user]
    assert kinds == ["text", "image_url", "text", "text"]
    assert user[1]["image_url"]["url"].startswith("data:image/jpeg;base64,")
    assert user[1]["image_url"]["detail"] == "low"
    assert captured["headers"]["Authorization"] == "Bearer k123"


def test_retry_backoff_and_refusals(tmp_path):
    from PIL import Image

    img_path = str(tmp_path / "q.png")
    Image.new("RGB", (32, 32)).save(img_path)

    calls = {"n": 0}
    sleeps = []

    def flaky(payload, headers):
        calls["n"] += 1
        if calls["n"] == 1:
            raise ConnectionError("boom")
        if calls["n"] == 2:
            return _resp("I'm sorry, I cannot assist with that.")
        return _resp("Answer: A.")

    q = CommercialQuery(APIConfig(), img_path, _gt(), transport=flaky,
                        sleep=sleeps.append)
    out = q.send_request_to_api({"payload": 1})
    assert out == _resp("Answer: A.")
    assert calls["n"] == 3
    assert sleeps == [1.0]  # exponential backoff only on transport errors

    # permanent failure returns None after max_retries
    def always_refuse(payload, headers):
        return _resp("sorry")

    q2 = CommercialQuery(APIConfig(max_retries=2), img_path, _gt(),
                         transport=always_refuse, sleep=sleeps.append)
    assert q2.send_request_to_api({}) is None


def test_incremental_question_context(tmp_path):
    """Question i is asked with questions[:i+1] as context
    (gpt4v.py generate_answer:268-276)."""
    from PIL import Image

    img_path = str(tmp_path / "q.png")
    Image.new("RGB", (32, 32)).save(img_path)
    seen = []

    def transport(payload, headers):
        texts = [p["text"] for p in payload["messages"][1]["content"]
                 if p["type"] == "text"]
        seen.append(len(texts))
        return _resp("B")

    q = CommercialQuery(APIConfig(), img_path, _gt(3), transport=transport)
    _, _, got = q.generate_answer()
    assert got == ["B", "B", "B"]
    # 2 fixed text parts + i+1 questions
    assert seen == [3, 4, 5]


def test_run_commercial_eval_resumable(tmp_path):
    bench_path, img_root = build_benchmark_json(tmp_path)
    out_dir = str(tmp_path / "api_results")

    n_calls = {"n": 0}

    def transport(payload, headers):
        n_calls["n"] += 1
        return _resp("Answer: B.")

    path = run_commercial_eval(
        bench_path, img_root, APIConfig(), out_dir, transport=transport,
    )
    answers = json.load(open(path))
    assert len(answers) == 8
    assert all(a["gpt_answer"] == "B" for a in answers)
    assert os.path.exists(path.replace(".json", "_accuracy.csv"))

    first_calls = n_calls["n"]
    # resume: everything answered -> no new API calls
    run_commercial_eval(bench_path, img_root, APIConfig(), out_dir,
                        transport=transport)
    assert n_calls["n"] == first_calls
