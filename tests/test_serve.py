"""OpenAI-compatible server: real HTTP round-trips against a tiny model."""

import base64
import io
import json
import urllib.request

import numpy as np
import pytest

import jax

from iadr1_tpu.data.template import get_template
from iadr1_tpu.eval.generator import GeneratorConfig, VLMGenerator
from iadr1_tpu.models.registry import make_qwen2_vl_bundle
from iadr1_tpu.serve.api import ChatServer, parse_openai_messages

from helpers import tiny_qwen_tokenizer


@pytest.fixture(scope="module")
def server():
    tok = tiny_qwen_tokenizer()
    hf_cfg = dict(
        architectures=["Qwen2VLForConditionalGeneration"],
        text_config=dict(
            vocab_size=max(tok.vocab_size, 600), hidden_size=64,
            intermediate_size=128, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2,
            rope_theta=10000.0, tie_word_embeddings=True,
            rope_scaling={"type": "mrope", "mrope_section": [4, 2, 2]},
        ),
        vision_config=dict(depth=2, embed_dim=32, hidden_size=64, num_heads=4,
                           patch_size=14, spatial_merge_size=2,
                           temporal_patch_size=2),
        image_token_id=tok.convert_tokens_to_ids("<|image_pad|>"),
        vision_start_token_id=tok.convert_tokens_to_ids("<|vision_start|>"),
        vision_end_token_id=tok.convert_tokens_to_ids("<|vision_end|>"),
    )
    bundle = make_qwen2_vl_bundle(hf_cfg, attention="xla")
    params = bundle.init_params(jax.random.PRNGKey(0))
    gen = VLMGenerator(
        bundle, params, tok, get_template("qwen2_vl"),
        GeneratorConfig(max_prompt_length=64, max_new_tokens=6,
                        batch_size=1, patch_budget=64,
                        max_pixels=56 * 56 * 2),
    )
    srv = ChatServer(gen, port=0)
    srv.start_background()
    yield srv
    srv.shutdown()


def _post(server, path, body):
    req = urllib.request.Request(
        f"http://127.0.0.1:{server.port}{path}",
        data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req) as resp:
        return json.loads(resp.read())


def test_models_endpoint(server):
    with urllib.request.urlopen(
        f"http://127.0.0.1:{server.port}/v1/models"
    ) as resp:
        data = json.loads(resp.read())
    assert data["data"][0]["id"] == "iadr1-tpu"


def test_text_chat_completion(server):
    out = _post(server, "/v1/chat/completions", {
        "model": "iadr1-tpu",
        "messages": [{"role": "user", "content": "Hello"}],
    })
    assert out["object"] == "chat.completion"
    assert out["choices"][0]["finish_reason"] == "stop"
    assert isinstance(out["choices"][0]["message"]["content"], str)


def test_multimodal_chat_completion(server):
    from PIL import Image

    img = Image.fromarray(
        np.random.default_rng(0).integers(0, 255, (56, 56, 3), np.uint8)
    )
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    url = "data:image/png;base64," + base64.b64encode(buf.getvalue()).decode()
    out = _post(server, "/v1/chat/completions", {
        "messages": [{
            "role": "user",
            "content": [
                {"type": "image_url", "image_url": {"url": url}},
                {"type": "text", "text": "Any defects?"},
            ],
        }],
    })
    assert out["choices"][0]["finish_reason"] == "stop"


def test_bad_request(server):
    req = urllib.request.Request(
        f"http://127.0.0.1:{server.port}/v1/chat/completions",
        data=b"{}", headers={"Content-Type": "application/json"},
    )
    try:
        urllib.request.urlopen(req)
        assert False, "expected 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400


def test_parse_openai_messages():
    msgs, images, system = parse_openai_messages([
        {"role": "system", "content": "be brief"},
        {"role": "user", "content": [
            {"type": "text", "text": "look: "},
            {"type": "image_url",
             "image_url": {"url": "data:image/png;base64," + base64.b64encode(
                 _png_bytes()).decode()}},
        ]},
    ])
    assert system == "be brief"
    assert msgs == [{"role": "user", "content": "look: <image>"}]
    assert len(images) == 1


def _png_bytes():
    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (8, 8)).save(buf, format="PNG")
    return buf.getvalue()


def test_score_evaluation_405_without_reward_model(server):
    import urllib.error

    with pytest.raises(urllib.error.HTTPError) as exc:
        _post(server, "/v1/score/evaluation",
              {"model": "m", "messages": ["some text"]})
    assert exc.value.code == 405  # generative-only (reference app.py:120-121)


def test_score_evaluation_endpoint():
    scored = {}

    def score_fn(texts, max_length):
        scored["args"] = (list(texts), max_length)
        return [float(len(t)) for t in texts]

    srv = ChatServer(generator=None, port=0, score_fn=score_fn)
    srv.start_background()
    try:
        out = _post(srv, "/v1/score/evaluation",
                    {"model": "rm", "messages": ["ab", "cdef"],
                     "max_length": 32})
        assert out["object"] == "score.evaluation"
        assert out["scores"] == [2.0, 4.0]
        assert out["id"].startswith("scoreval-")
        assert scored["args"] == (["ab", "cdef"], 32)
    finally:
        srv.shutdown()


def test_request_batcher_coalesces_and_orders():
    """Concurrent submits coalesce into one generate call; results map to
    their requests in order; failures deliver per-request."""
    import threading
    import time

    from iadr1_tpu.serve.batcher import RequestBatcher

    calls = []

    def generate(requests):
        calls.append(len(requests))
        time.sleep(0.02)
        return [f"re:{r}" for r in requests]

    b = RequestBatcher(generate, max_batch=4, max_wait_ms=50)
    results = {}

    def worker(i):
        results[i] = b.submit(f"q{i}")

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert results == {i: f"re:q{i}" for i in range(6)}
    # 6 requests over max_batch=4 -> at most 3 generate calls, at least
    # one of them genuinely batched
    assert len(calls) <= 3 and max(calls) >= 2, calls

    # failure propagates to every member of the failed batch
    def boom(requests):
        raise RuntimeError("backend down")

    b2 = RequestBatcher(boom, max_batch=2, max_wait_ms=5)
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="backend down"):
        b2.submit("x")
    b.close()
    b2.close()


def test_chat_server_batched_path():
    """ChatServer with max_batch>1 answers through the batcher."""
    from iadr1_tpu.serve.api import ChatServer

    class FakeGen:
        def generate(self, requests):
            return ["ok:" + r["messages"][-1]["content"] for r in requests]

    srv = ChatServer(FakeGen(), max_batch=4, batch_wait_ms=5)
    out = srv.handle_chat({"messages": [{"role": "user", "content": "hi"}]})
    assert out["choices"][0]["message"]["content"] == "ok:hi"
