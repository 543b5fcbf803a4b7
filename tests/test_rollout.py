"""Rollout engine: greedy decode parity vs HF generate, EOS masking,
sampling-path shape/determinism checks."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from iadr1_tpu.models.registry import make_qwen2_bundle
from iadr1_tpu.models.params_io import convert_qwen2, hf_state_from_torch
from iadr1_tpu.train.rollout import RolloutEngine, SamplingConfig, sample_token

TINY = dict(
    vocab_size=128, hidden_size=64, intermediate_size=128,
    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    rms_norm_eps=1e-6, rope_theta=10000.0, max_position_embeddings=512,
    tie_word_embeddings=False,
)


@pytest.fixture(scope="module")
def setup():
    torch = pytest.importorskip("torch")
    from transformers import Qwen2Config as HFC, Qwen2ForCausalLM

    torch.manual_seed(0)
    hf_model = Qwen2ForCausalLM(HFC(**TINY, attention_dropout=0.0)).eval()
    bundle = make_qwen2_bundle({**TINY, "architectures": ["Qwen2ForCausalLM"]},
                               attention="xla")
    params = convert_qwen2(hf_state_from_torch(hf_model), bundle.cfg)
    return hf_model, bundle, params


def test_greedy_matches_hf_generate(setup):
    import torch

    hf_model, bundle, params = setup
    B, P, N = 3, 10, 12
    rng = np.random.default_rng(0)
    # left-padded prompts of different lengths
    pad_id, eos_id = 0, 1
    lens = [10, 7, 4]
    ids = np.full((B, P), pad_id, np.int64)
    mask = np.zeros((B, P), np.int64)
    for b, L in enumerate(lens):
        ids[b, P - L :] = rng.integers(2, TINY["vocab_size"], L)
        mask[b, P - L :] = 1

    with torch.no_grad():
        hf_out = hf_model.generate(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask),
            max_new_tokens=N, do_sample=False,
            pad_token_id=pad_id, eos_token_id=eos_id,
        ).numpy()[:, P:]

    engine = RolloutEngine(
        bundle,
        SamplingConfig(max_new_tokens=N, temperature=0.0,
                       eos_token_id=eos_id, pad_token_id=pad_id),
        max_len=P + N, cache_dtype=jnp.float32,
    )
    out = engine.generate(
        params,
        {"input_ids": jnp.asarray(ids, jnp.int32),
         "attention_mask": jnp.asarray(mask, jnp.int32)},
        jax.random.PRNGKey(0),
    )
    ours = np.asarray(out["completion_ids"])

    # compare up to each row's first EOS (HF pads after EOS too)
    for b in range(B):
        hf_row = hf_out[b]
        row = ours[b]
        n = min(len(hf_row), len(row))
        np.testing.assert_array_equal(row[:n], hf_row[:n], err_msg=f"row {b}")


def test_eos_masking(setup):
    _, bundle, params = setup
    B, P, N = 2, 6, 8
    ids = np.full((B, P), 5, np.int64)
    mask = np.ones((B, P), np.int64)
    engine = RolloutEngine(
        bundle, SamplingConfig(max_new_tokens=N, temperature=0.0,
                               eos_token_id=1, pad_token_id=0),
        max_len=P + N, cache_dtype=jnp.float32,
    )
    out = engine.generate(
        params,
        {"input_ids": jnp.asarray(ids, jnp.int32),
         "attention_mask": jnp.asarray(mask, jnp.int32)},
        jax.random.PRNGKey(0),
    )
    comp = np.asarray(out["completion_ids"])
    m = np.asarray(out["completion_mask"])
    for b in range(B):
        eos_pos = np.nonzero(comp[b] == 1)[0]
        if len(eos_pos):
            e = eos_pos[0]
            assert m[b, : e + 1].all() and not m[b, e + 1 :].any()
            assert (comp[b, e + 1 :] == 0).all()  # pad after EOS
        else:
            assert m[b].all()


def test_sampling_deterministic_per_key(setup):
    _, bundle, params = setup
    B, P, N = 2, 4, 6
    ids = np.full((B, P), 7, np.int64)
    mask = np.ones((B, P), np.int64)
    engine = RolloutEngine(
        bundle, SamplingConfig(max_new_tokens=N, temperature=0.9,
                               top_p=0.9, top_k=50,
                               eos_token_id=1, pad_token_id=0),
        max_len=P + N, cache_dtype=jnp.float32,
    )
    batch = {"input_ids": jnp.asarray(ids, jnp.int32),
             "attention_mask": jnp.asarray(mask, jnp.int32)}
    a = np.asarray(engine.generate(params, batch, jax.random.PRNGKey(3))["completion_ids"])
    b = np.asarray(engine.generate(params, batch, jax.random.PRNGKey(3))["completion_ids"])
    c = np.asarray(engine.generate(params, batch, jax.random.PRNGKey(4))["completion_ids"])
    np.testing.assert_array_equal(a, b)
    assert (a != c).any()


def test_top_p_masking_math():
    # distribution [0.5, 0.3, 0.15, 0.05]: top_p=0.6 keeps tokens whose
    # preceding cumulative mass < 0.6 -> tokens 0 and 1
    logits = jnp.log(jnp.asarray([[0.5, 0.3, 0.15, 0.05]]))
    counts = np.zeros(4)
    for i in range(200):
        t = sample_token(
            jax.random.PRNGKey(i), logits,
            SamplingConfig(temperature=1.0, top_p=0.6, top_k=4),
        )
        counts[int(t[0])] += 1
    assert counts[2] == 0 and counts[3] == 0
    assert counts[0] > counts[1] > 0


def test_grouped_prefix_cached_generate(setup):
    """group_size=G (the vLLM prefix-caching analogue): one prefill per
    unique prompt, KV cache fanned out G ways.  Greedy grouped decode must
    equal the ungrouped decode of the repeated batch exactly."""
    _, bundle, params = setup
    B, P, N, G = 2, 8, 6, 3
    rng = np.random.default_rng(1)
    ids = rng.integers(1, TINY["vocab_size"], (B, P))
    mask = np.ones((B, P), np.int64)
    mask[1, :3] = 0  # one left-padded row
    engine = RolloutEngine(
        bundle, SamplingConfig(max_new_tokens=N, temperature=0.0,
                               eos_token_id=-1, pad_token_id=0),
        max_len=P + N, cache_dtype=jnp.float32,
    )
    unique = {"input_ids": jnp.asarray(ids, jnp.int32),
              "attention_mask": jnp.asarray(mask, jnp.int32)}
    grouped = engine.generate(params, unique, jax.random.PRNGKey(0),
                              group_size=G)
    # prompts repeat consecutively
    np.testing.assert_array_equal(
        np.asarray(grouped["prompt_ids"]), np.repeat(ids, G, axis=0))
    np.testing.assert_array_equal(
        np.asarray(grouped["prompt_mask"]), np.repeat(mask, G, axis=0))
    # greedy: grouped output == ungrouped output of the repeated batch
    repeated = {"input_ids": jnp.asarray(np.repeat(ids, G, 0), jnp.int32),
                "attention_mask": jnp.asarray(np.repeat(mask, G, 0),
                                              jnp.int32)}
    plain = engine.generate(params, repeated, jax.random.PRNGKey(0))
    np.testing.assert_array_equal(
        np.asarray(grouped["completion_ids"]),
        np.asarray(plain["completion_ids"]))

    # sampled: rows within a group must differ (independent samples)
    engine_s = RolloutEngine(
        bundle, SamplingConfig(max_new_tokens=N, temperature=1.0,
                               top_k=0, top_p=1.0,
                               eos_token_id=-1, pad_token_id=0),
        max_len=P + N, cache_dtype=jnp.float32,
    )
    sampled = np.asarray(engine_s.generate(
        params, unique, jax.random.PRNGKey(5),
        group_size=G)["completion_ids"])
    assert (sampled[0] != sampled[1]).any() or (sampled[1] != sampled[2]).any()


def test_early_stop_matches_full_scan(setup):
    """lax.while_loop early exit is output-identical to the fixed-trip
    scan (sampled path, mixed EOS timings)."""
    _, bundle, params = setup
    B, P, N = 3, 8, 16
    rng = np.random.default_rng(4)
    ids = rng.integers(2, TINY["vocab_size"], (B, P))
    batch = {"input_ids": jnp.asarray(ids, jnp.int32),
             "attention_mask": jnp.ones((B, P), jnp.int32)}
    outs = {}
    for early in (True, False):
        engine = RolloutEngine(
            bundle,
            SamplingConfig(max_new_tokens=N, temperature=1.0, top_k=0,
                           top_p=1.0, eos_token_id=7, pad_token_id=0,
                           early_stop=early),
            max_len=P + N, cache_dtype=jnp.float32,
        )
        out = engine.generate(params, batch, jax.random.PRNGKey(3))
        outs[early] = (np.asarray(out["completion_ids"]),
                       np.asarray(out["completion_mask"]))
    np.testing.assert_array_equal(outs[True][0], outs[False][0])
    np.testing.assert_array_equal(outs[True][1], outs[False][1])
