"""Numerical parity of the JAX Qwen2 decoder against HF transformers (torch
CPU) on a random tiny config, plus KV-cache consistency."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # torch HF model build + logits parity

import jax
import jax.numpy as jnp

from iadr1_tpu.core.precision import FULL_PRECISION
from iadr1_tpu.models import qwen2
from iadr1_tpu.models.params_io import convert_qwen2, hf_state_from_torch

TINY = dict(
    vocab_size=128,
    hidden_size=64,
    intermediate_size=128,
    num_hidden_layers=3,
    num_attention_heads=4,
    num_key_value_heads=2,
    rms_norm_eps=1e-6,
    rope_theta=10000.0,
    max_position_embeddings=512,
    tie_word_embeddings=False,
)


@pytest.fixture(scope="module")
def hf_model():
    torch = pytest.importorskip("torch")
    from transformers import Qwen2Config as HFQwen2Config
    from transformers import Qwen2ForCausalLM

    torch.manual_seed(0)
    hf_cfg = HFQwen2Config(**TINY, attention_dropout=0.0)
    model = Qwen2ForCausalLM(hf_cfg).eval()
    return model


@pytest.fixture(scope="module")
def jax_setup(hf_model):
    cfg = qwen2.Qwen2Config(**TINY)
    params = convert_qwen2(hf_state_from_torch(hf_model), cfg)
    return cfg, params


def _jit_forward(cfg):
    @jax.jit
    def fwd(params, ids, pos):
        h, _ = qwen2.apply(params, cfg, ids, position_ids=pos, precision=FULL_PRECISION)
        return qwen2.logits(params, cfg, h, FULL_PRECISION)

    return fwd


def test_logits_parity(hf_model, jax_setup):
    import torch

    cfg, params = jax_setup
    B, T = 2, 12
    rng = np.random.default_rng(0)
    ids = rng.integers(0, TINY["vocab_size"], (B, T))

    with torch.no_grad():
        hf_out = hf_model(torch.tensor(ids)).logits.numpy()

    pos = jnp.broadcast_to(jnp.arange(T), (B, T))
    ours = np.asarray(_jit_forward(cfg)(params, jnp.asarray(ids), pos))

    np.testing.assert_allclose(ours, hf_out, rtol=2e-4, atol=2e-4)


def test_mrope_broadcast_matches_plain_rope(jax_setup):
    # With identical t/h/w position grids, M-RoPE must equal plain RoPE.
    cfg, params = jax_setup
    mcfg = qwen2.Qwen2Config(**TINY, mrope_section=(4, 2, 2))  # head_dim 16 -> 8 pairs
    B, T = 2, 8
    ids = jnp.arange(B * T).reshape(B, T) % TINY["vocab_size"]
    pos = jnp.broadcast_to(jnp.arange(T), (B, T))

    @jax.jit
    def both(params, ids, pos):
        h_plain, _ = qwen2.apply(params, cfg, ids, position_ids=pos, precision=FULL_PRECISION)
        h_mrope, _ = qwen2.apply(params, mcfg, ids, position_ids=pos, precision=FULL_PRECISION)
        return h_plain, h_mrope

    h_plain, h_mrope = both(params, ids, pos)
    np.testing.assert_allclose(
        np.asarray(h_plain), np.asarray(h_mrope), rtol=1e-5, atol=1e-5
    )


def test_kv_cache_matches_full_forward(jax_setup):
    cfg, params = jax_setup
    B, T = 2, 10
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(0, TINY["vocab_size"], (B, T)))
    pos = jnp.broadcast_to(jnp.arange(T), (B, T))

    full_logits = _jit_forward(cfg)(params, ids, pos)

    @jax.jit
    def step(params, cache, ids, pos):
        h, cache = qwen2.apply(
            params, cfg, ids, position_ids=pos, cache=cache,
            precision=FULL_PRECISION,
        )
        return qwen2.logits(params, cfg, h, FULL_PRECISION), cache

    # prefill 6 tokens, then decode 4 one at a time
    cache = qwen2.init_cache(cfg, B, max_len=16, dtype=jnp.float32)
    out, cache = step(params, cache, ids[:, :6], pos[:, :6])
    outs = [out]
    for t in range(6, T):
        out, cache = step(params, cache, ids[:, t : t + 1], pos[:, t : t + 1])
        outs.append(out)
    step_logits = jnp.concatenate(outs, axis=1)

    np.testing.assert_allclose(
        np.asarray(step_logits), np.asarray(full_logits), rtol=2e-4, atol=2e-4
    )


def test_packed_segments_isolate_sequences(jax_setup):
    # Two sequences packed into one row must produce the same hidden states
    # as the sequences run separately.
    cfg, params = jax_setup
    rng = np.random.default_rng(2)
    a = jnp.asarray(rng.integers(0, TINY["vocab_size"], (1, 5)))
    b = jnp.asarray(rng.integers(0, TINY["vocab_size"], (1, 3)))

    pos_a = jnp.arange(5)[None, :]
    pos_b = jnp.arange(3)[None, :]

    @jax.jit
    def run(params, a, b, segs):
        h_a, _ = qwen2.apply(params, cfg, a, position_ids=pos_a, precision=FULL_PRECISION)
        h_b, _ = qwen2.apply(params, cfg, b, position_ids=pos_b, precision=FULL_PRECISION)
        packed = jnp.concatenate([a, b], axis=1)
        pos = jnp.concatenate([pos_a, pos_b], axis=1)
        h_packed, _ = qwen2.apply(
            params, cfg, packed, position_ids=pos, segment_ids=segs,
            precision=FULL_PRECISION,
        )
        return h_a, h_b, h_packed

    segs = jnp.asarray([[1] * 5 + [2] * 3])
    h_a, h_b, h_packed = run(params, a, b, segs)
    np.testing.assert_allclose(
        np.asarray(h_packed[:, :5]), np.asarray(h_a), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(h_packed[:, 5:]), np.asarray(h_b), rtol=1e-5, atol=1e-5
    )


def test_grads_flow(jax_setup):
    cfg, params = jax_setup
    B, T = 2, 6
    ids = jnp.ones((B, T), jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(T), (B, T))

    def loss_fn(p):
        h, _ = qwen2.apply(p, cfg, ids, position_ids=pos, precision=FULL_PRECISION, remat=True)
        return jnp.mean(qwen2.logits(p, cfg, h, FULL_PRECISION) ** 2)

    grads = jax.jit(jax.grad(loss_fn))(params)
    flat = jax.tree.leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
    # every parameter receives gradient signal
    nonzero = [float(jnp.sum(jnp.abs(g))) > 0 for g in flat]
    assert all(nonzero)


@pytest.mark.parametrize("rope_type", ["linear", "dynamic"])
def test_rope_scaling_parity(rope_type):
    """Logit parity with HF under rope_scaling at positions beyond the
    original max (reference: model_utils/rope.py configure_rope)."""
    torch = pytest.importorskip("torch")
    from transformers import Qwen2Config as HFQwen2Config
    from transformers import Qwen2ForCausalLM

    from iadr1_tpu.models.registry import make_qwen2_bundle
    from iadr1_tpu.models.params_io import hf_state_from_torch

    orig_max = 16
    scaled = dict(
        TINY,
        max_position_embeddings=orig_max * 4,
        rope_scaling={
            "rope_type": rope_type, "factor": 4.0,
            "original_max_position_embeddings": orig_max,
        },
    )
    torch.manual_seed(1)
    hf_model = Qwen2ForCausalLM(
        HFQwen2Config(**scaled, attention_dropout=0.0)
    ).eval()

    # beyond even the enlarged 64-token max: exercises the dynamic-NTK
    # growth path (HF only rescales past config.max_position_embeddings)
    B, T = 2, 96
    rng = np.random.default_rng(1)
    ids = rng.integers(0, TINY["vocab_size"], (B, T))
    import torch as _t
    with _t.no_grad():
        hf_out = hf_model(_t.tensor(ids)).logits.numpy()

    bundle = make_qwen2_bundle(
        {**scaled, "architectures": ["Qwen2ForCausalLM"]}, attention="xla",
        precision=FULL_PRECISION,
    )
    assert bundle.cfg.rope_scaling is not None
    assert bundle.cfg.rope_scaling.type == rope_type
    params = convert_qwen2(hf_state_from_torch(hf_model), bundle.cfg)
    pos = jnp.broadcast_to(jnp.arange(T), (B, T))
    batch = {"input_ids": jnp.asarray(ids), "position_ids": pos,
             "segment_ids": jnp.ones((B, T), jnp.int32)}
    ours = np.asarray(jax.jit(
        lambda p, b: bundle.forward(p, b, remat=False))(params, batch))
    np.testing.assert_allclose(ours, hf_out, rtol=2e-4, atol=2e-4)
