"""Int8 weight-only quantization: roundtrip accuracy, forward fidelity,
generation through the rollout engine (models/quant.py; counterpart of the
reference's model/patcher quantization hooks)."""

import numpy as np

import jax
import jax.numpy as jnp

from iadr1_tpu.models.quant import (
    default_quant_predicate,
    dequantize_kernel,
    is_quantized,
    quantize_kernel,
    quantize_tree,
    quantized_bytes,
)
from iadr1_tpu.models.registry import make_qwen2_bundle
from iadr1_tpu.train.rollout import RolloutEngine, SamplingConfig

TINY = dict(
    vocab_size=600, hidden_size=64, intermediate_size=128,
    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    rope_theta=10000.0, tie_word_embeddings=True,
    architectures=["Qwen2ForCausalLM"],
)


def test_kernel_roundtrip():
    w = jax.random.normal(jax.random.PRNGKey(0), (3, 32, 48)) * 0.2
    qk = quantize_kernel(w)
    assert qk["qvalues"].dtype == jnp.int8
    assert qk["scales"].shape == (3, 1, 48)
    deq = dequantize_kernel(qk)
    # per-channel symmetric int8: max error bounded by scale/2 per channel
    err = np.abs(np.asarray(deq) - np.asarray(w))
    bound = np.asarray(qk["scales"]) / 2 + 1e-7
    assert (err <= bound).all()


def test_quantize_tree_targets():
    bundle = make_qwen2_bundle(TINY, attention="xla")
    params = bundle.init_params(jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    qparams = quantize_tree(params)
    assert is_quantized(qparams["layers"]["mlp"]["up"]["kernel"])
    assert is_quantized(qparams["layers"]["attn"]["q"]["kernel"])
    # embeddings (and the tied head) stay full precision
    assert qparams["embed"]["weight"].dtype == jnp.bfloat16
    now, bf16 = quantized_bytes(qparams)
    assert now < bf16  # actual shrink


def test_quantized_forward_close():
    bundle = make_qwen2_bundle(TINY, attention="xla")
    params = bundle.init_params(jax.random.PRNGKey(0))
    qparams = quantize_tree(params)
    rng = np.random.default_rng(0)
    B, T = 2, 16
    batch = {
        "input_ids": jnp.asarray(rng.integers(1, 600, (B, T)), jnp.int32),
        "segment_ids": jnp.ones((B, T), jnp.int32),
        "position_ids": jnp.asarray(
            np.broadcast_to(np.arange(T), (B, T)).copy(), jnp.int32),
    }
    full = np.asarray(jax.jit(bundle.forward)(params, batch), np.float64)
    quant = np.asarray(jax.jit(bundle.forward)(qparams, batch), np.float64)
    # logits track closely; ranking of the argmax token is preserved for
    # the overwhelming majority of positions
    denom = np.abs(full).max()
    assert np.abs(full - quant).max() / denom < 0.15
    agree = (full.argmax(-1) == quant.argmax(-1)).mean()
    assert agree > 0.9


def test_quantized_generation_runs():
    bundle = make_qwen2_bundle(TINY, attention="xla")
    params = bundle.init_params(jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    qparams = quantize_tree(params)
    sampling = SamplingConfig(max_new_tokens=4, temperature=0.0,
                              eos_token_id=-1, pad_token_id=0)
    engine = RolloutEngine(bundle, sampling, max_len=16)
    batch = {
        "input_ids": jnp.asarray([[5, 6, 7, 8]], jnp.int32),
        "attention_mask": jnp.ones((1, 4), jnp.int32),
    }
    out = engine.generate(qparams, batch, jax.random.PRNGKey(0))
    ids = np.asarray(out["completion_ids"])
    assert ids.shape == (1, 4)
    assert (ids >= 0).all()
