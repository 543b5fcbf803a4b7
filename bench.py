"""Benchmark: PA-SFT train-step throughput on the flagship 0.5B-class decoder.

Runs on whatever accelerator JAX sees (the driver runs it on one real TPU
chip).  Prints ONE JSON line:
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline: measured MFU / 0.40 (the 40%-MFU north star from BASELINE.md;
the reference publishes no throughput numbers).
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from iadr1_tpu.core.metrics import (
        PEAK_FLOPS,
        ThroughputMeter,
        transformer_flops_per_token,
    )
    from iadr1_tpu.models.registry import make_qwen2_bundle
    from iadr1_tpu.train import OptimizerConfig, make_optimizer
    from iadr1_tpu.train.sft import make_chunked_sft_step
    from iadr1_tpu.train.state import create_sharded_state
    from iadr1_tpu.data.tokenize import IGNORE_INDEX

    on_tpu = jax.default_backend() == "tpu"
    # Qwen2-0.5B-shaped decoder (the LLM of LLaVA-OneVision-SI-0.5B,
    # BASELINE.json config #1), bf16 compute, packed seq.
    if on_tpu:
        hf_cfg = dict(
            vocab_size=151936, hidden_size=896, intermediate_size=4864,
            num_hidden_layers=24, num_attention_heads=14, num_key_value_heads=2,
            rope_theta=1e6, tie_word_embeddings=True,
            architectures=["Qwen2ForCausalLM"],
        )
        B, T = 8, 4096
        steps, warmup = 20, 3
    else:  # CPU smoke mode
        hf_cfg = dict(
            vocab_size=1024, hidden_size=128, intermediate_size=256,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            rope_theta=1e6, tie_word_embeddings=True,
            architectures=["Qwen2ForCausalLM"],
        )
        B, T = 2, 256
        steps, warmup = 3, 1

    bundle = make_qwen2_bundle(hf_cfg, attention="flash" if on_tpu else "xla")
    params = bundle.init_params(jax.random.PRNGKey(0))
    optimizer, schedule = make_optimizer(
        OptimizerConfig(learning_rate=1e-5, total_steps=1000)
    )
    state = create_sharded_state(params, optimizer)
    step = make_chunked_sft_step(
        bundle.hidden_fn, bundle.head_kernel_fn, optimizer, schedule,
        chunk_size=1024,
    )

    rng = np.random.default_rng(0)
    ids = rng.integers(1, hf_cfg["vocab_size"], (B, T))
    labels = ids.copy()
    labels[:, : T // 4] = IGNORE_INDEX
    batch = {
        "input_ids": jnp.asarray(ids, jnp.int32),
        "labels": jnp.asarray(labels, jnp.int32),
        "segment_ids": jnp.ones((B, T), jnp.int32),
        "position_ids": jnp.asarray(
            np.broadcast_to(np.arange(T), (B, T)).copy(), jnp.int32
        ),
    }

    # NOTE: on the tunneled TPU platform in this environment,
    # block_until_ready returns before execution finishes and the very first
    # execution of a program class can take minutes (server-side warmup).
    # A scalar fetch is the only reliable synchronization point.
    for _ in range(warmup):
        state, metrics = step(state, batch)
    _ = float(metrics["loss"])

    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = step(state, batch)
    _ = float(metrics["loss"])
    dt = time.perf_counter() - t0

    flops_tok = transformer_flops_per_token(
        hidden=hf_cfg["hidden_size"], intermediate=hf_cfg["intermediate_size"],
        num_layers=hf_cfg["num_hidden_layers"], vocab=hf_cfg["vocab_size"],
        seq_len=T, num_heads=hf_cfg["num_attention_heads"],
        num_kv_heads=hf_cfg["num_key_value_heads"],
    )
    meter = ThroughputMeter(
        flops_per_token_fwd=flops_tok,
        chip="v5e" if on_tpu else "cpu",
    )
    meter.update(B * T * steps, dt)

    print(json.dumps({
        "metric": "sft_tokens_per_sec_per_chip_0.5b",
        "value": round(meter.tokens_per_sec_per_chip, 1),
        "unit": "tokens/s/chip",
        "vs_baseline": round(meter.mfu / 0.40, 4),
        "extra": {
            "mfu": round(meter.mfu, 4),
            "backend": jax.default_backend(),
            "batch": B, "seq": T, "steps": steps,
            "loss": float(metrics["loss"]),
        },
    }))


if __name__ == "__main__":
    sys.exit(main())
