"""Hardware probe: 0.5B SFT step variants (fused CE x remat mode).

Runs the exact bench.py 0.5B leg shapes with each (fused_ce, remat)
combination in ONE process (first-execution warmup is ~400-530 s per
process on the tunneled TPU) and prints per-variant tokens/s + MFU.

Usage:  python tools/probe_sft_perf.py [--steps 20]
"""

import argparse
import json
import time

import numpy as np


def _sync(x):
    return float(np.asarray(x).ravel()[0])


def run_variant(fused_ce: bool, remat, steps: int, warmup: int = 3,
                chunk: int = 4096, batch_size: int = 8,
                logits_dtype="float32", blocks=None, rows=None,
                transposed=False):
    import os

    os.environ["IADR1_FLASH_TRANSPOSED"] = "1" if transposed else "0"

    if blocks:
        os.environ["IADR1_FLASH_BLOCKS"] = blocks
    else:
        os.environ.pop("IADR1_FLASH_BLOCKS", None)
    if rows:
        os.environ["IADR1_FLASH_STACKED_ROWS"] = str(rows)
    else:
        os.environ.pop("IADR1_FLASH_STACKED_ROWS", None)
    import jax
    import jax.numpy as jnp

    from iadr1_tpu.core.metrics import (
        ThroughputMeter, transformer_flops_per_token,
    )
    from iadr1_tpu.data.tokenize import IGNORE_INDEX
    from iadr1_tpu.models.registry import make_qwen2_bundle
    from iadr1_tpu.train import OptimizerConfig, make_optimizer
    from iadr1_tpu.train.sft import make_chunked_sft_step
    from iadr1_tpu.train.state import create_sharded_state

    hf = dict(vocab_size=151936, hidden_size=896, intermediate_size=4864,
              num_hidden_layers=24, num_attention_heads=14,
              num_key_value_heads=2, rope_theta=1e6,
              tie_word_embeddings=True,
              architectures=["Qwen2ForCausalLM"])
    B, T = batch_size, 4096

    bundle = make_qwen2_bundle(hf, attention="flash")
    params = bundle.init_params(jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    optimizer, schedule = make_optimizer(
        OptimizerConfig(learning_rate=1e-5, total_steps=1000,
                        mu_dtype="bfloat16"))
    state = create_sharded_state(params, optimizer)

    def hidden_fn(p, b):
        return bundle.hidden_fn(p, b, remat=remat)

    step = make_chunked_sft_step(
        hidden_fn, bundle.head_kernel_fn, optimizer, schedule,
        chunk_size=chunk, fused_ce=fused_ce,
        logits_dtype=getattr(jnp, logits_dtype),
    )
    rng = np.random.default_rng(0)
    ids = rng.integers(1, hf["vocab_size"], (B, T))
    labels = ids.copy()
    labels[:, : T // 4] = IGNORE_INDEX
    batch = {
        "input_ids": jnp.asarray(ids, jnp.int32),
        "labels": jnp.asarray(labels, jnp.int32),
        "segment_ids": jnp.ones((B, T), jnp.int32),
        "position_ids": jnp.asarray(
            np.broadcast_to(np.arange(T), (B, T)).copy(), jnp.int32),
    }
    for _ in range(warmup):
        state, metrics = step(state, batch)
    _sync(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = step(state, batch)
    loss = _sync(metrics["loss"])
    dt = time.perf_counter() - t0

    meter = ThroughputMeter(
        flops_per_token_fwd=transformer_flops_per_token(
            hidden=hf["hidden_size"], intermediate=hf["intermediate_size"],
            num_layers=hf["num_hidden_layers"], vocab=hf["vocab_size"],
            seq_len=T, num_heads=hf["num_attention_heads"],
            num_kv_heads=hf["num_key_value_heads"]),
        chip="v5e",
    )
    meter.update(B * T * steps, dt)
    del state, params
    return {"tokens_per_sec": round(meter.tokens_per_sec_per_chip, 1),
            "mfu": round(meter.mfu, 4), "loss": round(loss, 4),
            "step_sec": round(dt / steps, 4)}


def main():
    import sys

    sys.path.insert(0, "/root/repo")
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--variants", type=str, default=None,
                    help="comma list like 'base,fused,fused_qkv'")
    args = ap.parse_args()

    all_variants = {
        "base": dict(fused_ce=False, remat=True),
        "fused": dict(fused_ce=True, remat=True),
        "fused_qkv": dict(fused_ce=True, remat="save_qkv"),
        "qkv": dict(fused_ce=False, remat="save_qkv"),
        "fused_b16": dict(fused_ce=True, remat="save_qkv", batch_size=16),
        "fused_chunk8k": dict(fused_ce=True, remat="save_qkv", chunk=8192),
        "qkv_bf16logits": dict(fused_ce=False, remat="save_qkv",
                               logits_dtype="bfloat16"),
        "fused_bf16logits": dict(fused_ce=True, remat="save_qkv",
                                 logits_dtype="bfloat16"),
        "qkv_chunk8k": dict(fused_ce=False, remat="save_qkv", chunk=8192),
        "qkv_chunk2k": dict(fused_ce=False, remat="save_qkv", chunk=2048),
        "qkv_bf16_chunk8k": dict(fused_ce=False, remat="save_qkv",
                                 chunk=8192, logits_dtype="bfloat16"),
        # flash block retunes on the stacked-GQA kernels (env override;
        # "bq,bk,bq_dkv,bk_dkv,bq_dq,bk_dq")
        "qkv_bf16_dq512": dict(fused_ce=False, remat="save_qkv",
                               logits_dtype="bfloat16",
                               blocks="512,512,512,512,512,512"),
        "qkv_bf16_dkvk1024": dict(fused_ce=False, remat="save_qkv",
                                  logits_dtype="bfloat16",
                                  blocks="512,512,512,1024,256,512"),
        "qkv_bf16_dkvq256": dict(fused_ce=False, remat="save_qkv",
                                 logits_dtype="bfloat16",
                                 blocks="512,512,256,512,256,512"),
        "qkv_bf16_fwdk1024": dict(fused_ce=False, remat="save_qkv",
                                  logits_dtype="bfloat16",
                                  blocks="512,1024,512,512,256,512"),
        "qkv_bf16_dqk1024": dict(fused_ce=False, remat="save_qkv",
                                 logits_dtype="bfloat16",
                                 blocks="512,512,512,512,256,1024"),
        "qkv_bf16_fwdq256k1024": dict(fused_ce=False, remat="save_qkv",
                                      logits_dtype="bfloat16",
                                      blocks="256,1024,512,512,256,512"),
        "qkv_bf16_fwdq1024": dict(fused_ce=False, remat="save_qkv",
                                  logits_dtype="bfloat16",
                                  blocks="1024,512,512,512,256,512"),
        "qkv_bf16_fwdk1024_dkvq1024": dict(fused_ce=False, remat="save_qkv",
                                           logits_dtype="bfloat16",
                                           blocks="512,1024,1024,512,256,512"),
        "qkv_bf16_fwdk1024_dkvq256": dict(fused_ce=False, remat="save_qkv",
                                          logits_dtype="bfloat16",
                                          blocks="512,1024,256,512,256,512"),
        "qkv_bf16_fwdk1024_dq128": dict(fused_ce=False, remat="save_qkv",
                                        logits_dtype="bfloat16",
                                        blocks="512,1024,512,512,128,512"),
        "fwdk1024_rows4096": dict(fused_ce=False, remat="save_qkv",
                                  logits_dtype="bfloat16", rows=4096,
                                  blocks="512,1024,256,512,128,512"),
        "fwdk512_rows4096": dict(fused_ce=False, remat="save_qkv",
                                 logits_dtype="bfloat16", rows=4096,
                                 blocks="512,512,256,512,128,512"),
        "fwd_bq256k2048": dict(fused_ce=False, remat="save_qkv",
                               logits_dtype="bfloat16",
                               blocks="256,2048,512,512,256,512"),
        "fwd_bq384k1024": dict(fused_ce=False, remat="save_qkv",
                               logits_dtype="bfloat16", rows=2688,
                               blocks="384,1024,512,512,256,512"),
        "fwd_bq256k1536": dict(fused_ce=False, remat="save_qkv",
                               logits_dtype="bfloat16",
                               blocks="256,1536,512,512,256,512"),
        "transposed": dict(fused_ce=False, remat="save_qkv",
                           logits_dtype="bfloat16", transposed=True),
        "transposed_k512": dict(fused_ce=False, remat="save_qkv",
                                logits_dtype="bfloat16", transposed=True,
                                blocks="512,512,512,512,256,512"),
        "transposed_k2048": dict(fused_ce=False, remat="save_qkv",
                                 logits_dtype="bfloat16", transposed=True,
                                 blocks="512,2048,512,512,256,512"),
        "transposed_r1344k1024": dict(fused_ce=False, remat="save_qkv",
                                      logits_dtype="bfloat16",
                                      transposed=True, rows=1344,
                                      blocks="512,1024,512,512,256,512"),
        "b12": dict(fused_ce=False, remat="save_qkv",
                    logits_dtype="bfloat16", batch_size=12),
        "b16": dict(fused_ce=False, remat="save_qkv",
                    logits_dtype="bfloat16", batch_size=16),
        "b4": dict(fused_ce=False, remat="save_qkv",
                   logits_dtype="bfloat16", batch_size=4),
    }
    names = (args.variants.split(",") if args.variants
             else ["base", "fused", "fused_qkv", "qkv"])

    from bench import _release_device_memory  # noqa: E402

    results = {}
    for name in names:
        kw = all_variants[name]
        try:
            results[name] = run_variant(steps=args.steps, **kw)
        except Exception as e:  # noqa: BLE001
            results[name] = {"error": f"{type(e).__name__}: {str(e)[:300]}"}
        _release_device_memory()
        print(name, "->", json.dumps(results[name]), flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
