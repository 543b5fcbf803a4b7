"""Benchmark suite: SFT (text + VLM), rollout decode, and a full GRPO step.

Runs on whatever accelerator JAX sees (the driver runs it on one real TPU
chip; CPU gets tiny smoke shapes).  Prints ONE JSON line:

    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "extra": {...}}

Headline metric: PA-SFT train-step throughput on the 0.5B-class decoder
(the LLM of LLaVA-OneVision-SI-0.5B, BASELINE.json config #1).
vs_baseline = measured MFU / 0.40 (the 40%-MFU north star from BASELINE.md;
the reference publishes no throughput numbers).  MFU uses the v5e bf16 peak
of 197 TF/s.

extra carries the other benches:
* vlm_sft_tokens_per_sec / vlm_mfu -- packed LLaVA-OneVision-0.5B-shaped
  SFT step (SigLIP tower + anyres pack + feature scatter), full-parameter.
* rollout_decode_tokens_per_sec -- the vLLM-replacement path: flash prefill
  + ragged Pallas decode kernel, B=16, P=1024, N=512.
* grpo_step_sec / grpo_rollouts_per_sec -- one full SC-GRPO step
  (G-way rollout + host rewards + chunked-logp update, ref model in bf16).
"""

import json
import sys
import time

import numpy as np


def _sync(x):
    # on the tunneled TPU, a scalar fetch is the only reliable sync point
    return float(np.asarray(x).ravel()[0])


def bench_sft_text(on_tpu: bool) -> dict:
    import jax
    import jax.numpy as jnp

    from iadr1_tpu.core.metrics import ThroughputMeter, transformer_flops_per_token
    from iadr1_tpu.data.tokenize import IGNORE_INDEX
    from iadr1_tpu.models.registry import make_qwen2_bundle
    from iadr1_tpu.train import OptimizerConfig, make_optimizer
    from iadr1_tpu.train.sft import make_chunked_sft_step
    from iadr1_tpu.train.state import create_sharded_state

    if on_tpu:
        hf = dict(vocab_size=151936, hidden_size=896, intermediate_size=4864,
                  num_hidden_layers=24, num_attention_heads=14,
                  num_key_value_heads=2, rope_theta=1e6,
                  tie_word_embeddings=True,
                  architectures=["Qwen2ForCausalLM"])
        B, T, steps, warmup = 8, 4096, 20, 3
    else:
        hf = dict(vocab_size=1024, hidden_size=128, intermediate_size=256,
                  num_hidden_layers=2, num_attention_heads=4,
                  num_key_value_heads=2, rope_theta=1e6,
                  tie_word_embeddings=True,
                  architectures=["Qwen2ForCausalLM"])
        B, T, steps, warmup = 2, 256, 3, 1

    bundle = make_qwen2_bundle(hf, attention="flash" if on_tpu else "xla")
    # bf16 weights + bf16 Adam first moment + 4096-token CE chunks: the
    # measured-best v5e recipe (matches the reference's --bf16 envelope);
    # each worth ~+0.5-1.1pt MFU over f32 params / 1024 chunks
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    params = bundle.init_params(jax.random.PRNGKey(0), dtype=dtype)
    optimizer, schedule = make_optimizer(
        OptimizerConfig(learning_rate=1e-5, total_steps=1000,
                        mu_dtype="bfloat16" if on_tpu else None)
    )
    state = create_sharded_state(params, optimizer)
    step = make_chunked_sft_step(
        bundle.hidden_fn, bundle.head_kernel_fn, optimizer, schedule,
        chunk_size=4096 if on_tpu else 1024,
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
        chip="v5e" if on_tpu else "cpu",
    )
    meter.update(B * T * steps, dt)
    return {"tokens_per_sec": round(meter.tokens_per_sec_per_chip, 1),
            "mfu": round(meter.mfu, 4), "loss": loss,
            "batch": B, "seq": T}


def bench_sft_vlm(on_tpu: bool) -> dict:
    """LLaVA-OneVision-0.5B-shaped packed VLM step: SigLIP tower + anyres
    feature pack + scatter into the packed token stream (BASELINE.json
    config #1; the reference equivalent is the PA-SFT recipe)."""
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from iadr1_tpu.core.metrics import (
        ThroughputMeter, transformer_flops_per_token, vit_flops_per_patch,
    )
    from iadr1_tpu.data.collator import VLMBatchBuilder
    from iadr1_tpu.data.tokenize import IGNORE_INDEX
    from iadr1_tpu.models.registry import make_llava_onevision_bundle
    from iadr1_tpu.train import OptimizerConfig, make_optimizer
    from iadr1_tpu.train.sft import make_chunked_sft_step
    from iadr1_tpu.train.state import create_sharded_state

    if on_tpu:
        text = dict(vocab_size=151936, hidden_size=896, intermediate_size=4864,
                    num_hidden_layers=24, num_attention_heads=14,
                    num_key_value_heads=2, rope_theta=1e6,
                    tie_word_embeddings=True)
        vis = dict(hidden_size=1152, intermediate_size=4304,
                   num_hidden_layers=27, num_attention_heads=16,
                   image_size=384, patch_size=14)
        B, T, steps, warmup, img_px = 4, 2048, 10, 2, (520, 390)
    else:
        text = dict(vocab_size=512, hidden_size=64, intermediate_size=128,
                    num_hidden_layers=2, num_attention_heads=4,
                    num_key_value_heads=2, rope_theta=1e4,
                    tie_word_embeddings=True)
        vis = dict(hidden_size=32, intermediate_size=64, num_hidden_layers=2,
                   num_attention_heads=4, image_size=56, patch_size=14)
        B, T, steps, warmup, img_px = 2, 128, 2, 1, (100, 52)

    hf = dict(
        architectures=["LlavaOnevisionForConditionalGeneration"],
        text_config=text, vision_config=vis, image_token_index=499,
        image_grid_pinpoints=[
            [vis["image_size"], vis["image_size"]],
            [vis["image_size"], 2 * vis["image_size"]],
            [2 * vis["image_size"], vis["image_size"]],
        ],
    )
    bundle = make_llava_onevision_bundle(
        hf, attention="flash" if on_tpu else "xla")
    params = bundle.init_params(jax.random.PRNGKey(0))
    if on_tpu:
        # 0.9B full-parameter + f32 Adam moments is 172M over one chip's
        # 16G HBM -- store the first moment in bf16 (v stays f32)
        params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    optimizer, schedule = make_optimizer(
        OptimizerConfig(learning_rate=1e-5, total_steps=1000,
                        mu_dtype="bfloat16" if on_tpu else None))
    state = create_sharded_state(params, optimizer)
    step = make_chunked_sft_step(
        bundle.hidden_fn, bundle.head_kernel_fn, optimizer, schedule,
        chunk_size=4096 if on_tpu else 1024,
    )

    rng = np.random.default_rng(0)
    img = Image.fromarray((rng.random((*img_px, 3)) * 255).astype(np.uint8))
    patches, grid, seqlen = bundle.preprocess_image(img)
    rows = []
    for b in range(B):
        ids = rng.integers(10, text["vocab_size"], T)
        ids[1 : 1 + seqlen] = hf["image_token_index"]
        labels = ids.copy()
        labels[: 1 + seqlen] = IGNORE_INDEX
        rows.append({
            "input_ids": ids, "labels": labels,
            "segment_ids": np.ones(T, np.int64),
            "position_ids": np.arange(T),
            "extras": [{"patches": [patches], "grid_thw": [grid]}],
        })
    n_tiles = patches.shape[0]
    builder = VLMBatchBuilder(bundle=bundle,
                              patch_budget=B * n_tiles * patches.shape[1])
    batch = {k: jnp.asarray(v) for k, v in builder(rows).items()}

    for _ in range(warmup):
        state, metrics = step(state, batch)
    _sync(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = step(state, batch)
    loss = _sync(metrics["loss"])
    dt = time.perf_counter() - t0

    text_flops = transformer_flops_per_token(
        hidden=text["hidden_size"], intermediate=text["intermediate_size"],
        num_layers=text["num_hidden_layers"], vocab=text["vocab_size"],
        seq_len=T, num_heads=text["num_attention_heads"],
        num_kv_heads=text["num_key_value_heads"])
    grid_side = vis["image_size"] // vis["patch_size"]
    vit_flops = vit_flops_per_patch(
        hidden=vis["hidden_size"], intermediate=vis["intermediate_size"],
        num_layers=vis["num_hidden_layers"], attn_window=grid_side ** 2)
    n_patches = B * n_tiles * patches.shape[1]
    # fold vision FLOPs into an effective per-token figure
    eff_flops = text_flops + vit_flops * n_patches / (B * T)
    from iadr1_tpu.core.metrics import ThroughputMeter as _TM

    meter = _TM(flops_per_token_fwd=eff_flops,
                chip="v5e" if on_tpu else "cpu")
    meter.update(B * T * steps, dt)
    return {"tokens_per_sec": round(meter.tokens_per_sec_per_chip, 1),
            "mfu": round(meter.mfu, 4), "loss": loss,
            "batch": B, "seq": T, "image_tokens_per_row": int(seqlen),
            "patches_per_batch": int(n_patches)}


def bench_rollout(on_tpu: bool) -> dict:
    """Decode throughput of the vLLM-replacement rollout engine (flash
    prefill + ragged Pallas decode kernel; dense fallback on CPU)."""
    import jax
    import jax.numpy as jnp

    from iadr1_tpu.models.registry import make_qwen2_bundle
    from iadr1_tpu.train.rollout import RolloutEngine, SamplingConfig

    if on_tpu:
        hf = dict(vocab_size=151936, hidden_size=896, intermediate_size=4864,
                  num_hidden_layers=24, num_attention_heads=14,
                  num_key_value_heads=2, rope_theta=1e6,
                  tie_word_embeddings=True,
                  architectures=["Qwen2ForCausalLM"])
        B, P, N, reps = 16, 1024, 512, 3
    else:
        hf = dict(vocab_size=1024, hidden_size=128, intermediate_size=256,
                  num_hidden_layers=2, num_attention_heads=4,
                  num_key_value_heads=2, rope_theta=1e6,
                  tie_word_embeddings=True,
                  architectures=["Qwen2ForCausalLM"])
        B, P, N, reps = 2, 32, 16, 1

    bundle = make_qwen2_bundle(hf, attention="flash" if on_tpu else "xla")
    params = bundle.init_params(jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    sampling = SamplingConfig(max_new_tokens=N, temperature=0.9, top_p=0.9,
                              top_k=50, eos_token_id=-1, pad_token_id=0,
                              approx_top_k=on_tpu)
    engine = RolloutEngine(bundle, sampling, max_len=P + N)
    rng = np.random.default_rng(0)
    ids = rng.integers(1, hf["vocab_size"] - 64, (B, P))
    mask = np.ones((B, P), np.int32)
    mask[:, : P // 16] = 0
    batch = {"input_ids": jnp.asarray(ids, jnp.int32),
             "attention_mask": jnp.asarray(mask)}
    key = jax.random.PRNGKey(0)
    out = engine.generate(params, batch, key)
    _sync(out["completion_ids"][:1, :1])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = engine.generate(params, batch, key)
    _sync(out["completion_ids"][:1, :1])
    dt = (time.perf_counter() - t0) / reps
    return {"decode_tokens_per_sec": round(B * N / dt, 1),
            "sec_per_generate": round(dt, 3), "batch": B,
            "prompt": P, "new_tokens": N}


def bench_grpo(on_tpu: bool) -> dict:
    """One full SC-GRPO step: G-way rollout, host-side structured rewards,
    chunked-logp update against a bf16 reference copy."""
    import jax
    import jax.numpy as jnp

    from iadr1_tpu.models.registry import make_qwen2_bundle
    from iadr1_tpu.rewards import get_reward_funcs
    from iadr1_tpu.train import OptimizerConfig, make_optimizer
    from iadr1_tpu.train.grpo import GRPOConfig, GRPOTrainer
    from iadr1_tpu.train.state import create_train_state

    if on_tpu:
        hf = dict(vocab_size=151936, hidden_size=896, intermediate_size=4864,
                  num_hidden_layers=24, num_attention_heads=14,
                  num_key_value_heads=2, rope_theta=1e6,
                  tie_word_embeddings=True,
                  architectures=["Qwen2ForCausalLM"])
        P, N, G, n_prompts, steps = 2048, 512, 4, 2, 3
    else:
        hf = dict(vocab_size=1024, hidden_size=128, intermediate_size=256,
                  num_hidden_layers=2, num_attention_heads=4,
                  num_key_value_heads=2, rope_theta=1e6,
                  tie_word_embeddings=True,
                  architectures=["Qwen2ForCausalLM"])
        P, N, G, n_prompts, steps = 32, 8, 2, 2, 1

    class _Tok:
        eos_token_id = 3
        pad_token_id = 0

        def batch_decode(self, seqs, skip_special_tokens=True):
            return ["<think>t</think><answer>No</answer>" for _ in seqs]

    bundle = make_qwen2_bundle(hf, attention="flash" if on_tpu else "xla")
    params = bundle.init_params(jax.random.PRNGKey(0))
    ref_params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    optimizer, schedule = make_optimizer(
        OptimizerConfig(learning_rate=1e-6, total_steps=100))
    state = create_train_state(params, optimizer)
    cfg = GRPOConfig(num_generations=G, max_prompt_length=P,
                     max_completion_length=N, logp_chunk_size=1024)
    trainer = GRPOTrainer(
        bundle, _Tok(), optimizer, cfg,
        get_reward_funcs(["accuracy", "format"]), state, ref_params,
        schedule=schedule,
    )
    rng = np.random.default_rng(0)
    examples = [
        {"prompt_ids": list(rng.integers(10, hf["vocab_size"] - 64, P // 2)),
         "solution": "<answer>No</answer>"}
        for _ in range(n_prompts)
    ]
    m = trainer.step(examples)  # warmup/compile
    t0 = time.perf_counter()
    for _ in range(steps):
        m = trainer.step(examples)
    dt = (time.perf_counter() - t0) / steps
    return {"step_sec": round(dt, 2),
            "rollouts_per_sec": round(n_prompts * G / dt, 2),
            "loss": m["loss"], "kl": m["kl"], "G": G,
            "prompts": n_prompts, "P": P, "N": N}


def _safe(fn, on_tpu):
    """A sub-bench failure must never swallow the headline JSON line."""
    import traceback

    try:
        return fn(on_tpu)
    except Exception as e:  # noqa: BLE001 -- record and move on
        traceback.print_exc(file=sys.stderr)
        return {"error": f"{type(e).__name__}: {e}"}


def main():
    import jax

    on_tpu = jax.default_backend() == "tpu"
    sft = _safe(bench_sft_text, on_tpu)
    vlm = _safe(bench_sft_vlm, on_tpu)
    rollout = _safe(bench_rollout, on_tpu)
    grpo = _safe(bench_grpo, on_tpu)

    print(json.dumps({
        "metric": "sft_tokens_per_sec_per_chip_0.5b",
        "value": sft.get("tokens_per_sec", 0.0),
        "unit": "tokens/s/chip",
        "vs_baseline": round(sft.get("mfu", 0.0) / 0.40, 4),
        "extra": {
            "backend": jax.default_backend(),
            "sft_mfu": sft.get("mfu"),
            "sft": sft,
            "vlm_sft_tokens_per_sec": vlm.get("tokens_per_sec"),
            "vlm_mfu": vlm.get("mfu"),
            "vlm_sft": vlm,
            "rollout_decode_tokens_per_sec": rollout.get("decode_tokens_per_sec"),
            "rollout": rollout,
            "grpo_step_sec": grpo.get("step_sec"),
            "grpo_rollouts_per_sec": grpo.get("rollouts_per_sec"),
            "grpo": grpo,
        },
    }))


if __name__ == "__main__":
    sys.exit(main())
