"""Hardware validation: full VLM GRPO steps at recipe shapes.

Qwen2-VL-2B shapes, real image front-end (480k max_pixels), P=4096,
N=512, G=4, LoRA + ref elision, remat=full.  Run on a real TPU chip
(absorbs the ~400-530 s first-execution warmup; give it >=30 min).
Validated: 9.8 s/step mean (docs/validation_r2.md).
"""
import sys, time
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import numpy as np
from PIL import Image
import jax
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)

from iadr1_tpu.cli.train_grpo import GRPODataSection, make_vlm_prompt_collator
from iadr1_tpu.data.mm import expand_image_tokens
from iadr1_tpu.data.template import get_template
from iadr1_tpu.models.registry import bundle_from_hf_config
from iadr1_tpu.rewards import get_reward_funcs
from iadr1_tpu.train import OptimizerConfig, make_optimizer
from iadr1_tpu.train.adapters import TuningConfig, init_lora_params
from iadr1_tpu.train.grpo import GRPOConfig, GRPOTrainer
from iadr1_tpu.train.state import create_train_state

# Qwen2-VL-2B shapes (28 layers, hidden 1536, ViT 32 x 1280)
hf = dict(
    architectures=["Qwen2VLForConditionalGeneration"],
    text_config=dict(
        vocab_size=151936, hidden_size=1536, intermediate_size=8960,
        num_hidden_layers=28, num_attention_heads=12, num_key_value_heads=2,
        rms_norm_eps=1e-6, rope_theta=1e6, tie_word_embeddings=True,
        rope_scaling={"type": "mrope", "mrope_section": [16, 24, 24]},
    ),
    vision_config=dict(
        depth=32, embed_dim=1280, hidden_size=1536, num_heads=16,
        patch_size=14, spatial_merge_size=2, temporal_patch_size=2,
    ),
    image_token_id=151655, video_token_id=151656,
    vision_start_token_id=151652, vision_end_token_id=151653,
)


class Tok:
    eos_token_id = 151645
    pad_token_id = 151643

    def batch_decode(self, seqs, skip_special_tokens=True):
        return ["<think>t</think><answer>No</answer>" for _ in seqs]


P, N, G, n_prompts = 4096, 512, 4, 2
bundle = bundle_from_hf_config(hf, attention="flash")
params = bundle.init_params(jax.random.PRNGKey(0), dtype=jnp.bfloat16)
tcfg = TuningConfig(finetuning_type="lora", lora_rank=16)
lora = init_lora_params(jax.random.PRNGKey(1), params, tcfg)
optimizer, schedule = make_optimizer(
    OptimizerConfig(learning_rate=1e-6, total_steps=100))
state = create_train_state(lora, optimizer)
cfg = GRPOConfig(num_generations=G, max_prompt_length=P,
                 max_completion_length=N, logp_chunk_size=512, remat="full")
template = get_template("qwen2_vl")
dcfg = GRPODataSection(max_pixels=480000, patch_budget=19968)
collator = make_vlm_prompt_collator(bundle, Tok(), template, dcfg, P,
                                    num_generations=G)

rng = np.random.default_rng(0)
img = Image.fromarray(rng.integers(0, 255, (600, 800, 3), np.uint8))
patches, grid, seqlen = bundle.preprocess_image(img, max_pixels=480000)
print("image tokens per prompt:", seqlen, "grid:", grid, flush=True)

vs, ve, im = (hf["vision_start_token_id"], hf["vision_end_token_id"],
              hf["image_token_id"])
examples = []
for i in range(n_prompts):
    text_ids = list(rng.integers(10, 151000, 2048 - 3 - seqlen))
    prompt_ids = text_ids[: 40] + [vs] + [im] * seqlen + [ve] + text_ids[40:]
    examples.append({
        "prompt_ids": prompt_ids, "solution": "<answer>No</answer>",
        "patches": [patches], "grid_thw": [grid],
    })

trainer = GRPOTrainer(
    bundle, Tok(), optimizer, cfg,
    get_reward_funcs(["accuracy", "format"]), state, None,
    schedule=schedule, template=template, prompt_collator=collator,
    base_params=params, tuning_cfg=tcfg,
)
m = trainer.step(examples)
print("warmup step done; loss", m["loss"], "kl", m["kl"], flush=True)
times = []
for i in range(6):
    t0 = time.perf_counter()
    m = trainer.step(examples)
    times.append(time.perf_counter() - t0)
    print(f"step {i}: {times[-1]:.1f}s loss={m['loss']:.6f} "
          f"kl={m['kl']:.2e}", flush=True)
print(f"mean step {np.mean(times):.1f}s  (prior session: ~65 s/step "
      f"without grouped prefill)", flush=True)
