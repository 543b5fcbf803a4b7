"""Hardware validation: DoRA at 7B per-layer shapes holds the LoRA
memory envelope.

Same setup as validate_7b_grpo_update.py (V=152064, hidden 3584, inter
18944, 8 of 28 layers, P=4096, N=512, G=4, ref elision, shared-prompt
scoring, remat=full) but with use_dora=True: the factored column-norm
computation (models/qwen2.py _lora_dense) must neither OOM (a merged
W+sAB materialization would, the round-2 measured failure mode) nor
meaningfully change step time.
"""
import sys, time
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)

from iadr1_tpu.models.registry import make_qwen2_bundle
from iadr1_tpu.train import OptimizerConfig, make_optimizer
from iadr1_tpu.train.adapters import TuningConfig, init_lora_params
from iadr1_tpu.train.grpo import (
    GRPOConfig, bundle_score_fn, chunked_token_logps, make_grpo_update_step)
from iadr1_tpu.train.state import create_train_state

hf = dict(vocab_size=152064, hidden_size=3584, intermediate_size=18944,
          num_hidden_layers=8, num_attention_heads=28,
          num_key_value_heads=4, rope_theta=1e6, tie_word_embeddings=False,
          architectures=["Qwen2ForCausalLM"])
P, N, G, n = 4096, 512, 4, 1
B = n * G

bundle = make_qwen2_bundle(hf, attention="flash")
base = bundle.init_params(jax.random.PRNGKey(0), dtype=jnp.bfloat16)
optimizer, _ = make_optimizer(OptimizerConfig(learning_rate=1e-6,
                                              total_steps=10))
cfg = GRPOConfig(num_generations=G, max_prompt_length=P,
                 max_completion_length=N, logp_chunk_size=512, remat="full")
remat = "full"

rng = np.random.default_rng(0)
pids = rng.integers(10, 150000, (n, P)).astype(np.int32)
cids = rng.integers(10, 150000, (B, N)).astype(np.int32)
shared_batch = {
    "prompt_ids": jnp.asarray(pids),
    "prompt_segments": jnp.ones((n, P), jnp.int32),
    "prompt_positions": jnp.asarray(
        np.broadcast_to(np.arange(P), (n, P)).copy(), jnp.int32),
    "completion_ids": jnp.asarray(cids),
    "completion_mask": jnp.ones((B, N), jnp.int32),
    "completion_positions": jnp.asarray(
        P + np.broadcast_to(np.arange(N), (B, N)).copy().astype(np.int32)),
    "advantages": jnp.asarray(np.linspace(-1, 1, B).astype(np.float32)),
}

for use_dora in (False, True):
    tag = "dora" if use_dora else "lora"
    tcfg = TuningConfig(finetuning_type="lora", lora_rank=16,
                        use_dora=use_dora)
    lora = init_lora_params(jax.random.PRNGKey(1), base, tcfg)
    scale = tcfg.lora_scale
    state = create_train_state(lora, optimizer)

    def score(lora_params, batch, base_aux, scale=scale):
        return (bundle.hidden_fn(base_aux, batch, lora=lora_params,
                                 lora_scale=scale, remat=remat),
                bundle.head_kernel_fn(base_aux))

    base_score = bundle_score_fn(bundle, remat=remat)
    ref_score = lambda base_aux, b, _a: base_score(base_aux, b)

    def logps_shared(lora_params, batch, base_aux, scale=scale):
        pred = bundle.shared_pred_fn(base_aux, batch, G, remat=remat,
                                     lora=lora_params, lora_scale=scale)
        return chunked_token_logps(pred, bundle.head_kernel_fn(base_aux),
                                   batch["completion_ids"], 512)

    def ref_logps_shared(base_aux, batch, _a):
        pred = bundle.shared_pred_fn(base_aux, batch, G, remat=remat)
        return chunked_token_logps(pred, bundle.head_kernel_fn(base_aux),
                                   batch["completion_ids"], 512)

    step = make_grpo_update_step(score, optimizer, cfg,
                                 ref_score_fn=ref_score,
                                 logps_fn=logps_shared,
                                 ref_logps_fn=ref_logps_shared)
    state, m = step(state, base, shared_batch)
    print(f"{tag} warm: loss={float(m['loss']):.2e} kl={float(m['kl']):.2e}",
          flush=True)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        state, m = step(state, base, shared_batch)
        float(m["loss"])
        times.append(time.perf_counter() - t0)
    print(f"{tag}: {np.mean(times):.2f} s/update (runs {times})", flush=True)
