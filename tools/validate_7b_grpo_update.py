"""Hardware validation: GRPO update step at 7B per-layer shapes.

V=152064, hidden 3584, inter 18944 (8 of 28 layers so weights fit
one 16 GB chip), P=4096, N=512, G=4, LoRA rank 16 + ref elision,
chunked logps.  A/Bs the dense repeated-batch path against
shared-prompt scoring.  Validated: 2.29 -> 0.76 s/update.
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

# 7B per-layer shapes, 8 of 28 layers so weights fit one 16G chip
hf = dict(vocab_size=152064, hidden_size=3584, intermediate_size=18944,
          num_hidden_layers=8, num_attention_heads=28,
          num_key_value_heads=4, rope_theta=1e6, tie_word_embeddings=False,
          architectures=["Qwen2ForCausalLM"])
P, N, G, n = 4096, 512, 4, 1
B = n * G

bundle = make_qwen2_bundle(hf, attention="flash")
base = bundle.init_params(jax.random.PRNGKey(0), dtype=jnp.bfloat16)
tcfg = TuningConfig(finetuning_type="lora", lora_rank=16)
lora = init_lora_params(jax.random.PRNGKey(1), base, tcfg)
scale = tcfg.lora_alpha / tcfg.lora_rank
optimizer, _ = make_optimizer(OptimizerConfig(learning_rate=1e-6,
                                              total_steps=10))
state = create_train_state(lora, optimizer)
cfg = GRPOConfig(num_generations=G, max_prompt_length=P,
                 max_completion_length=N, logp_chunk_size=512, remat="full")
remat = "full"

base_score = bundle_score_fn(bundle, remat=remat)


def score(lora_params, batch, base_aux):
    return (bundle.hidden_fn(base_aux, batch, lora=lora_params,
                             lora_scale=scale, remat=remat),
            bundle.head_kernel_fn(base_aux))


ref_score = lambda base_aux, b, _a: base_score(base_aux, b)

dense_step = make_grpo_update_step(score, optimizer, cfg,
                                   ref_score_fn=ref_score)


def logps_shared(lora_params, batch, base_aux):
    pred = bundle.shared_pred_fn(base_aux, batch, G, remat=remat,
                                 lora=lora_params, lora_scale=scale)
    return chunked_token_logps(pred, bundle.head_kernel_fn(base_aux),
                               batch["completion_ids"], 512)


def ref_logps_shared(base_aux, batch, _a):
    pred = bundle.shared_pred_fn(base_aux, batch, G, remat=remat)
    return chunked_token_logps(pred, bundle.head_kernel_fn(base_aux),
                               batch["completion_ids"], 512)


shared_step = make_grpo_update_step(score, optimizer, cfg,
                                    ref_score_fn=ref_score,
                                    logps_fn=logps_shared,
                                    ref_logps_fn=ref_logps_shared)

rng = np.random.default_rng(0)
pids = rng.integers(10, 150000, (n, P)).astype(np.int32)
cids = rng.integers(10, 150000, (B, N)).astype(np.int32)
pmask = np.ones((n, P), np.int32)
cmask = np.ones((B, N), np.int32)
adv = np.linspace(-1, 1, B).astype(np.float32)

dense_batch = {
    "input_ids": jnp.asarray(np.concatenate(
        [np.repeat(pids, G, 0), cids], 1)),
    "segment_ids": jnp.ones((B, P + N), jnp.int32),
    "position_ids": jnp.asarray(
        np.broadcast_to(np.arange(P + N), (B, P + N)).copy(), jnp.int32),
    "completion_ids": jnp.asarray(cids),
    "completion_mask": jnp.asarray(cmask),
    "advantages": jnp.asarray(adv),
    "prompt_len": P,
}
shared_batch = {
    "prompt_ids": jnp.asarray(pids),
    "prompt_segments": jnp.asarray(pmask),
    "prompt_positions": jnp.asarray(
        np.broadcast_to(np.arange(P), (n, P)).copy(), jnp.int32),
    "completion_ids": jnp.asarray(cids),
    "completion_mask": jnp.asarray(cmask),
    "completion_positions": jnp.asarray(
        P + np.broadcast_to(np.arange(N), (B, N)).copy().astype(np.int32)),
    "advantages": jnp.asarray(adv),
}


def run(tag, step, batch):
    global state
    state, m = step(state, base, batch)
    print(f"{tag} warm: loss={float(m['loss']):.2e} kl={float(m['kl']):.2e}",
          flush=True)
    t0 = time.perf_counter()
    reps = 4
    for _ in range(reps):
        state, m = step(state, base, batch)
    float(m["loss"])
    dt = (time.perf_counter() - t0) / reps
    print(f"{tag}: {dt:.2f} s/update", flush=True)


run("dense ", dense_step, dense_batch)
run("shared", shared_step, shared_batch)
