"""Per-phase breakdown of the 0.5B SFT step (VERDICT r3 weak #1).

Decomposes the winning-recipe step (bf16 params + bf16 mu + save_qkv remat
+ bf16-logits CE chunk 4096) into:
  * fwd-only time (hidden_fn + CE value, no grads)
  * head cost (full step vs vocab-1024 step)
  * optimizer+dispatch cost (apply fixed grads)
  * per-dispatch tunnel overhead (chained vs single-step timing)

One process (first execution pays the ~8 min server warmup once).
"""

import json
import time

import numpy as np


def _sync(x):
    return float(np.asarray(x).ravel()[0])


HF = dict(vocab_size=151936, hidden_size=896, intermediate_size=4864,
          num_hidden_layers=24, num_attention_heads=14,
          num_key_value_heads=2, rope_theta=1e6, tie_word_embeddings=True,
          architectures=["Qwen2ForCausalLM"])
B, T = 8, 4096


def make_batch(vocab):
    import jax.numpy as jnp

    from iadr1_tpu.data.tokenize import IGNORE_INDEX

    rng = np.random.default_rng(0)
    ids = rng.integers(1, vocab, (B, T))
    labels = ids.copy()
    labels[:, : T // 4] = IGNORE_INDEX
    return {
        "input_ids": jnp.asarray(ids, jnp.int32),
        "labels": jnp.asarray(labels, jnp.int32),
        "segment_ids": jnp.ones((B, T), jnp.int32),
        "position_ids": jnp.asarray(
            np.broadcast_to(np.arange(T), (B, T)).copy(), jnp.int32),
    }


def build(hf):
    import jax
    import jax.numpy as jnp

    from iadr1_tpu.models.registry import make_qwen2_bundle
    from iadr1_tpu.train import OptimizerConfig, make_optimizer
    from iadr1_tpu.train.sft import make_chunked_sft_step
    from iadr1_tpu.train.state import create_sharded_state

    bundle = make_qwen2_bundle(hf, attention="flash")
    params = bundle.init_params(jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    optimizer, schedule = make_optimizer(
        OptimizerConfig(learning_rate=1e-5, total_steps=1000,
                        mu_dtype="bfloat16"))
    state = create_sharded_state(params, optimizer)
    step = make_chunked_sft_step(
        lambda p, b: bundle.hidden_fn(p, b, remat="save_qkv"),
        bundle.head_kernel_fn, optimizer, schedule,
        chunk_size=4096, logits_dtype=jnp.bfloat16)
    return bundle, state, step, optimizer


def time_chained(fn, state, batch, steps=20, warmup=3, stateful=True):
    """Returns (sec_per_step, final_state) -- the step donates its input
    state, so the caller must keep using the returned one."""
    for _ in range(warmup):
        out = fn(state, batch)
        if stateful:
            state, metrics = out
        else:
            metrics = out
    _sync(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(state, batch)
        if stateful:
            state, metrics = out
        else:
            metrics = out
    _sync(metrics["loss"])
    return (time.perf_counter() - t0) / steps, state


def main():
    import sys

    sys.path.insert(0, "/root/repo")
    import jax
    import jax.numpy as jnp

    from bench import _release_device_memory
    from iadr1_tpu.train.sft import chunked_sft_loss

    res = {}

    # --- full step + per-dispatch overhead
    bundle, state, step, optimizer = build(HF)
    batch = make_batch(HF["vocab_size"])
    res["full_step_sec"], state = time_chained(step, state, batch)
    # single-step timing: sync after every call -> includes one full
    # dispatch round-trip per step
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        state, metrics = step(state, batch)
        _sync(metrics["loss"])
        times.append(time.perf_counter() - t0)
    res["single_step_sec"] = float(np.median(times))
    res["dispatch_overhead_sec"] = res["single_step_sec"] - res["full_step_sec"]

    # --- forward-only (no grads): hidden + CE value
    def fwd_only(state, batch):
        h = bundle.hidden_fn(state.params, batch, remat=False)
        loss, m = chunked_sft_loss(
            h, bundle.head_kernel_fn(state.params), batch["labels"],
            4096, logits_dtype=jnp.bfloat16)
        return m

    fwd_jit = jax.jit(fwd_only)
    res["fwd_only_sec"], _ = time_chained(fwd_jit, state, batch,
                                          stateful=False)

    # --- optimizer + step plumbing only (fixed grads)
    grads = jax.tree.map(jnp.zeros_like, state.params)

    def opt_only(state, batch):
        new_state = state.apply_gradients(grads, optimizer)
        return new_state, {"loss": new_state.step.astype(jnp.float32)}

    opt_jit = jax.jit(opt_only)
    res["opt_only_sec"], state = time_chained(opt_jit, state, batch)
    del state, batch, step, fwd_jit, opt_jit, grads
    _release_device_memory()

    # --- tiny-vocab step: removes LM-head + embed-table costs
    hf_small = dict(HF, vocab_size=1024)
    bundle, state, step, _ = build(hf_small)
    batch = make_batch(1024)
    res["step_vocab1k_sec"], state = time_chained(step, state, batch)
    res["head_embed_cost_sec"] = res["full_step_sec"] - res["step_vocab1k_sec"]
    del bundle, state, step, batch
    _release_device_memory()

    print(json.dumps(res))


if __name__ == "__main__":
    main()
