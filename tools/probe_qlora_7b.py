"""QLoRA at 7B shapes on one 16 GB v5e chip (VERDICT r4 item #6).

The point of the int4/NF4 path (models/quant.py): a full 7B-class decoder
does NOT fit one chip in bf16 (13.6 GB params + activations + adapter
optimizer > 16 GB HBM), but the nibble-packed int4 base (~3.7 GB incl.
scales; embeddings/head stay bf16) leaves room to TRAIN factored LoRA
adapters on top -- the reference's bnb-4bit + LoRA mode
(model_utils/quantization.py + adapter.py) without a quantization library.

Reports: quantized bytes vs bf16, one chunked-CE LoRA train step's time,
loss/grad-norm finiteness, and whether the bf16 control fits (expected:
RESOURCE_EXHAUSTED).
"""

import functools
import json
import sys
import time

import numpy as np

HF = dict(vocab_size=152064, hidden_size=3584, intermediate_size=18944,
          num_hidden_layers=28, num_attention_heads=28,
          num_key_value_heads=4, rope_theta=1e6, tie_word_embeddings=True,
          architectures=["Qwen2ForCausalLM"])
B, T = 2, 2048


def _sync(x):
    return float(np.asarray(x).ravel()[0])


def build_step(quant_fmt):
    import jax
    import jax.numpy as jnp

    from iadr1_tpu.data.tokenize import IGNORE_INDEX
    from iadr1_tpu.models.quant import quantize_tree, quantized_bytes
    from iadr1_tpu.models.registry import make_qwen2_bundle
    from iadr1_tpu.train import OptimizerConfig, make_optimizer
    from iadr1_tpu.train.adapters import TuningConfig, init_lora_params
    from iadr1_tpu.train.sft import make_chunked_sft_step
    from iadr1_tpu.train.state import create_sharded_state

    from iadr1_tpu.models.quant import default_quant_predicate, quantize_kernel

    bundle = make_qwen2_bundle(HF, attention="flash")
    # leaf-wise ON-DEVICE init + quantization: a full bf16 init tree plus
    # PRNG temporaries is ~27 GB transient (HBM OOM before quantize), and
    # host-side init ships 13.6 GB through the tunnel.  Here each leaf is
    # generated on-device (largest transient: one 136 MB bf16 MLP
    # kernel), quantized on-device, and the fp original deleted before
    # the next leaf.
    shapes = jax.eval_shape(
        lambda: bundle.init_params(jax.random.PRNGKey(0), dtype=jnp.bfloat16))
    keys = iter(jax.random.split(jax.random.PRNGKey(0), 4096))

    def _path_str(path):
        return "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                        for k in path)

    def _gen(key, shape):
        return jax.jit(
            lambda k: jax.random.normal(k, shape, jnp.bfloat16) * 0.02
        )(key)

    qjit = jax.jit(quantize_kernel, static_argnames=("fmt", "block_size"))

    def make(path, s):
        quantize = quant_fmt != "none" and default_quant_predicate(
            _path_str(path), s)  # ShapeDtypeStruct carries .ndim
        if not quantize:
            return _gen(next(keys), s.shape)
        if len(s.shape) == 3:
            # stacked [L, in, out]: per-layer generate+quantize -- the
            # whole-leaf quantize materializes ~3 f32 copies of the 3.8 GB
            # MLP kernel (observed HBM OOM); per-layer transients are
            # ~1 GB
            fields = None
            for _l in range(s.shape[0]):
                arr = _gen(next(keys), s.shape[1:])
                q = jax.tree.map(lambda x: x.block_until_ready(),
                                 qjit(arr, fmt=quant_fmt))
                arr.delete()
                if fields is None:
                    fields = {k: [] for k in q}
                for k in q:
                    fields[k].append(q[k])
            return {k: jnp.stack(v) for k, v in fields.items()}
        arr = _gen(next(keys), s.shape)
        q = jax.tree.map(lambda x: x.block_until_ready(),
                         qjit(arr, fmt=quant_fmt))
        arr.delete()
        return q

    params = jax.tree_util.tree_map_with_path(make, shapes)
    report = {}
    if quant_fmt != "none":
        now, bf16 = quantized_bytes(params)
        report["param_bytes"] = now
        report["param_bytes_bf16"] = bf16
        report["shrink"] = round(bf16 / now, 2)
    tcfg = TuningConfig(finetuning_type="lora", lora_rank=16)
    lora = init_lora_params(jax.random.PRNGKey(1), params, tcfg)
    optimizer, schedule = make_optimizer(
        OptimizerConfig(learning_rate=1e-4, total_steps=100))
    state = create_sharded_state(lora, optimizer)

    # the frozen base is a jit ARGUMENT: closing over its device arrays
    # bakes them into the program as constants (4.8 GB of captured
    # constants observed -- duplicated program+runtime copies)
    from iadr1_tpu.train.sft import chunked_sft_loss, optax_global_norm

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state, base, batch):
        def loss_fn(lp):
            h = bundle.hidden_fn(base, batch, remat=True, lora=lp,
                                 lora_scale=tcfg.lora_scale)
            return chunked_sft_loss(
                h, bundle.head_kernel_fn(base), batch["labels"],
                chunk_size=2048, logits_dtype=jnp.bfloat16)

        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        metrics["grad_norm"] = optax_global_norm(grads)
        return state.apply_gradients(grads, optimizer), metrics

    rng = np.random.default_rng(0)
    ids = rng.integers(1, HF["vocab_size"], (B, T))
    labels = ids.copy()
    labels[:, : T // 4] = IGNORE_INDEX
    batch = {
        "input_ids": jnp.asarray(ids, jnp.int32),
        "labels": jnp.asarray(labels, jnp.int32),
        "segment_ids": jnp.ones((B, T), jnp.int32),
        "position_ids": jnp.asarray(
            np.broadcast_to(np.arange(T), (B, T)).copy(), jnp.int32),
    }
    return state, params, step, batch, report


def run(quant_fmt, steps=5):
    import sys as _sys

    _sys.path.insert(0, "/root/repo")
    from bench import _release_device_memory

    try:
        state, base, step, batch, report = build_step(quant_fmt)
        state, metrics = step(state, base, batch)  # compile + step 1
        _sync(metrics["loss"])
        t0 = time.perf_counter()
        for _ in range(steps):
            state, metrics = step(state, base, batch)
        loss = _sync(metrics["loss"])
        gnorm = float(np.asarray(metrics["grad_norm"]))
        report.update(
            step_sec=round((time.perf_counter() - t0) / steps, 3),
            loss=round(loss, 4), grad_norm=round(gnorm, 5),
            tokens_per_sec=round(B * T * steps / (time.perf_counter() - t0), 1),
            ok=bool(np.isfinite(loss) and gnorm > 0),
        )
    except Exception as e:  # noqa: BLE001 -- OOM is an expected outcome
        report = {"error": f"{type(e).__name__}: {str(e)[:2000]}"}
        e.__traceback__ = None
        del e
    _release_device_memory()
    return report


def main():
    out = {"int4": run("int4"), "nf4": run("nf4"),
           "bf16_control": run("none", steps=1)}
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
