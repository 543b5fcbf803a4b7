"""Sweep the VLM SFT leg's vision-tower recipe (round-4 VERDICT weak #5).

The text leg clears 40% MFU; the packed OneVision leg sits at 39.6%.  The
difference is the SigLIP tower + scatter path, which round 4 never swept.
Knobs (all per-call, no env needed):
  * tower_attention_fn: None (XLA dense, T=729 per tile) vs Pallas flash
    (default blocks pad 729 -> 2x512; a 256-block variant pads to 3x256)
  * tower_remat: None (follow the step's save_qkv -> full per-layer
    checkpoint), False (no checkpoint -- tower acts are saved), "full"
  * decomposition legs: text-only step (no tiles) and tower-only
    fwd+bwd, to locate where the time actually goes.

One process: the first leg absorbs the ~8 min server warmup.  Each leg
prints its own JSON line immediately (a partial run is still evidence).
"""

import json
import time

import numpy as np


def _sync(x):
    return float(np.asarray(x).ravel()[0])


TEXT = dict(vocab_size=151936, hidden_size=896, intermediate_size=4864,
            num_hidden_layers=24, num_attention_heads=14,
            num_key_value_heads=2, rope_theta=1e6, tie_word_embeddings=True)
VIS = dict(hidden_size=1152, intermediate_size=4304, num_hidden_layers=27,
           num_attention_heads=16, image_size=384, patch_size=14)
B, T, STEPS, WARMUP, IMG_PX = 4, 2048, 10, 2, (520, 390)


def build_batch(bundle, hf):
    """Host-side batch (numpy).  Legs re-upload per run: the inter-leg
    _release_device_memory() deletes EVERY live device array, so a device
    batch built once would be dead by leg 2."""
    from PIL import Image

    from iadr1_tpu.data.collator import VLMBatchBuilder
    from iadr1_tpu.data.tokenize import IGNORE_INDEX

    rng = np.random.default_rng(0)
    img = Image.fromarray((rng.random((*IMG_PX, 3)) * 255).astype(np.uint8))
    patches, grid, seqlen = bundle.preprocess_image(img)
    rows = []
    for _ in range(B):
        ids = rng.integers(10, TEXT["vocab_size"], T)
        ids[1: 1 + seqlen] = hf["image_token_index"]
        labels = ids.copy()
        labels[: 1 + seqlen] = IGNORE_INDEX
        rows.append({
            "input_ids": ids, "labels": labels,
            "segment_ids": np.ones(T, np.int64),
            "position_ids": np.arange(T),
            "extras": [{"patches": [patches], "grid_thw": [grid]}],
        })
    builder = VLMBatchBuilder(
        bundle=bundle, patch_budget=B * patches.shape[0] * patches.shape[1])
    batch = {k: np.asarray(v) for k, v in builder(rows).items()}
    return batch, patches.shape[0] * patches.shape[1]


def upload(host_batch):
    import jax.numpy as jnp

    return {k: jnp.asarray(v) for k, v in host_batch.items()}


def build_step(bundle, hidden_kw):
    import jax
    import jax.numpy as jnp

    from iadr1_tpu.train import OptimizerConfig, make_optimizer
    from iadr1_tpu.train.sft import make_chunked_sft_step
    from iadr1_tpu.train.state import create_sharded_state

    params = bundle.init_params(jax.random.PRNGKey(0))
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    optimizer, schedule = make_optimizer(
        OptimizerConfig(learning_rate=1e-5, total_steps=1000,
                        mu_dtype="bfloat16"))
    state = create_sharded_state(params, optimizer)
    step = make_chunked_sft_step(
        lambda p, b: bundle.hidden_fn(p, b, remat="save_qkv", **hidden_kw),
        bundle.head_kernel_fn, optimizer, schedule,
        chunk_size=4096, logits_dtype=jnp.bfloat16)
    return state, step


def time_step(state, step, batch):
    for _ in range(WARMUP):
        state, metrics = step(state, batch)
    _sync(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, metrics = step(state, batch)
    _sync(metrics["loss"])
    return (time.perf_counter() - t0) / STEPS


def main():
    import sys

    sys.path.insert(0, "/root/repo")
    import jax
    import jax.numpy as jnp

    from bench import _release_device_memory
    from iadr1_tpu.kernels.flash_attention import (
        BlockSizes, flash_attention_with_lse,
    )
    from iadr1_tpu.models.registry import make_llava_onevision_bundle

    hf = dict(
        architectures=["LlavaOnevisionForConditionalGeneration"],
        text_config=TEXT, vision_config=VIS, image_token_index=499,
        image_grid_pinpoints=[[384, 384], [384, 768], [768, 384]],
    )
    bundle = make_llava_onevision_bundle(hf, attention="flash")
    host_batch, patches_per_img = build_batch(bundle, hf)
    tok_per_step = B * T

    def flash_b256(q, k, v, *, causal=False):
        out, _ = flash_attention_with_lse(
            q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3), causal=causal,
            blocks=BlockSizes(256, 256, 256, 256, 256, 256,
                              block_k_stacked=256))
        return out.transpose(0, 2, 1, 3)

    legs = [
        # r4 recipe: XLA dense tower, full per-layer checkpoint
        ("xla_tower_full_remat", {"tower_attention_fn": None}),
        # the new default: flash tower + save-(out,lse) remat policy
        ("flash_tower_policy", {}),
        # save the named qkv/attn/fc1 acts: backward replays only the
        # o-projection + norms/gelu (~156 MB/layer extra residuals)
        ("xla_tower_save_acts", {"tower_attention_fn": None,
                                 "tower_remat": "save_acts"}),
        ("flash_tower_save_acts", {"tower_remat": "save_acts"}),
        # no tower checkpoint at all (recompute-free backward; OOMs at B=4)
        ("flash_tower_noremat", {"tower_remat": False}),
    ]
    res = {"patches_per_image": patches_per_img, "batch": B, "seq": T}
    for name, kw in legs:
        try:
            state, step = build_step(bundle, kw)
            sec = time_step(state, step, upload(host_batch))
            res[name] = {"step_sec": round(sec, 4),
                         "tokens_per_sec": round(tok_per_step / sec, 1)}
            del state, step
        except Exception as e:  # noqa: BLE001 -- OOM legs report and move on
            res[name] = {"error": str(e)[:2000]}
        _release_device_memory()
        print(json.dumps({name: res[name]}), flush=True)

    # decomposition: text-only step (drop the vision arrays entirely)
    text_batch = upload({k: host_batch[k] for k in
                         ("input_ids", "labels", "segment_ids",
                          "position_ids")})
    state, step = build_step(bundle, {})
    sec = time_step(state, step, text_batch)
    del text_batch
    res["text_only"] = {"step_sec": round(sec, 4)}
    del state, step
    _release_device_memory()
    print(json.dumps({"text_only": res["text_only"]}), flush=True)

    # tower-only fwd+bwd (value_and_grad of a scalar over the tower), xla
    # vs flash vs flash-256
    from iadr1_tpu.models import siglip

    vcfg = bundle.cfg.vision
    host_tiles = host_batch["tiles"]
    for name, attn, rm in (
        ("tower_xla_remat", None, True),
        ("tower_xla_save_acts", None, "save_acts"),
        ("tower_flash_save_acts", "flash", "save_acts"),
        ("tower_xla_noremat", None, False),
    ):
        from iadr1_tpu.models.attention import flash_attn

        attn_fn = flash_attn if attn == "flash" else attn

        def loss_fn(p, t, attn_fn=attn_fn, rm=rm):
            f = siglip.apply(p, vcfg, t, remat=rm,
                             post_layernorm=False, attention_fn=attn_fn)
            return jnp.sum(f.astype(jnp.float32) ** 2) * 1e-6

        try:
            vparams = jax.tree.map(
                lambda x: x.astype(jnp.bfloat16),
                siglip.init_params(jax.random.PRNGKey(1), vcfg))
            tiles = jnp.asarray(host_tiles)
            g = jax.jit(jax.grad(loss_fn))
            for _ in range(WARMUP):
                out = g(vparams, tiles)
            _sync(jax.tree.leaves(out)[0])
            t0 = time.perf_counter()
            for _ in range(STEPS):
                out = g(vparams, tiles)
            _sync(jax.tree.leaves(out)[0])
            res[name] = {"grad_sec": round(
                (time.perf_counter() - t0) / STEPS, 4)}
            del g, out
        except Exception as e:  # noqa: BLE001
            res[name] = {"error": str(e)[:2000]}
        _release_device_memory()
        print(json.dumps({name: res[name]}), flush=True)

    print(json.dumps(res))


if __name__ == "__main__":
    main()
