"""Flash backward + aux-sharding constraints at 72B head shapes under tp>1.

The 8-device multichip dryrun's 72B leg must run its train step with
attention="xla" and IADR1_DISABLE_AUX_CONSTRAINTS=1 -- XLA CPU hard-aborts
any collective whose rendezvous skew exceeds a hardcoded 40 s, and on one
host core the interpret-mode flash backward at those shapes plus the extra
reshard collectives blow that wall (round-4 VERDICT missing #2).  This
test puts the untested composition where the wall is lower: a 2-device
(dp=1, fsdp=1, tp=2) mesh, ONE scanned layer with the exact 72B head
geometry (64 q / 8 kv heads, head_dim 128 -> hidden 8192; the tp stress is
the head split, so the MLP width is trimmed), bf16 base + LoRA -- the
memory mode the reference uses at this scale (README.md:233-243, TP>=30B
at train/stage_rl/utils/evaluation.py:66-71) -- trained with the Pallas
flash kernels fwd+bwd and every aux-sharding constraint ACTIVE
(core/mesh.constrain_batch_aux on the rope tables,
constrain_scan_chunks on the chunked-CE scan).  Fails if the flash VJP or
the constraints break under the tp head split.
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # interpret-mode flash fwd+bwd at 72B head shapes

import jax
import jax.numpy as jnp

from iadr1_tpu.core import MeshConfig, build_mesh
from iadr1_tpu.core.mesh import kernel_mesh_scope, pytree_shardings, shard_batch
from iadr1_tpu.data.tokenize import IGNORE_INDEX
from iadr1_tpu.models.registry import bundle_from_hf_config
from iadr1_tpu.train import OptimizerConfig, make_optimizer
from iadr1_tpu.train.adapters import TuningConfig, init_lora_params
from iadr1_tpu.train.sft import make_chunked_sft_step
from iadr1_tpu.train.state import create_sharded_state

HF_72B_HEADS = dict(
    architectures=["Qwen2ForCausalLM"],
    vocab_size=512,
    hidden_size=8192,             # 64 heads x head_dim 128 (Qwen2.5-72B)
    intermediate_size=1024,       # trimmed: MLP partials are leg-proven
    num_hidden_layers=1,
    num_attention_heads=64,
    num_key_value_heads=8,
    rope_theta=1e6,
    tie_word_embeddings=True,
)


def _batch(mesh, B=1, T=128, vocab=512):
    rng = np.random.default_rng(5)
    ids = rng.integers(1, vocab, (B, T))
    return shard_batch(mesh, {
        "input_ids": jnp.asarray(ids, jnp.int32),
        "labels": jnp.asarray(
            np.where(np.arange(T) < T // 4, IGNORE_INDEX, ids), jnp.int32),
        "segment_ids": jnp.ones((B, T), jnp.int32),
        "position_ids": jnp.asarray(
            np.broadcast_to(np.arange(T), (B, T)).copy(), jnp.int32),
    })


def test_flash_bwd_tp2_72b_heads_constraints_on():
    assert not os.environ.get("IADR1_DISABLE_AUX_CONSTRAINTS"), (
        "this test exists to prove the constraints-ON composition"
    )
    mesh = build_mesh(MeshConfig(dp=1, fsdp=1, tp=2),
                      devices=jax.devices()[:2])
    batch = _batch(mesh)
    optimizer, schedule = make_optimizer(
        OptimizerConfig(learning_rate=1e-3, total_steps=4, warmup_ratio=0.0))
    tcfg = TuningConfig(finetuning_type="lora", lora_rank=8)

    results = {}
    for kind in ("xla", "flash"):
        bundle = bundle_from_hf_config(HF_72B_HEADS, attention=kind)
        params = jax.device_put(
            bundle.init_params(jax.random.PRNGKey(3), dtype=jnp.bfloat16),
            pytree_shardings(bundle.logical_axes(), mesh))
        lora = init_lora_params(jax.random.PRNGKey(4), params, tcfg)
        state = create_sharded_state(lora, optimizer)

        def hidden_fn(lora_p, b, bundle=bundle, params=params):
            return bundle.hidden_fn(params, b, remat=True, lora=lora_p,
                                    lora_scale=tcfg.lora_scale)

        step = make_chunked_sft_step(
            hidden_fn, lambda _lp, params=params, bundle=bundle:
            bundle.head_kernel_fn(params), optimizer, schedule,
            chunk_size=64)
        with kernel_mesh_scope(mesh):
            state, metrics = step(state, batch)
        loss = float(metrics["loss"])
        gnorm = float(metrics["grad_norm"])
        assert np.isfinite(loss), f"non-finite {kind} loss at tp=2"
        assert np.isfinite(gnorm) and gnorm > 1e-8, (
            f"degenerate {kind} grad norm {gnorm} at tp=2 "
            "(the flash VJP or a constraint broke under the head split)"
        )
        results[kind] = loss
        del params, lora, state

    # same init, same batch: the flash train step must reproduce the XLA
    # oracle's loss (bf16 compute; interpret-mode kernels reduce in f32)
    assert results["flash"] == pytest.approx(results["xla"], rel=2e-3), (
        f"flash/xla loss divergence at 72B head shapes over tp=2: {results}"
    )
