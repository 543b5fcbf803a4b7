"""Numerical parity of the JAX Qwen2-MoE decoder against HF transformers
(torch CPU) on a random tiny config; routing, shared expert, aux loss.

Counterpart coverage for the reference's MoE support (model_utils/moe.py +
transformers Qwen2MoeForCausalLM)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # torch HF model build + logits parity

import jax
import jax.numpy as jnp

from iadr1_tpu.core.precision import FULL_PRECISION
from iadr1_tpu.models import qwen2_moe
from iadr1_tpu.models.params_io import hf_state_from_torch
from iadr1_tpu.models.registry import make_qwen2_moe_bundle

TINY = dict(
    vocab_size=128,
    hidden_size=64,
    intermediate_size=96,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=2,
    rms_norm_eps=1e-6,
    rope_theta=10000.0,
    max_position_embeddings=512,
    tie_word_embeddings=False,
    num_experts=4,
    num_experts_per_tok=2,
    moe_intermediate_size=48,
    shared_expert_intermediate_size=80,
    norm_topk_prob=False,
    decoder_sparse_step=1,
    mlp_only_layers=[],
)


@pytest.fixture(scope="module")
def hf_model():
    torch = pytest.importorskip("torch")
    from transformers import Qwen2MoeConfig as HFConfig
    from transformers import Qwen2MoeForCausalLM

    torch.manual_seed(0)
    model = Qwen2MoeForCausalLM(
        HFConfig(**TINY, attention_dropout=0.0)).eval()
    return model


@pytest.fixture(scope="module")
def jax_setup(hf_model):
    # full capacity -> no token dropped -> exact parity with HF's
    # loop-over-experts formulation
    cfg = qwen2_moe.config_from_hf(
        {**TINY, "architectures": ["Qwen2MoeForCausalLM"],
         "capacity_factor": 100.0})
    params = qwen2_moe.convert_hf(hf_state_from_torch(hf_model), cfg)
    return cfg, params


def _batch(B=2, T=12):
    rng = np.random.default_rng(0)
    ids = rng.integers(1, TINY["vocab_size"], (B, T))
    pos = np.broadcast_to(np.arange(T), (B, T)).copy()
    return ids, pos


def test_logits_parity(hf_model, jax_setup):
    import torch

    cfg, params = jax_setup
    ids, pos = _batch()
    with torch.no_grad():
        hf_logits = hf_model(torch.tensor(ids)).logits.numpy()

    @jax.jit
    def fwd(params, ids, pos):
        h, _ = qwen2_moe.apply(params, cfg, ids, position_ids=pos,
                               precision=FULL_PRECISION)
        return qwen2_moe.logits(params, cfg, h, FULL_PRECISION)

    ours = np.asarray(fwd(params, jnp.asarray(ids), jnp.asarray(pos)))
    np.testing.assert_allclose(ours, hf_logits, atol=2e-4, rtol=2e-3)


def test_capacity_drops_tokens_gracefully(jax_setup):
    """With capacity 1 token per expert the forward still runs and stays
    finite (dropped tokens just lose their sparse-expert contribution)."""
    import dataclasses

    cfg, params = jax_setup
    tight = dataclasses.replace(cfg, capacity_factor=0.01)
    ids, pos = _batch()

    @jax.jit
    def fwd(params, ids, pos):
        h, _ = qwen2_moe.apply(params, tight, ids, position_ids=pos,
                               precision=FULL_PRECISION)
        return h

    h = np.asarray(fwd(params, jnp.asarray(ids), jnp.asarray(pos)))
    assert np.isfinite(h).all()


def test_aux_loss_and_grads(jax_setup):
    cfg, params = jax_setup
    ids, pos = _batch()

    @jax.jit
    def aux_of(params, ids, pos):
        _, _, aux = qwen2_moe.apply(
            params, cfg, ids, position_ids=pos, precision=FULL_PRECISION,
            return_aux=True)
        return aux

    aux = float(aux_of(params, jnp.asarray(ids), jnp.asarray(pos)))
    # Switch aux is >= 1 with equality at perfectly uniform routing
    assert np.isfinite(aux) and aux >= 0.99

    @jax.jit
    def loss(params):
        h, _, aux = qwen2_moe.apply(
            params, cfg, jnp.asarray(ids), position_ids=jnp.asarray(pos),
            precision=FULL_PRECISION, return_aux=True)
        return (h.astype(jnp.float32) ** 2).mean() + \
            cfg.router_aux_loss_coef * aux

    grads = jax.jit(jax.grad(loss))(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    # the router gets gradient through both dispatch weights and aux loss
    g_router = np.asarray(grads["layers"]["mlp"]["router"]["kernel"])
    assert np.abs(g_router).max() > 0


def test_cli_sft_moe_with_aux_loss(tmp_path):
    """Text SFT through the CLI on a tiny MoE checkpoint: the router aux
    loss rides the chunked CE loss (model_utils/moe.py counterpart)."""
    import json
    import os

    from helpers import build_tiny_moe_checkpoint
    from iadr1_tpu.cli.train_sft import main

    ckpt = build_tiny_moe_checkpoint(str(tmp_path / "moe_ckpt"))
    rows = [{"messages": [
        {"role": "user", "content": f"Inspect casting {i} for defects."},
        {"role": "assistant", "content": "<answer>No</answer>"}],
        "images": []} for i in range(8)]
    data = tmp_path / "moe_sft.json"
    data.write_text(json.dumps(rows))
    out = str(tmp_path / "moe_run")
    cfg = {
        "model": {"model_name_or_path": ckpt, "attention": "xla"},
        "data": {"dataset": str(data), "template": "qwen2_vl",
                 "cutoff_len": 64, "packing": True},
        "mesh": {"dp": 1, "fsdp": 4, "tp": 2},
        "optim": {"learning_rate": 1e-3, "warmup_ratio": 0.0},
        "train": {"output_dir": out, "max_steps": 3, "batch_size": 2,
                  "logging_steps": 1, "save_steps": 0},
    }
    p = tmp_path / "moe_cfg.json"
    p.write_text(json.dumps(cfg))
    assert main(["--config", str(p)]) == 0
    records = [json.loads(l) for l in
               open(os.path.join(out, "trainer_log.jsonl"))]
    assert len(records) == 3
    assert all(np.isfinite(r["loss"]) for r in records)
    assert all("aux_loss" in r and np.isfinite(r["aux_loss"])
               for r in records)
    assert records[-1]["loss"] < records[0]["loss"]


def test_bundle_generation(hf_model, jax_setup):
    """Registry bundle + rollout engine: cached decode matches HF greedy."""
    import torch

    from iadr1_tpu.train.rollout import RolloutEngine, SamplingConfig

    bundle = make_qwen2_moe_bundle(
        {**TINY, "architectures": ["Qwen2MoeForCausalLM"],
         "capacity_factor": 100.0},
        attention="xla", precision=FULL_PRECISION)
    params = bundle.convert_hf(hf_state_from_torch(hf_model))
    ids, _ = _batch(B=1, T=8)
    N = 6
    with torch.no_grad():
        hf_out = hf_model.generate(
            torch.tensor(ids), max_new_tokens=N, do_sample=False,
            pad_token_id=0)
    engine = RolloutEngine(
        bundle,
        SamplingConfig(max_new_tokens=N, temperature=0.0,
                       eos_token_id=-1, pad_token_id=0),
        max_len=8 + N,
    )
    out = engine.generate(
        params,
        {"input_ids": jnp.asarray(ids, jnp.int32),
         "attention_mask": jnp.ones_like(jnp.asarray(ids, jnp.int32))},
        jax.random.PRNGKey(0))
    np.testing.assert_array_equal(
        np.asarray(out["completion_ids"])[0], hf_out[0, 8:].numpy())
