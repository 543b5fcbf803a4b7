"""Shared-prompt GRPO scoring: exact parity with the dense repeated-batch
path (models/shared_prompt.py; DualKV-style factorization)."""

import numpy as np

import jax
import jax.numpy as jnp

from iadr1_tpu.core.precision import FULL_PRECISION
from iadr1_tpu.models.registry import make_qwen2_bundle
from iadr1_tpu.models.shared_prompt import shared_prompt_pred_hidden
from iadr1_tpu.train.grpo import (
    bundle_score_fn,
    chunked_token_logps,
    completion_logps,
)

TINY = dict(
    vocab_size=256, hidden_size=64, intermediate_size=128,
    num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
    rope_theta=10000.0, tie_word_embeddings=True,
    architectures=["Qwen2ForCausalLM"],
)


def _setup(n=2, G=2, P=12, N=6, seed=0):
    rng = np.random.default_rng(seed)
    prompt_ids = np.zeros((n, P), np.int32)
    prompt_segs = np.zeros((n, P), np.int32)
    lens = [P, P - 4]
    for i, L in enumerate(lens):
        prompt_ids[i, P - L:] = rng.integers(2, 250, L)
        prompt_segs[i, P - L:] = 1
    nG = n * G
    comp_ids = rng.integers(2, 250, (nG, N)).astype(np.int32)
    comp_mask = np.ones((nG, N), np.int32)
    comp_mask[1, 4:] = 0          # early EOS in one rollout
    comp_mask[3, 2:] = 0
    prompt_pos = np.clip(np.cumsum(prompt_segs, 1) - 1, 0, None)
    # completion positions continue the prompt's position stream
    plen = prompt_segs.sum(1)
    comp_pos = (np.repeat(plen, G)[:, None] + np.arange(N)[None, :])
    return (prompt_ids, prompt_segs, prompt_pos, comp_ids, comp_mask,
            comp_pos, n, G, P, N)


def _dense_batch(prompt_ids, prompt_segs, comp_ids, comp_mask, G, P, N):
    full_ids = np.concatenate(
        [np.repeat(prompt_ids, G, 0), comp_ids], axis=1)
    full_segs = np.concatenate(
        [np.repeat(prompt_segs, G, 0), comp_mask], axis=1)
    positions = np.clip(np.cumsum(full_segs, 1) - 1, 0, None)
    return {
        "input_ids": jnp.asarray(full_ids, jnp.int32),
        "segment_ids": jnp.asarray(full_segs, jnp.int32),
        "position_ids": jnp.asarray(positions, jnp.int32),
        "completion_ids": jnp.asarray(comp_ids, jnp.int32),
        "completion_mask": jnp.asarray(comp_mask, jnp.int32),
        "prompt_len": P,
    }


def test_shared_prompt_logps_match_dense():
    (prompt_ids, prompt_segs, prompt_pos, comp_ids, comp_mask, comp_pos,
     n, G, P, N) = _setup()
    bundle = make_qwen2_bundle(TINY, attention="xla",
                               precision=FULL_PRECISION)
    params = bundle.init_params(jax.random.PRNGKey(0))

    dense = _dense_batch(prompt_ids, prompt_segs, comp_ids, comp_mask, G, P, N)
    lp_dense = np.asarray(jax.jit(
        lambda p, b: completion_logps(bundle_score_fn(bundle), p, b, 8)
    )(params, dense))

    shared_batch = {
        "prompt_ids": jnp.asarray(prompt_ids),
        "prompt_segments": jnp.asarray(prompt_segs),
        "prompt_positions": jnp.asarray(prompt_pos, jnp.int32),
        "completion_ids": jnp.asarray(comp_ids),
        "completion_mask": jnp.asarray(comp_mask),
        "completion_positions": jnp.asarray(comp_pos, jnp.int32),
    }

    @jax.jit
    def lp_shared_fn(params, b):
        pred = shared_prompt_pred_hidden(
            params, bundle.cfg, b, G, precision=FULL_PRECISION)
        return chunked_token_logps(
            pred, bundle.head_kernel_fn(params), b["completion_ids"], 8)

    lp_shared = np.asarray(lp_shared_fn(params, shared_batch))
    m = comp_mask.astype(bool)
    np.testing.assert_allclose(lp_shared[m], lp_dense[m], atol=2e-4,
                               rtol=1e-4)


def test_shared_prompt_grads_match_dense():
    """Gradients through the factored path equal the dense path's (the
    repeat's transpose sums prompt cotangents over the group)."""
    (prompt_ids, prompt_segs, prompt_pos, comp_ids, comp_mask, comp_pos,
     n, G, P, N) = _setup(seed=3)
    bundle = make_qwen2_bundle(TINY, attention="xla",
                               precision=FULL_PRECISION)
    params = bundle.init_params(jax.random.PRNGKey(1))
    dense = _dense_batch(prompt_ids, prompt_segs, comp_ids, comp_mask, G, P, N)
    shared_batch = {
        "prompt_ids": jnp.asarray(prompt_ids),
        "prompt_segments": jnp.asarray(prompt_segs),
        "prompt_positions": jnp.asarray(prompt_pos, jnp.int32),
        "completion_ids": jnp.asarray(comp_ids),
        "completion_mask": jnp.asarray(comp_mask),
        "completion_positions": jnp.asarray(comp_pos, jnp.int32),
    }
    mask = jnp.asarray(comp_mask, jnp.float32)

    def loss_dense(params):
        lp = completion_logps(bundle_score_fn(bundle), params, dense, 8)
        return (lp * mask).sum()

    def loss_shared(params):
        pred = shared_prompt_pred_hidden(
            params, bundle.cfg, shared_batch, G, precision=FULL_PRECISION)
        lp = chunked_token_logps(
            pred, bundle.head_kernel_fn(params),
            shared_batch["completion_ids"], 8)
        return (lp * mask).sum()

    g_dense = jax.jit(jax.grad(loss_dense))(params)
    g_shared = jax.jit(jax.grad(loss_shared))(params)
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(g_dense),
        jax.tree_util.tree_leaves_with_path(g_shared),
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=5e-3, rtol=5e-3,
            err_msg=str(pa))
