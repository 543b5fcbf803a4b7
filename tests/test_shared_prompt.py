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


def test_shared_prompt_vlm_logps_match_dense():
    """Qwen2-VL shared path: vision tower + scatter run once per unique
    prompt; logps must equal the dense G-repeated path (M-RoPE positions,
    image features in the prompt)."""
    from iadr1_tpu.models.registry import bundle_from_hf_config
    from iadr1_tpu.vision.mrope import get_mrope_positions

    cfg_dict = dict(
        architectures=["Qwen2VLForConditionalGeneration"],
        text_config=dict(
            vocab_size=256, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, rope_theta=1e4, tie_word_embeddings=True,
            rope_scaling={"type": "mrope", "mrope_section": [4, 6, 6]},
        ),
        vision_config=dict(depth=2, embed_dim=32, hidden_size=64,
                           num_heads=4, patch_size=14, spatial_merge_size=2,
                           temporal_patch_size=2),
        image_token_id=7, video_token_id=8,
        vision_start_token_id=5, vision_end_token_id=6,
    )
    bundle = bundle_from_hf_config(cfg_dict, attention="xla",
                                   precision=FULL_PRECISION)
    params = bundle.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    n, G, P, N = 2, 2, 24, 5
    nG = n * G
    grid = (1, 4, 4)               # 16 patches -> 4 features per image
    n_feats = 4
    prompt_ids = np.full((n, P), 1, np.int64)
    for i in range(n):
        prompt_ids[i, 1] = 5
        prompt_ids[i, 2:2 + n_feats] = 7
        prompt_ids[i, 2 + n_feats] = 6
        prompt_ids[i, 3 + n_feats:] = rng.integers(10, 250, P - 3 - n_feats)
    prompt_segs = np.ones((n, P), np.int64)
    patch_dim = 3 * 2 * 14 * 14
    patches = [rng.standard_normal((16, patch_dim)).astype(np.float32)
               for _ in range(n)]
    comp_ids = rng.integers(10, 250, (nG, N)).astype(np.int32)
    comp_mask = np.ones((nG, N), np.int32)

    def collate(ids, patch_list, n_rows):
        pos, deltas = get_mrope_positions(
            ids, np.asarray([grid] * len(patch_list)), 7, 5,
            attention_mask=np.ones_like(ids))
        arrays = bundle.vision_arrays(
            ids, patch_list, [grid] * len(patch_list), 16 * len(patch_list))
        return pos, deltas, {k: jnp.asarray(v) for k, v in arrays.items()}

    # dense path on the G-repeated batch
    rep_ids = np.repeat(prompt_ids, G, 0)
    pos_r, deltas_r, arrays_r = collate(
        rep_ids, [p for p in patches for _ in range(G)], nG)
    full_ids = np.concatenate([rep_ids, comp_ids], 1)
    comp_pos = (P + np.repeat(deltas_r[::G], G)[:, None]
                + np.arange(N)[None, :])
    positions = np.concatenate(
        [pos_r, np.broadcast_to(comp_pos, (3, nG, N))], axis=-1)
    dense_batch = {
        "input_ids": jnp.asarray(full_ids, jnp.int32),
        "segment_ids": jnp.ones((nG, P + N), jnp.int32),
        "position_ids": jnp.asarray(positions, jnp.int32),
        "completion_ids": jnp.asarray(comp_ids),
        "completion_mask": jnp.asarray(comp_mask),
        "prompt_len": P,
        **arrays_r,
    }
    lp_dense = np.asarray(jax.jit(
        lambda p, b: completion_logps(bundle_score_fn(bundle), p, b, 8)
    )(params, dense_batch))

    # shared path on the unique batch
    pos_u, deltas_u, arrays_u = collate(prompt_ids, patches, n)
    shared_batch = {
        "prompt_ids": jnp.asarray(prompt_ids, jnp.int32),
        "prompt_segments": jnp.asarray(prompt_segs, jnp.int32),
        "prompt_positions": jnp.asarray(pos_u, jnp.int32),
        "completion_ids": jnp.asarray(comp_ids),
        "completion_mask": jnp.asarray(comp_mask),
        "completion_positions": jnp.asarray(
            np.broadcast_to(P + np.repeat(deltas_u, G)[:, None]
                            + np.arange(N)[None, :], (3, nG, N)).copy(),
            jnp.int32),
        **arrays_u,
    }

    @jax.jit
    def lp_shared_fn(params, b):
        pred = bundle.shared_pred_fn(params, b, G, remat=False)
        return chunked_token_logps(
            pred, bundle.head_kernel_fn(params), b["completion_ids"], 8)

    lp_shared = np.asarray(lp_shared_fn(params, shared_batch))
    np.testing.assert_allclose(lp_shared, lp_dense, atol=3e-4, rtol=1e-4)


def test_shared_prompt_qwen25_vl_text_prompts():
    """Qwen2.5-VL bundle: shared path parity on text-only prompts (the
    windowed vision tower's feature merge is covered by the qwen2-vl
    test; this pins the decoder + M-RoPE wiring of the 2.5 family)."""
    from iadr1_tpu.models.registry import bundle_from_hf_config

    cfg_dict = dict(
        architectures=["Qwen2_5_VLForConditionalGeneration"],
        text_config=dict(
            vocab_size=256, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, rope_theta=1e4, tie_word_embeddings=True,
            rope_scaling={"type": "mrope", "mrope_section": [4, 6, 6]},
        ),
        vision_config=dict(depth=2, hidden_size=32, intermediate_size=64,
                           out_hidden_size=64, num_heads=4, patch_size=14,
                           spatial_merge_size=2, temporal_patch_size=2,
                           window_size=28, fullatt_block_indexes=[1]),
        image_token_id=7, video_token_id=8,
        vision_start_token_id=5, vision_end_token_id=6,
    )
    bundle = bundle_from_hf_config(cfg_dict, attention="xla",
                                   precision=FULL_PRECISION)
    assert bundle.shared_pred_fn is not None
    params = bundle.init_params(jax.random.PRNGKey(2))
    rng = np.random.default_rng(4)
    n, G, P, N = 2, 2, 10, 4
    nG = n * G
    prompt_ids = rng.integers(10, 250, (n, P)).astype(np.int32)
    comp_ids = rng.integers(10, 250, (nG, N)).astype(np.int32)
    rep = np.repeat(prompt_ids, G, 0)
    full_ids = np.concatenate([rep, comp_ids], 1)
    pos1d = np.broadcast_to(np.arange(P + N), (nG, P + N)).copy()
    dense_batch = {
        "input_ids": jnp.asarray(full_ids),
        "segment_ids": jnp.ones((nG, P + N), jnp.int32),
        "position_ids": jnp.asarray(
            np.broadcast_to(pos1d, (3, nG, P + N)).copy(), jnp.int32),
        "completion_ids": jnp.asarray(comp_ids),
        "completion_mask": jnp.ones((nG, N), jnp.int32),
        "prompt_len": P,
    }
    lp_dense = np.asarray(jax.jit(
        lambda p, b: completion_logps(bundle_score_fn(bundle), p, b, 8)
    )(params, dense_batch))
    shared_batch = {
        "prompt_ids": jnp.asarray(prompt_ids),
        "prompt_segments": jnp.ones((n, P), jnp.int32),
        "prompt_positions": jnp.asarray(np.broadcast_to(
            np.arange(P), (3, n, P)).copy(), jnp.int32),
        "completion_ids": jnp.asarray(comp_ids),
        "completion_mask": jnp.ones((nG, N), jnp.int32),
        "completion_positions": jnp.asarray(np.broadcast_to(
            P + np.arange(N), (3, nG, N)).copy(), jnp.int32),
    }
    lp_shared = np.asarray(jax.jit(
        lambda p, b: chunked_token_logps(
            bundle.shared_pred_fn(p, b, G, remat=False),
            bundle.head_kernel_fn(p), b["completion_ids"], 8)
    )(params, shared_batch))
    np.testing.assert_allclose(lp_shared, lp_dense, atol=3e-4, rtol=1e-4)


def test_shared_prompt_llava_onevision_matches_dense():
    """LLaVA-OneVision (anyres tiles, 1-D RoPE): shared-prompt logps equal
    the dense G-repeated path -- covers the generic _vlm_shared_pred used
    by the llava/onevision/internvl families."""
    from PIL import Image

    from iadr1_tpu.models.registry import bundle_from_hf_config

    cfg_dict = dict(
        architectures=["LlavaOnevisionForConditionalGeneration"],
        text_config=dict(
            vocab_size=512, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, rope_theta=1e4, tie_word_embeddings=True),
        vision_config=dict(hidden_size=32, intermediate_size=64,
                           num_hidden_layers=2, num_attention_heads=4,
                           image_size=56, patch_size=14),
        image_token_index=499,
        image_grid_pinpoints=[[56, 56], [56, 112], [112, 56]],
    )
    bundle = bundle_from_hf_config(cfg_dict, attention="xla",
                                   precision=FULL_PRECISION)
    assert bundle.shared_pred_fn is not None
    params = bundle.init_params(jax.random.PRNGKey(3))
    rng = np.random.default_rng(6)
    img = Image.fromarray(rng.integers(0, 255, (70, 52, 3), np.uint8))
    patches, grid, seqlen = bundle.preprocess_image(img)
    n, G, N = 1, 2, 4
    nG = n * G
    P = seqlen + 8
    prompt_ids = np.full((n, P), 1, np.int64)
    prompt_ids[0, 1:1 + seqlen] = cfg_dict["image_token_index"]
    prompt_ids[0, 1 + seqlen:] = rng.integers(10, 490, P - 1 - seqlen)
    comp_ids = rng.integers(10, 490, (nG, N)).astype(np.int32)
    budget = patches.shape[0] * patches.shape[1]

    def arrays(ids, k):
        return {key: jnp.asarray(v) for key, v in bundle.vision_arrays(
            ids, [patches] * k, [grid] * k, budget * k).items()}

    rep_ids = np.repeat(prompt_ids, G, 0)
    dense_batch = {
        "input_ids": jnp.asarray(
            np.concatenate([rep_ids, comp_ids], 1), jnp.int32),
        "segment_ids": jnp.ones((nG, P + N), jnp.int32),
        "position_ids": jnp.asarray(np.broadcast_to(
            np.arange(P + N), (nG, P + N)).copy(), jnp.int32),
        "completion_ids": jnp.asarray(comp_ids),
        "completion_mask": jnp.ones((nG, N), jnp.int32),
        "prompt_len": P,
        **arrays(rep_ids, G),
    }
    lp_dense = np.asarray(jax.jit(
        lambda p, b: completion_logps(bundle_score_fn(bundle), p, b, 8)
    )(params, dense_batch))

    shared_batch = {
        "prompt_ids": jnp.asarray(prompt_ids, jnp.int32),
        "prompt_segments": jnp.ones((n, P), jnp.int32),
        "prompt_positions": jnp.asarray(np.broadcast_to(
            np.arange(P), (n, P)).copy(), jnp.int32),
        "completion_ids": jnp.asarray(comp_ids),
        "completion_mask": jnp.ones((nG, N), jnp.int32),
        "completion_positions": jnp.asarray(np.broadcast_to(
            P + np.arange(N), (nG, N)).copy(), jnp.int32),
        **arrays(prompt_ids, 1),
    }
    lp_shared = np.asarray(jax.jit(
        lambda p, b: chunked_token_logps(
            bundle.shared_pred_fn(p, b, G, remat=False),
            bundle.head_kernel_fn(p), b["completion_ids"], 8)
    )(params, shared_batch))
    np.testing.assert_allclose(lp_shared, lp_dense, atol=3e-4, rtol=1e-4)


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
