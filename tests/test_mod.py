"""Mixture-of-Depths (models/mod.py): static top-k routing properties and
a learns-under-training smoke run (reference delegates to the external
MoD package, model_utils/mod.py:26-42; this is the first-party TPU
version)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from iadr1_tpu.models import qwen2
from iadr1_tpu.models.mod import apply_mod, convert_to_mod

CFG = qwen2.Qwen2Config(
    vocab_size=128, hidden_size=32, intermediate_size=64,
    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    rope_theta=10000.0, rms_norm_eps=1e-6, tie_word_embeddings=True,
    max_position_embeddings=256,
)


def _setup(seed=0):
    params = qwen2.init_params(jax.random.PRNGKey(seed), CFG)
    params = convert_to_mod(jax.random.PRNGKey(seed + 1), params, CFG)
    return params


def _batch(B=2, T=32, seed=0):
    rng = np.random.default_rng(seed)
    ids = jnp.asarray(rng.integers(1, 128, (B, T)), jnp.int32)
    pos = jnp.asarray(np.broadcast_to(np.arange(T), (B, T)).copy(),
                      jnp.int32)
    return ids, pos


def test_mod_routes_capacity_and_skips_padding():
    params = _setup()
    ids, pos = _batch()
    segs = np.ones((2, 32), np.int32)
    segs[:, -8:] = 0                      # right padding
    segs = jnp.asarray(segs)

    h = jax.jit(lambda p: apply_mod(
        p, CFG, ids, position_ids=pos, segment_ids=segs, capacity=0.25,
        remat=False,
    ))(params)
    assert h.shape == (2, 32, 32)
    assert np.isfinite(np.asarray(h)).all()

    # padded rows never route: their hidden state is exactly the
    # final-norm of the raw embedding (identity residual stream)
    from iadr1_tpu.models.common import embed_lookup, rms_norm

    base = rms_norm(
        embed_lookup(params["embed"]["weight"], ids).astype(h.dtype),
        params["final_norm"], CFG.rms_norm_eps,
    )
    np.testing.assert_array_equal(np.asarray(h[:, -8:]),
                                  np.asarray(base[:, -8:]))
    # real tokens: at most capacity*T per layer routed; with 2 layers at
    # least (T_real - 2*k) rows must remain identity
    changed = ~np.all(np.asarray(h[:, :24]) == np.asarray(base[:, :24]),
                      axis=-1)
    assert changed.sum(axis=1).max() <= 2 * 8  # k = 0.25 * 32 = 8, 2 layers


def test_mod_full_capacity_touches_every_real_token():
    params = _setup(seed=2)
    # push router scores positive so multipliers are non-negligible
    params["layers"]["mod_router"]["kernel"] = (
        params["layers"]["mod_router"]["kernel"] + 0.05
    )
    ids, pos = _batch(seed=3)
    h = apply_mod(params, CFG, ids, position_ids=pos, capacity=1.0,
                  remat=False)
    from iadr1_tpu.models.common import embed_lookup, rms_norm

    base = rms_norm(
        embed_lookup(params["embed"]["weight"], ids).astype(h.dtype),
        params["final_norm"], CFG.rms_norm_eps,
    )
    changed = ~np.isclose(np.asarray(h), np.asarray(base)).all(axis=-1)
    assert changed.all()


def test_mod_trains_and_router_gets_gradient():
    from iadr1_tpu.data.tokenize import IGNORE_INDEX
    from iadr1_tpu.train.sft import sft_loss

    params = _setup(seed=4)
    ids, pos = _batch(B=4, T=32, seed=5)
    labels = np.asarray(ids).copy()
    labels[:, :8] = IGNORE_INDEX
    labels = jnp.asarray(labels)

    def loss_fn(p):
        h = apply_mod(p, CFG, ids, position_ids=pos, capacity=0.5)
        logits = qwen2.logits(p, CFG, h)
        loss, _ = sft_loss(logits, labels)
        return loss

    import optax

    opt = optax.adam(5e-3)
    state = opt.init(params)
    losses = []
    grad_fn = jax.jit(jax.value_and_grad(loss_fn))
    p = params
    for _ in range(12):
        loss, g = grad_fn(p)
        losses.append(float(loss))
        updates, state = opt.update(g, state)
        p = optax.apply_updates(p, updates)
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.9, losses
    # the router is on the gradient path
    assert float(np.abs(np.asarray(
        g["layers"]["mod_router"]["kernel"])).max()) > 0
