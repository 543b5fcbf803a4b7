"""Shared-prompt forward for grouped-rollout scoring (GRPO updates).

In a GRPO update batch the G rollouts of one prompt share the entire
P-token prefix; the dense path re-runs every decoder matmul on all G
copies.  This module factors the update forward the way DualKV-style
shared-prompt attention does: the UNIQUE prompts run once ([n, P]), the
completions run per rollout ([n*G, N]) and attend to

* the shared prompt K/V (repeated across the group -- jnp.repeat is
  differentiable, so prompt-side gradients are the sum over rollouts,
  exactly the dense path's math), and
* their own causal completion K/V,

with the two attention outputs merged through their logsumexps (exact
online-softmax composition, not an approximation).  Prompt-side QKV/MLP/
embedding FLOPs drop by the group factor; at the recipe shapes
(P=4096 >> N=512) that is most of the update forward and backward.

Everything reuses the qwen2 layer primitives (rms_norm, _lora_dense,
rope) and the flash kernel (which already returns lse); no new Pallas
code.  LoRA factors apply on both sides.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from iadr1_tpu.core.precision import DEFAULT_PRECISION, Precision
from iadr1_tpu.models import common, qwen2
from iadr1_tpu.models.common import make_attention_mask, rms_norm
from iadr1_tpu.models.qwen2 import _lora_dense


def _attention_with_lse_xla(q, k, v, mask, scale):
    """[B,H,T,D] x [B,Hkv,S,D] -> (out [B,H,T,D], lse [B,H,T]).

    Dense oracle with logsumexp output (the CPU/test twin of
    flash_attention_with_lse); fully-masked rows return out=0, lse=-inf.
    """
    B, H, T, D = q.shape
    Hkv = k.shape[1]
    if Hkv != H:
        rep = H // Hkv
        k = jnp.repeat(k, rep, axis=1)
        v = jnp.repeat(v, rep, axis=1)
    scores = jnp.einsum(
        "bhtd,bhsd->bhts", q, k, preferred_element_type=jnp.float32
    ) * scale
    neg = jnp.finfo(jnp.float32).min * 0.5
    scores = jnp.where(mask, scores, neg)
    lse = jax.scipy.special.logsumexp(scores, axis=-1)
    empty = lse <= neg / 4
    p = jnp.where(
        empty[..., None], 0.0, jnp.exp(scores - lse[..., None])
    ).astype(v.dtype)
    out = jnp.einsum("bhts,bhsd->bhtd", p, v,
                     preferred_element_type=jnp.float32).astype(q.dtype)
    lse = jnp.where(empty, -jnp.inf, lse)
    return out, lse


def _merge_attention(o1, lse1, o2, lse2):
    """Exact online-softmax merge of two partial attentions over disjoint
    key sets ([B,H,T,D], [B,H,T]).  +-inf lse (empty key set) contributes
    zero mass; a row empty on both sides returns zeros."""
    l1 = jnp.where(jnp.isfinite(lse1), lse1, -jnp.inf)
    l2 = jnp.where(jnp.isfinite(lse2), lse2, -jnp.inf)
    m = jnp.maximum(l1, l2)
    m0 = jnp.where(jnp.isfinite(m), m, 0.0)
    w1 = jnp.where(jnp.isfinite(l1), jnp.exp(l1 - m0), 0.0)
    w2 = jnp.where(jnp.isfinite(l2), jnp.exp(l2 - m0), 0.0)
    denom = jnp.maximum(w1 + w2, 1e-30)
    o = (o1.astype(jnp.float32) * w1[..., None]
         + o2.astype(jnp.float32) * w2[..., None]) / denom[..., None]
    return o.astype(o1.dtype)


def shared_prompt_hidden(
    params: dict,
    cfg: qwen2.Qwen2Config,
    *,
    prompt_ids: jax.Array,       # [n, P]
    prompt_segments: jax.Array,  # [n, P] (0 = left padding)
    prompt_positions: jax.Array, # [n, P] or [3, n, P] (M-RoPE)
    comp_ids: jax.Array,         # [n*G, N]
    comp_segments: jax.Array,    # [n*G, N] (0 = past EOS)
    comp_positions: jax.Array,   # [n*G, N] or [3, n*G, N]
    group_size: int,
    precision: Precision = DEFAULT_PRECISION,
    use_flash: bool = False,
    remat: bool = True,
    lora: dict | None = None,
    lora_scale: float = 1.0,
    prompt_embeds: jax.Array | None = None,  # [n, P, hid] (VLM scatter)
) -> tuple[jax.Array, jax.Array]:
    """-> (prompt_hidden [n, P, hid], comp_hidden [n*G, N, hid]), final-normed.

    Equivalent (same math, different factorization) to qwen2.apply on the
    G-repeated concatenated [n*G, P+N] batch, restricted to causal
    visibility prompt->prompt and completion->(own prompt + own causal
    prefix).  ``prompt_embeds`` overrides the prompt embedding lookup (the
    VLM wrappers splice image features into it).
    """
    G = group_size
    n, P = prompt_ids.shape
    nG, N = comp_ids.shape
    H, Hkv, D = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim_
    scale = D ** -0.5

    hp = (prompt_embeds if prompt_embeds is not None
          else common.embed_lookup(params["embed"]["weight"], prompt_ids)
          ).astype(precision.compute_dtype)
    hc = common.embed_lookup(params["embed"]["weight"], comp_ids).astype(
        precision.compute_dtype)

    if cfg.mrope_section is not None:
        pp = (jnp.broadcast_to(prompt_positions, (3, n, P))
              if prompt_positions.ndim == 2 else prompt_positions)
        cp = (jnp.broadcast_to(comp_positions, (3, nG, N))
              if comp_positions.ndim == 2 else comp_positions)
        cos_p, sin_p = common.mrope_cos_sin(
            pp, D, cfg.rope_theta, cfg.mrope_section)
        cos_c, sin_c = common.mrope_cos_sin(
            cp, D, cfg.rope_theta, cfg.mrope_section)
    else:
        cos_p, sin_p = common.rope_cos_sin(
            prompt_positions, D, cfg.rope_theta, scaling=cfg.rope_scaling)
        cos_c, sin_c = common.rope_cos_sin(
            comp_positions, D, cfg.rope_theta, scaling=cfg.rope_scaling)

    prompt_segs_rep = jnp.repeat(prompt_segments, G, axis=0)     # [nG, P]
    p_idx = jnp.broadcast_to(jnp.arange(P), (n, P))
    c_idx = jnp.broadcast_to(jnp.arange(N), (nG, N))
    if use_flash:
        from iadr1_tpu.kernels.flash_attention import flash_attention_with_lse
        mask_pp = mask_cc = mask_cp = None
    else:
        mask_pp = make_attention_mask(
            prompt_segments, prompt_segments, p_idx, p_idx, causal=True)
        mask_cc = make_attention_mask(
            comp_segments, comp_segments, c_idx, c_idx, causal=True)
        # cross: every valid completion token sees every valid token of its
        # own prompt (the prompt is strictly in the past -- no causal term)
        mask_cp = make_attention_mask(
            comp_segments, prompt_segs_rep, None, None, causal=False)

    def attn_with_lse(q, k, v, q_segs, kv_segs, mask, causal):
        # q/k/v in [B, T, H, D] -> kernel layout [B, H, T, D]
        qt = q.transpose(0, 2, 1, 3)
        kt = k.transpose(0, 2, 1, 3)
        vt = v.transpose(0, 2, 1, 3)
        if use_flash:
            out, lse = flash_attention_with_lse(
                qt, kt, vt, segment_ids=q_segs, kv_segment_ids=kv_segs,
                causal=causal)
            # flash marks empty rows with +inf lse; unify on -inf
            lse = jnp.where(jnp.isposinf(lse), -jnp.inf, lse)
            return out, lse
        return _attention_with_lse_xla(qt, kt, vt, mask, scale)

    def qkv(x, attn_p, la, B, T):
        q = _lora_dense(x, attn_p["q"]["kernel"], attn_p["q"].get("bias"),
                        la("attn", "q", "kernel"), lora_scale)
        k = _lora_dense(x, attn_p["k"]["kernel"], attn_p["k"].get("bias"),
                        la("attn", "k", "kernel"), lora_scale)
        v = _lora_dense(x, attn_p["v"]["kernel"], attn_p["v"].get("bias"),
                        la("attn", "v", "kernel"), lora_scale)
        return (q.reshape(B, T, H, D), k.reshape(B, T, Hkv, D),
                v.reshape(B, T, Hkv, D))

    def mlp(x, mlp_p, la):
        gate = _lora_dense(x, mlp_p["gate"]["kernel"], None,
                           la("mlp", "gate", "kernel"), lora_scale)
        up = _lora_dense(x, mlp_p["up"]["kernel"], None,
                         la("mlp", "up", "kernel"), lora_scale)
        return _lora_dense(jax.nn.silu(gate) * up, mlp_p["down"]["kernel"],
                           None, la("mlp", "down", "kernel"), lora_scale)

    def body(carry, xs):
        hp, hc = carry
        layer_params, layer_lora = xs
        attn_p = layer_params["attn"]

        def la(*path):
            node = layer_lora
            for p in path:
                if node is None:
                    return None
                node = node.get(p)
            return node

        # --- prompt side: standard causal self-attention -----------------
        xp = rms_norm(hp, layer_params["input_norm"], cfg.rms_norm_eps)
        qp, kp, vp = qkv(xp, attn_p, la, n, P)
        qp, kp = common.apply_rope(qp, kp, cos_p, sin_p)
        op, _ = attn_with_lse(qp, kp, vp, prompt_segments, prompt_segments,
                              mask_pp, causal=True)
        op = op.transpose(0, 2, 1, 3).reshape(n, P, H * D)
        hp = hp + _lora_dense(op, attn_p["o"]["kernel"], None,
                              la("attn", "o", "kernel"), lora_scale)
        xp2 = rms_norm(hp, layer_params["post_attn_norm"], cfg.rms_norm_eps)
        hp = hp + mlp(xp2, layer_params["mlp"], la)

        # --- completion side: shared-prompt KV + own causal KV -----------
        xc = rms_norm(hc, layer_params["input_norm"], cfg.rms_norm_eps)
        qc, kc, vc = qkv(xc, attn_p, la, nG, N)
        qc, kc = common.apply_rope(qc, kc, cos_c, sin_c)
        kp_rep = jnp.repeat(kp, G, axis=0)      # grads sum over the group
        vp_rep = jnp.repeat(vp, G, axis=0)
        o1, lse1 = attn_with_lse(qc, kp_rep, vp_rep, comp_segments,
                                 prompt_segs_rep, mask_cp, causal=False)
        o2, lse2 = attn_with_lse(qc, kc, vc, comp_segments, comp_segments,
                                 mask_cc, causal=True)
        oc = _merge_attention(o1, lse1, o2, lse2)
        oc = oc.transpose(0, 2, 1, 3).reshape(nG, N, H * D)
        hc = hc + _lora_dense(oc, attn_p["o"]["kernel"], None,
                              la("attn", "o", "kernel"), lora_scale)
        xc2 = rms_norm(hc, layer_params["post_attn_norm"], cfg.rms_norm_eps)
        hc = hc + mlp(xc2, layer_params["mlp"], la)
        return (hp, hc), None

    if remat:
        from iadr1_tpu.models.attention import FLASH_REMAT_POLICY

        body = jax.checkpoint(
            body,
            policy=FLASH_REMAT_POLICY if remat != "full" else None,
        )
    layer_lora = lora.get("layers", lora) if lora is not None else None
    (hp, hc), _ = jax.lax.scan(body, (hp, hc),
                               (params["layers"], layer_lora))
    hp = rms_norm(hp, params["final_norm"], cfg.rms_norm_eps)
    hc = rms_norm(hc, params["final_norm"], cfg.rms_norm_eps)
    return hp, hc


def shared_prompt_pred_hidden(
    params, cfg, batch, group_size: int, *,
    precision: Precision = DEFAULT_PRECISION, use_flash: bool = False,
    remat=True, lora=None, lora_scale: float = 1.0,
    prompt_embeds: jax.Array | None = None,
) -> jax.Array:
    """Hidden states that PREDICT the completion tokens: [n*G, N, hid].

    Prediction position t reads hidden at t-1: token 0 is predicted by the
    prompt's last valid hidden state (identical across the group -> taken
    from the shared prompt pass), tokens 1..N-1 by completion hiddens
    0..N-2.

    batch fields: prompt_ids/prompt_segments/prompt_positions [n, ...],
    completion_ids/completion_mask/completion_positions [n*G, ...].
    """
    hp, hc = shared_prompt_hidden(
        params, cfg,
        prompt_ids=batch["prompt_ids"],
        prompt_segments=batch["prompt_segments"],
        prompt_positions=batch["prompt_positions"],
        comp_ids=batch["completion_ids"],
        comp_segments=batch["completion_mask"],
        comp_positions=batch["completion_positions"],
        group_size=group_size, precision=precision, use_flash=use_flash,
        remat=remat, lora=lora, lora_scale=lora_scale,
        prompt_embeds=prompt_embeds,
    )
    n, P, Hd = hp.shape
    nG, N, _ = hc.shape
    # index of the last VALID prompt token (P-1 for left padding; computed
    # from trailing zeros so right-padded inputs also work)
    segs = batch["prompt_segments"]
    trailing = jnp.argmax(segs[:, ::-1] != 0, axis=1)
    last = jnp.maximum(P - 1 - trailing, 0)
    hp_last = jnp.take_along_axis(hp, last[:, None, None].astype(jnp.int32),
                                  axis=1)                       # [n, 1, hid]
    hp_last = jnp.repeat(hp_last, nG // n, axis=0)              # [nG, 1, hid]
    return jnp.concatenate([hp_last, hc[:, :-1]], axis=1)       # [nG, N, hid]
