"""Qwen2-MoE (Qwen1.5-MoE-A2.7B family): sparse-MoE decoder.

Counterpart of the reference's MoE support (model_utils/moe.py aux-loss
wiring + transformers Qwen2MoeForCausalLM).  The attention half is the
qwen2 block (shared _attn_block); the MLP half is the sparse block of
modeling_qwen2_moe.Qwen2MoeSparseMoeBlock: softmax router over
num_experts, top-k per token (optionally renormalized), per-expert SwiGLU
at moe_intermediate_size, plus an always-on shared expert with a sigmoid
scalar gate.

TPU design -- expert-capacity dispatch with static shapes:
* experts are STACKED leaves ([L, E, H, I]): one pytree, lax.scan over
  layers, vmap over experts -- no per-expert modules, and the expert axis
  is a shardable logical axis ("expert") for expert parallelism.
* routing uses lax.top_k twice: per token (the top-k experts) and per
  expert (its top-C tokens by routing weight).  Every shape is static;
  tokens beyond an expert's capacity C are dropped, exactly like
  capacity-based TPU MoEs.  With C >= tokens-per-expert demand the result
  is numerically identical to HF's loop-over-experts (parity tests set
  capacity_factor to cover everything).
* the Switch-style load-balancing aux loss (HF load_balancing_loss_func)
  is returned per layer and averaged over layers by qwen2.apply's aux
  carry; multiply by router_aux_loss_coef in the training loss.
"""

from __future__ import annotations

import dataclasses
import jax
import jax.numpy as jnp
import numpy as np

from iadr1_tpu.models import qwen2
from iadr1_tpu.models.common import dense, rms_norm


@dataclasses.dataclass(frozen=True)
class Qwen2MoeConfig(qwen2.Qwen2Config):
    num_experts: int = 60
    num_experts_per_tok: int = 4
    moe_intermediate_size: int = 1408
    shared_expert_intermediate_size: int = 5632
    norm_topk_prob: bool = False
    router_aux_loss_coef: float = 0.001
    # capacity per expert = ceil(capacity_factor * tokens * top_k / E);
    # tokens routed past an expert's capacity are dropped (weight-ordered)
    capacity_factor: float = 2.0


def config_from_hf(hf: dict) -> Qwen2MoeConfig:
    from iadr1_tpu.models.registry import _qwen2_text_cfg

    base = _qwen2_text_cfg(hf)
    if hf.get("mlp_only_layers"):
        raise NotImplementedError(
            "mlp_only_layers (mixed dense/sparse stacks) breaks the "
            "homogeneous layer scan; all-sparse checkpoints only")
    if hf.get("decoder_sparse_step", 1) != 1:
        raise NotImplementedError("decoder_sparse_step != 1 not supported")
    return Qwen2MoeConfig(
        **dataclasses.asdict(base),
        num_experts=hf.get("num_experts", 60),
        num_experts_per_tok=hf.get("num_experts_per_tok", 4),
        moe_intermediate_size=hf.get("moe_intermediate_size", 1408),
        shared_expert_intermediate_size=hf.get(
            "shared_expert_intermediate_size", 5632),
        norm_topk_prob=hf.get("norm_topk_prob", False),
        router_aux_loss_coef=hf.get("router_aux_loss_coef", 0.001),
        # not an HF field: capacity_factor tunes the dispatch (see class
        # docstring); raise it for exact-parity evaluation
        capacity_factor=hf.get("capacity_factor", 2.0),
    )


# ---------------------------------------------------------------------------
# params
# ---------------------------------------------------------------------------


def init_params(key, cfg: Qwen2MoeConfig, dtype=jnp.float32) -> dict:
    base = qwen2.init_params(key, cfg, dtype)
    L, H = cfg.num_hidden_layers, cfg.hidden_size
    E, I = cfg.num_experts, cfg.moe_intermediate_size
    SI = cfg.shared_expert_intermediate_size
    keys = jax.random.split(jax.random.fold_in(key, 1), 8)

    def stack(k, *shape):
        return jax.random.normal(k, shape, dtype) * 0.02

    base["layers"]["mlp"] = {
        "router": {"kernel": stack(keys[0], L, H, E)},
        "experts": {
            "gate": {"kernel": stack(keys[1], L, E, H, I)},
            "up": {"kernel": stack(keys[2], L, E, H, I)},
            "down": {"kernel": stack(keys[3], L, E, I, H)},
        },
        "shared": {
            "gate": {"kernel": stack(keys[4], L, H, SI)},
            "up": {"kernel": stack(keys[5], L, H, SI)},
            "down": {"kernel": stack(keys[6], L, SI, H)},
        },
        "shared_gate": {"kernel": stack(keys[7], L, H, 1)},
    }
    return base


def logical_axes(cfg: Qwen2MoeConfig) -> dict:
    axes = qwen2.logical_axes(cfg)
    axes["layers"]["mlp"] = {
        "router": {"kernel": (None, "embed", None)},
        # expert parallelism: the expert axis takes the tp submesh, so the
        # per-expert intermediate dim stays unsharded (a mesh axis may
        # appear only once per PartitionSpec)
        "experts": {
            "gate": {"kernel": (None, "expert", "embed", None)},
            "up": {"kernel": (None, "expert", "embed", None)},
            "down": {"kernel": (None, "expert", None, "embed")},
        },
        "shared": {
            "gate": {"kernel": (None, "embed", "mlp")},
            "up": {"kernel": (None, "embed", "mlp")},
            "down": {"kernel": (None, "mlp", "embed")},
        },
        "shared_gate": {"kernel": (None, "embed", None)},
    }
    return axes


def convert_hf(state_dict: dict, cfg: Qwen2MoeConfig, dtype=jnp.float32) -> dict:
    """HF Qwen2MoeForCausalLM state dict -> stacked pytree."""
    sd = state_dict
    L, E = cfg.num_hidden_layers, cfg.num_experts

    def t(name):  # [out, in] -> [in, out]
        return np.asarray(sd[name], np.float32).T

    def stack_layers(fmt, transpose=True):
        return jnp.asarray(
            np.stack([
                t(fmt.format(l=l)) if transpose
                else np.asarray(sd[fmt.format(l=l)], np.float32)
                for l in range(L)
            ]), dtype)

    def stack_experts(fmt):
        return jnp.asarray(
            np.stack([
                np.stack([t(fmt.format(l=l, e=e)) for e in range(E)])
                for l in range(L)
            ]), dtype)

    params = {
        "embed": {"weight": jnp.asarray(
            np.asarray(sd["model.embed_tokens.weight"], np.float32), dtype)},
        "final_norm": jnp.asarray(
            np.asarray(sd["model.norm.weight"], np.float32), dtype),
        "layers": {
            "input_norm": stack_layers(
                "model.layers.{l}.input_layernorm.weight", transpose=False),
            "post_attn_norm": stack_layers(
                "model.layers.{l}.post_attention_layernorm.weight",
                transpose=False),
            "attn": {
                name: {"kernel": stack_layers(
                    f"model.layers.{{l}}.self_attn.{hfn}_proj.weight")}
                for name, hfn in
                (("q", "q"), ("k", "k"), ("v", "v"), ("o", "o"))
            },
            "mlp": {
                "router": {"kernel": stack_layers(
                    "model.layers.{l}.mlp.gate.weight")},
                "experts": {
                    "gate": {"kernel": stack_experts(
                        "model.layers.{l}.mlp.experts.{e}.gate_proj.weight")},
                    "up": {"kernel": stack_experts(
                        "model.layers.{l}.mlp.experts.{e}.up_proj.weight")},
                    "down": {"kernel": stack_experts(
                        "model.layers.{l}.mlp.experts.{e}.down_proj.weight")},
                },
                "shared": {
                    "gate": {"kernel": stack_layers(
                        "model.layers.{l}.mlp.shared_expert.gate_proj.weight")},
                    "up": {"kernel": stack_layers(
                        "model.layers.{l}.mlp.shared_expert.up_proj.weight")},
                    "down": {"kernel": stack_layers(
                        "model.layers.{l}.mlp.shared_expert.down_proj.weight")},
                },
                "shared_gate": {"kernel": stack_layers(
                    "model.layers.{l}.mlp.shared_expert_gate.weight")},
            },
        },
    }
    for name in ("q", "k", "v"):
        key = f"model.layers.0.self_attn.{name}_proj.bias"
        if key in sd:
            params["layers"]["attn"][name]["bias"] = jnp.asarray(
                np.stack([
                    np.asarray(
                        sd[f"model.layers.{l}.self_attn.{name}_proj.bias"],
                        np.float32)
                    for l in range(cfg.num_hidden_layers)
                ]), dtype)
    if not cfg.tie_word_embeddings:
        params["lm_head"] = {"kernel": jnp.asarray(
            t("lm_head.weight"), dtype)}
    return params


# ---------------------------------------------------------------------------
# sparse MoE block
# ---------------------------------------------------------------------------


def moe_block(cfg: Qwen2MoeConfig, x: jax.Array, mlp_p: dict):
    """Sparse MoE MLP over [B, T, H]; returns (out, aux_loss).

    Matches Qwen2MoeSparseMoeBlock.forward exactly whenever every token
    that selected an expert fits within that expert's capacity.
    """
    B, T, H = x.shape
    S = B * T
    E, K = cfg.num_experts, cfg.num_experts_per_tok
    xf = x.reshape(S, H)

    router_logits = dense(xf, mlp_p["router"]["kernel"])        # [S, E]
    probs = jax.nn.softmax(router_logits.astype(jnp.float32), axis=-1)
    weights, selected = jax.lax.top_k(probs, K)                 # [S, K]
    if cfg.norm_topk_prob:
        weights = weights / weights.sum(axis=-1, keepdims=True)

    # dense [S, E] routing-weight matrix (zero where not selected)
    w_full = (jax.nn.one_hot(selected, E, dtype=jnp.float32)
              * weights[..., None]).sum(axis=1)

    # per-expert capacity dispatch: each expert processes its top-C tokens
    C = min(S, int(np.ceil(cfg.capacity_factor * S * K / E)))
    gate_vals, token_idx = jax.lax.top_k(w_full.T, C)           # [E, C]
    xg = jnp.take(xf, token_idx.reshape(-1), axis=0).reshape(E, C, H)

    def expert(x_e, gk, uk, dk):
        return dense(jax.nn.silu(dense(x_e, gk)) * dense(x_e, uk), dk)

    ex = mlp_p["experts"]
    ye = jax.vmap(expert)(xg, ex["gate"]["kernel"], ex["up"]["kernel"],
                          ex["down"]["kernel"])                 # [E, C, H]
    ye = ye * gate_vals[..., None].astype(ye.dtype)
    out = jnp.zeros((S, H), ye.dtype).at[token_idx.reshape(-1)].add(
        ye.reshape(-1, H))

    sh = mlp_p["shared"]
    shared = dense(jax.nn.silu(dense(xf, sh["gate"]["kernel"]))
                   * dense(xf, sh["up"]["kernel"]), sh["down"]["kernel"])
    sg = jax.nn.sigmoid(
        dense(xf, mlp_p["shared_gate"]["kernel"]).astype(jnp.float32))
    out = out + sg.astype(shared.dtype) * shared

    # Switch load-balancing aux (HF load_balancing_loss_func): E * sum_e
    # f_e * P_e with f_e the fraction of (token, slot) routings to e and
    # P_e the mean router prob.  HF aggregates gates across layers before
    # the product; we compute per layer and average (equal when routing
    # statistics are layer-stationary).
    f = jax.nn.one_hot(selected, E, dtype=jnp.float32).mean(axis=(0, 1))
    p_mean = probs.mean(axis=0)
    aux = E * jnp.sum(f * p_mean)
    return out.reshape(B, T, H), aux


def _moe_layer(cfg, h, layer_params, cos, sin, cache_kv, write_idx,
               attention_fn, attend_fresh=False, layer_lora=None,
               lora_scale: float = 1.0):
    h, new_cache_kv, _la = qwen2._attn_block(
        cfg, h, layer_params, cos, sin, cache_kv, write_idx, attention_fn,
        attend_fresh=attend_fresh, layer_lora=layer_lora,
        lora_scale=lora_scale,
    )
    x = rms_norm(h, layer_params["post_attn_norm"], cfg.rms_norm_eps)
    mlp_out, aux = moe_block(cfg, x, layer_params["mlp"])
    return h + mlp_out, new_cache_kv, aux


def apply(params, cfg: Qwen2MoeConfig, input_ids=None, **kwargs):
    """qwen2.apply with the sparse decoder layer; same cache semantics."""
    return qwen2.apply(params, cfg, input_ids, layer_fn=_moe_layer, **kwargs)


head_kernel = qwen2.head_kernel
logits = qwen2.logits
init_cache = qwen2.init_cache
