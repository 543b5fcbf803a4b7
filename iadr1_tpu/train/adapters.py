"""Tuning modes: full / freeze / LoRA, vision-tower freezing, mm-proj-only.

The TPU counterpart of the reference adapter layer
(llamafactory/model/adapter.py init_adapter + model_utils/visual.py
composite-model freezing): instead of mutating requires_grad on module
parameters, tuning modes are *optax masks* over the param pytree --
frozen leaves get zero updates, and LoRA adds factorized deltas as extra
leaves while masking the base weights.

Composite-model keys (visual.py COMPOSITE_MODELS): our param trees already
separate "vision" / "projector" / "text", so freezing is a path prefix test.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax


@dataclasses.dataclass(frozen=True)
class TuningConfig:
    finetuning_type: str = "full"      # full | freeze | lora
    freeze_vision_tower: bool = True   # reference default (finetuning_args.py:416)
    train_mm_proj_only: bool = False
    # freeze mode: train only the last N decoder layers (llamafactory
    # freeze_trainable_layers)
    freeze_trainable_layers: int = 2
    # lora
    lora_rank: int = 8
    lora_alpha: float = 16.0
    lora_target: tuple = ("q", "k", "v", "o", "gate", "up", "down")

    @property
    def lora_scale(self) -> float:
        import math

        return (self.lora_alpha / math.sqrt(self.lora_rank)
                if self.use_rslora else self.lora_alpha / self.lora_rank)
    # DoRA (reference adapter.py use_dora): trainable per-column magnitude
    # over the direction (W + scale*A@B)/||.||_col, norms computed factored
    # (models/qwen2.py _lora_dense)
    use_dora: bool = False
    # rsLoRA (reference adapter.py use_rslora -> peft): scale by
    # alpha/sqrt(r) instead of alpha/r (rank-stabilized)
    use_rslora: bool = False
    # PiSSA (reference adapter.py pissa_init): initialize A/B from the
    # principal singular vectors of each target kernel and train against
    # the residual base (pissa_init() below; peft init_lora_weights=
    # "pissa_niter_K" randomized-SVD variant)
    pissa_init: bool = False


def _path_str(path) -> str:
    return "/".join(
        str(getattr(p, "key", getattr(p, "idx", p))) for p in path
    )


def trainable_mask(params: Any, cfg: TuningConfig,
                   num_layers: int | None = None) -> Any:
    """Boolean pytree: True = trainable, mirroring init_adapter semantics."""

    def decide(path, leaf):
        p = _path_str(path)
        if cfg.train_mm_proj_only:
            return p.startswith("projector") or "merger" in p
        if cfg.freeze_vision_tower and p.startswith("vision"):
            # the merger/projector stays trainable even with a frozen tower
            # (visual.py:283-288 forbids only patch_embed + blocks)
            if "merger" not in p:
                return False
        if cfg.finetuning_type == "full":
            return True
        if cfg.finetuning_type == "freeze":
            m = re.search(r"layers/.*", p)
            if "layers" in p and num_layers is not None:
                # stacked layer axis: handled via per-layer masking below --
                # whole-stack leaves train only if any layer trains; we
                # approximate layer-wise freeze with a scaled mask in
                # freeze_update_transform instead.
                return True
            return not p.startswith("embed")
        if cfg.finetuning_type == "lora":
            return False  # base weights frozen; LoRA params added separately
        raise ValueError(cfg.finetuning_type)

    return jax.tree_util.tree_map_with_path(decide, params)


def masked_optimizer(optimizer: optax.GradientTransformation, mask: Any):
    """Zero updates for frozen leaves (DeepSpeed/requires_grad analogue)."""
    return optax.chain(
        optax.masked(optimizer, mask),
        # ensure frozen leaves produce exact zeros even if masked() leaves
        # them untouched
    )


# ---------------------------------------------------------------------------
# LoRA
# ---------------------------------------------------------------------------


def init_lora_params(key, params: Any, cfg: TuningConfig) -> Any:
    """LoRA A/B factors for every targeted kernel leaf.

    Returns a pytree with the same structure as ``params`` where targeted
    kernels map to {"a": [..., in, r], "b": [..., r, out]} and everything
    else maps to None.  Stacked layer kernels get stacked factors.

    Quantized base kernels (models/quant.py dicts) get adapters too --
    the QLoRA composition (reference adapter.py: bnb 4-bit base + LoRA):
    shapes come from the quant metadata, factor dtype from the scales.
    """
    from iadr1_tpu.models.quant import (
        dequantize_kernel, is_quantized, quantized_shape,
    )

    keys = iter(jax.random.split(key, 4096))

    def make(path, leaf):
        p = _path_str(path)
        if not p.endswith("kernel"):
            return None
        parts = p.split("/")
        name = parts[-2] if len(parts) >= 2 else ""
        if name not in cfg.lora_target:
            return None
        if is_quantized(leaf):
            shape, dtype = quantized_shape(leaf), leaf["scales"].dtype
        else:
            shape, dtype = leaf.shape, leaf.dtype
        if len(shape) == 2:
            in_dim, out_dim = shape
            a = jax.random.normal(next(keys), (in_dim, cfg.lora_rank),
                                  dtype) * 0.01
            b = jnp.zeros((cfg.lora_rank, out_dim), dtype)
        elif len(shape) == 3:  # stacked layers [L, in, out]
            L, in_dim, out_dim = shape
            a = jax.random.normal(next(keys), (L, in_dim, cfg.lora_rank),
                                  dtype) * 0.01
            b = jnp.zeros((L, cfg.lora_rank, out_dim), dtype)
        else:
            return None
        out = {"a": a, "b": b}
        if cfg.use_dora:
            # magnitude initialized to the base column norms: at init the
            # DoRA rescale is exactly 1 (B = 0 -> direction == W)
            w = dequantize_kernel(leaf) if is_quantized(leaf) else leaf
            out["m"] = jnp.sqrt(
                jnp.sum(w.astype(jnp.float32) ** 2, axis=-2) + 1e-12
            ).astype(dtype)
        return out

    return jax.tree_util.tree_map_with_path(
        make, params, is_leaf=lambda x: is_quantized(x))


def _randomized_svd(w, r: int, niter: int = 4, seed: int = 0,
                    oversample: int = 8):
    """Top-r SVD by randomized range finding with power iterations (the
    peft "pissa_niter_K" fast path; full SVD of a 7B MLP kernel on one
    CPU core is minutes per matrix)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    w = np.asarray(w, np.float64)
    k = min(r + oversample, *w.shape)
    y = w @ rng.standard_normal((w.shape[1], k))
    for _ in range(niter):
        y, _ = np.linalg.qr(y)
        y = w @ (w.T @ y)
    q, _ = np.linalg.qr(y)
    u_s, s, vt = np.linalg.svd(q.T @ w, full_matrices=False)
    u = q @ u_s
    return u[:, :r], s[:r], vt[:r]


def pissa_init(params: Any, cfg: TuningConfig, niter: int = 4):
    """(lora, residual_params): principal-singular-vector initialization.

    For each target kernel W: A = U_r sqrt(S_r) / sqrt(scale),
    B = sqrt(S_r) V_r^T / sqrt(scale), and the base becomes the residual
    W - scale*A@B, so the runtime-scaled adapter starts exactly at the
    principal component (reference adapter.py pissa_init ->
    peft init_lora_weights="pissa[_niter_K]").  A@B is materialized only
    HERE, on host, once.
    """
    if cfg.use_dora:
        raise ValueError("pissa_init + use_dora is unsupported (as in peft)")
    scale = cfg.lora_scale
    lora_tree = {}
    residual_by_path = {}

    def factor(w2d, seed):
        u, s, vt = _randomized_svd(w2d, cfg.lora_rank, niter=niter,
                                   seed=seed)
        root_s = np.sqrt(s / scale)
        a = (u * root_s[None, :]).astype(np.float32)
        b = (root_s[:, None] * vt).astype(np.float32)
        res = np.asarray(w2d, np.float32) - scale * (a @ b)
        return a, b, res

    import numpy as np

    def make(path, leaf):
        p = _path_str(path)
        parts = p.split("/")
        name = parts[-2] if len(parts) >= 2 else ""
        if not p.endswith("kernel") or name not in cfg.lora_target:
            return None
        if leaf.ndim == 2:
            a, b, res = factor(np.asarray(leaf, np.float32),
                               seed=abs(hash(p)) % (2**31))
            residual_by_path[p] = jnp.asarray(res, leaf.dtype)
            return {"a": jnp.asarray(a, leaf.dtype),
                    "b": jnp.asarray(b, leaf.dtype)}
        if leaf.ndim == 3:
            outs = [factor(np.asarray(leaf[i], np.float32),
                           seed=(abs(hash(p)) + i) % (2**31))
                    for i in range(leaf.shape[0])]
            residual_by_path[p] = jnp.asarray(
                np.stack([o[2] for o in outs]), leaf.dtype)
            return {"a": jnp.asarray(np.stack([o[0] for o in outs]),
                                     leaf.dtype),
                    "b": jnp.asarray(np.stack([o[1] for o in outs]),
                                     leaf.dtype)}
        return None

    lora_tree = jax.tree_util.tree_map_with_path(make, params)

    def swap(path, leaf):
        return residual_by_path.get(_path_str(path), leaf)

    residual_params = jax.tree_util.tree_map_with_path(swap, params)
    return lora_tree, residual_params


def merge_lora(params: Any, lora: Any, cfg: TuningConfig) -> Any:
    """Effective params: W + (alpha/r) * A @ B, leaf-wise (path-matched)."""
    scale = cfg.lora_scale
    lora_by_path = {}

    def collect(path, node):
        lora_by_path[_path_str(path)] = node
        return node

    jax.tree_util.tree_map_with_path(
        collect, lora,
        is_leaf=lambda x: x is None or (isinstance(x, dict) and "a" in x),
    )

    def combine(path, w):
        ab = lora_by_path.get(_path_str(path))
        if ab is None:
            return w
        from iadr1_tpu.models.quant import dequantize_kernel, is_quantized

        if is_quantized(w):
            # QLoRA export semantics (peft merge_and_unload on a bnb
            # base): dequantize, then fold the adapter in full precision
            w = dequantize_kernel(w, ab["a"].dtype)
        delta = jnp.einsum("...ir,...ro->...io", ab["a"], ab["b"])
        merged = w + (scale * delta).astype(w.dtype)
        if isinstance(ab, dict) and "m" in ab:
            # DoRA export: m * direction (peft dora merge)
            norm = jnp.sqrt(
                jnp.sum(merged.astype(jnp.float32) ** 2, axis=-2,
                        keepdims=True) + 1e-12
            )
            merged = (
                merged.astype(jnp.float32) / norm
                * ab["m"].astype(jnp.float32)[..., None, :]
            ).astype(w.dtype)
        return merged

    from iadr1_tpu.models.quant import is_quantized

    return jax.tree_util.tree_map_with_path(
        combine, params, is_leaf=lambda x: is_quantized(x))


def count_params(tree) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))


def layerwise_freeze_transform(num_layers: int, trainable_layers: int):
    """Zero updates for all but the last ``trainable_layers`` stacked layers.

    The freeze-tuning analogue for scan-stacked parameters (reference
    _setup_freeze_tuning trains the last N decoder layers,
    llamafactory/model/adapter.py).
    """
    keep_from = num_layers - trainable_layers

    def init(params):
        return optax.EmptyState()

    def update(updates, state, params=None):
        def scale(u):
            if hasattr(u, "shape") and u.ndim >= 1 and u.shape[0] == num_layers:
                mask_shape = (num_layers,) + (1,) * (u.ndim - 1)
                mask = (jnp.arange(num_layers) >= keep_from).reshape(mask_shape)
                return u * mask.astype(u.dtype)
            return u

        return jax.tree.map(scale, updates), state

    return optax.GradientTransformation(init, update)


def apply_tuning(optimizer, params, cfg: TuningConfig,
                 num_layers: int | None = None):
    """Wrap an optimizer with the tuning mode's masking."""
    if cfg.finetuning_type == "lora":
        return optimizer  # LoRA trains only the lora pytree; no masking
    mask = trainable_mask(params, cfg, num_layers)
    opt = optax.masked(optimizer, mask)
    if cfg.finetuning_type == "freeze" and num_layers is not None:
        opt = optax.chain(opt, layerwise_freeze_transform(
            num_layers, cfg.freeze_trainable_layers))
    return opt


def make_lora_forward(forward_fn, base_params, cfg: TuningConfig):
    """forward(lora_params, batch) over frozen base params + LoRA deltas."""
    def forward(lora_params, batch, **kw):
        merged = merge_lora(base_params, lora_params, cfg)
        return forward_fn(merged, batch, **kw)

    return forward


# ---------------------------------------------------------------------------
# embedding resize
# ---------------------------------------------------------------------------


def resize_embeddings(params: Any, new_vocab: int, key,
                      pad_to_multiple_of: int = 64) -> "tuple[Any, int]":
    """Grow the vocab rows of embed (and an untied lm_head) to
    ``new_vocab`` with noisy-mean initialization; returns (params,
    padded_vocab).

    Counterpart of the reference's resize_embedding_layer
    (model_utils/embedding.py:38-70: resize_token_embeddings with
    pad_to_multiple_of=64 + _noisy_mean_initialization -- new rows =
    mean(old rows) + N(0, 1/sqrt(dim))).  The caller rebuilds the bundle
    with the returned vocab size.
    """
    text = params.get("text", params)
    old_vocab, dim = text["embed"]["weight"].shape
    if new_vocab <= old_vocab:
        return params, old_vocab
    padded = -(-new_vocab // pad_to_multiple_of) * pad_to_multiple_of
    n_new = padded - old_vocab
    k_embed, k_head = jax.random.split(key)

    def grow(weight, k, row_axis_first: bool):
        w32 = weight.astype(jnp.float32)
        if not row_axis_first:       # lm_head kernel is [dim, vocab]
            w32 = w32.T
        mean = w32.mean(axis=0, keepdims=True)
        noise = jax.random.normal(k, (n_new, w32.shape[1]),
                                  jnp.float32) / jnp.sqrt(float(dim))
        grown = jnp.concatenate([w32, mean + noise], axis=0)
        if not row_axis_first:
            grown = grown.T
        return grown.astype(weight.dtype)

    text = dict(text)
    text["embed"] = {"weight": grow(text["embed"]["weight"], k_embed, True)}
    if "lm_head" in text:
        text["lm_head"] = {
            "kernel": grow(text["lm_head"]["kernel"], k_head, False)
        }
    if "text" in params:
        out = dict(params)
        out["text"] = text
        return out, padded
    return text, padded


def pissa_convert(lora_trained: Any, lora_init: Any) -> Any:
    """Re-express a PiSSA-trained adapter against the ORIGINAL base.

    PiSSA trains (A', B') on the residual base W - s*A0@B0; serving stacks
    expect adapters over the original W.  Exactly:
    W_res + s*A'B' = W + s*([A', A0] @ [B'; -B0]), so the converted
    adapter is the rank-2r concatenation (reference
    train/callbacks.py PissaConvertCallback -> peft
    save_pretrained(path_initial_model_for_weight_conversion=...)).
    """

    def is_ab(x):
        return isinstance(x, dict) and "a" in x

    def convert(trained, init):
        if trained is None:
            return None
        return {
            "a": jnp.concatenate([trained["a"], init["a"]], axis=-1),
            "b": jnp.concatenate([trained["b"], -init["b"]], axis=-2),
        }

    return jax.tree.map(convert, lora_trained, lora_init, is_leaf=is_ab)
