"""PA-SFT: masked cross-entropy training step over packed batches.

The compute equivalent of the reference's CustomSeq2SeqTrainer step
(llamafactory/train/sft/trainer.py:46-135) including its grad-accum loss
normalization fix (loss averaged over *real label tokens* of the whole
batch, trainer.py:92-107): here the whole global batch lives in one jit step
so the normalization is exact by construction.

Batches are packed rows from iadr1_tpu.data.packing: input_ids, labels
(IGNORE_INDEX = -100 for masked positions), segment_ids, position_ids, and
optionally the vision arrays for VLM batches.
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp

from iadr1_tpu.data.tokenize import IGNORE_INDEX


def sft_loss(logits: jax.Array, labels: jax.Array) -> tuple[jax.Array, dict]:
    """Next-token masked CE; logits [B,T,V] (f32), labels [B,T].

    labels are already aligned (labels[t] is the target for logits[t-1]
    shifted inside); returns (scalar loss, metrics).
    """
    # shift: predict token t+1 from position t
    logits = logits[:, :-1]
    targets = labels[:, 1:]
    mask = targets != IGNORE_INDEX
    safe_targets = jnp.where(mask, targets, 0)

    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    token_logp = jnp.take_along_axis(logp, safe_targets[..., None], axis=-1)[..., 0]
    token_loss = -jnp.where(mask, token_logp, 0.0)

    n_tokens = jnp.maximum(mask.sum(), 1)
    loss = token_loss.sum() / n_tokens
    acc = (
        jnp.where(mask, jnp.argmax(logits, axis=-1) == targets, False).sum()
        / n_tokens
    )
    return loss, {"loss": loss, "accuracy": acc, "n_label_tokens": mask.sum()}


def chunked_sft_loss(
    hidden: jax.Array,        # [B, T, H] final hidden states
    head_kernel: jax.Array,   # [H, V]
    labels: jax.Array,        # [B, T]
    chunk_size: int = 512,
    logits_dtype=jnp.float32,
) -> tuple[jax.Array, dict]:
    """Masked CE without materializing the [B, T, V] logits tensor.

    The LM-head matmul + softmax-CE run chunk-by-chunk over the flattened
    token stream under lax.scan with rematerialization, so peak memory is
    one [chunk, V] block instead of the full logits (the reference relies on
    HF's fused CE; at vocab 151936 and seq 4096 the full tensor is 2.5 GB per
    row in f32, the main batch-size limiter).
    """
    B, T, H = hidden.shape
    V = head_kernel.shape[1]
    h = hidden[:, :-1].reshape(-1, H)
    t = labels[:, 1:].reshape(-1)
    mask = t != IGNORE_INDEX
    safe_t = jnp.where(mask, t, 0)

    N = h.shape[0]
    pad = (-N) % chunk_size
    h = jnp.pad(h, ((0, pad), (0, 0)))
    safe_t = jnp.pad(safe_t, (0, pad))
    mask_p = jnp.pad(mask, (0, pad))
    n_chunks = h.shape[0] // chunk_size

    h = h.reshape(n_chunks, chunk_size, H)
    safe_t = safe_t.reshape(n_chunks, chunk_size)
    mask_p = mask_p.reshape(n_chunks, chunk_size)
    # consistent sharding across the per-chunk checkpoint boundary
    # (core/mesh.constrain_scan_chunks)
    from iadr1_tpu.core.mesh import constrain_scan_chunks

    h = constrain_scan_chunks(h)

    @jax.checkpoint
    def chunk_fn(carry, xs):
        hc, tc, mc = xs
        logits = jnp.einsum(
            "ch,hv->cv", hc, head_kernel.astype(hc.dtype),
            preferred_element_type=logits_dtype,
        )
        lse = jax.scipy.special.logsumexp(logits, axis=-1)
        picked = jnp.take_along_axis(logits, tc[:, None], axis=-1)[:, 0]
        # per-token losses and their sum accumulate in f32 even when the
        # logits block is stored bf16
        token_loss = jnp.where(
            mc, lse.astype(jnp.float32) - picked.astype(jnp.float32), 0.0)
        correct = jnp.where(mc, jnp.argmax(logits, axis=-1) == tc, False)
        loss_sum, acc_sum = carry
        return (loss_sum + token_loss.sum(), acc_sum + correct.sum()), None

    (loss_sum, acc_sum), _ = jax.lax.scan(
        chunk_fn, (jnp.zeros((), jnp.float32), jnp.zeros((), jnp.int32)),
        (h, safe_t, mask_p),
    )
    n_tokens = jnp.maximum(mask.sum(), 1)
    loss = loss_sum / n_tokens
    return loss, {
        "loss": loss,
        "accuracy": acc_sum / n_tokens,
        "n_label_tokens": mask.sum(),
    }


def make_fused_chunked_ce(chunk_size: int, logits_dtype=jnp.float32):
    """Chunked masked CE that computes its own gradients in the forward pass.

    ``chunked_sft_loss`` wraps each chunk in ``jax.checkpoint``, so autodiff
    re-runs the LM-head matmul during the backward sweep -- a third
    head-sized matmul per token on top of the ideal three (fwd logits,
    d_hidden, d_kernel).  Because the loss is the *final* scalar of the train
    step, its upstream cotangent is a known scalar, so the exact gradients
    can be produced in the same scan that computes the loss:

        dlogits = (softmax(logits) - onehot(t)) * mask / n_tokens
        d_hidden += dlogits @ W^T        d_W += h^T @ dlogits

    and the backward rule only scales by the incoming cotangent.  Executed
    head FLOPs drop from 4x to the ideal 3x of ``2*tokens*H*V``, at the
    cost of carrying d_W ([H, V] f32) through the scan and materializing
    the dlogits blocks in the forward.  Measured on the v5e 0.5B leg this
    trades ~1.9pt MFU AGAINST the checkpointed-recompute loss (the scan
    carry serializes what XLA otherwise pipelines), so it is an option,
    not the default.

    Returns ``fused(hidden, head_kernel, labels) -> (loss, metrics)`` with
    the same semantics as ``chunked_sft_loss``.
    """

    def _impl(hidden, kernel, labels, want_grads: bool):
        B, T, H = hidden.shape
        V = kernel.shape[1]
        h = hidden[:, :-1].reshape(-1, H)
        t = labels[:, 1:].reshape(-1)
        mask = t != IGNORE_INDEX
        safe_t = jnp.where(mask, t, 0)

        N = h.shape[0]
        pad = (-N) % chunk_size
        hp = jnp.pad(h, ((0, pad), (0, 0)))
        tp = jnp.pad(safe_t, (0, pad))
        mp = jnp.pad(mask, (0, pad))
        C = hp.shape[0] // chunk_size
        hp = hp.reshape(C, chunk_size, H)
        tp = tp.reshape(C, chunk_size)
        mp = mp.reshape(C, chunk_size)
        kt = kernel.astype(hp.dtype)
        n_tokens = jnp.maximum(mask.sum(), 1)
        inv_n = 1.0 / n_tokens.astype(jnp.float32)

        def chunk_fn(carry, xs):
            hc, tc, mc = xs
            logits = jnp.einsum(
                "ch,hv->cv", hc, kt, preferred_element_type=logits_dtype,
            )
            lse = jax.scipy.special.logsumexp(logits, axis=-1)
            picked = jnp.take_along_axis(logits, tc[:, None], axis=-1)[:, 0]
            token_loss = jnp.where(mc, lse - picked, 0.0)
            correct = jnp.where(mc, jnp.argmax(logits, axis=-1) == tc, False)
            loss_sum, acc_sum, dk = carry
            if not want_grads:
                return (loss_sum + token_loss.sum(),
                        acc_sum + correct.sum(), dk), None
            mcf = mc.astype(jnp.float32) * inv_n
            dlog = jnp.exp(logits.astype(jnp.float32)
                           - lse.astype(jnp.float32)[:, None]) * mcf[:, None]
            dlog = dlog.at[jnp.arange(hc.shape[0]), tc].add(-mcf)
            # the [chunk, V] dlogits block is consumed at the compute dtype:
            # f32 operands would force f32-rate MXU matmuls and double the
            # HBM traffic of the block (measured -2pt MFU on the 0.5B leg);
            # accumulation stays f32 via preferred_element_type
            dlog = dlog.astype(hc.dtype)
            dh_c = jnp.einsum(
                "cv,hv->ch", dlog, kt, preferred_element_type=jnp.float32,
            ).astype(hidden.dtype)
            dk = dk + jnp.einsum(
                "ch,cv->hv", hc, dlog, preferred_element_type=jnp.float32,
            )
            return (loss_sum + token_loss.sum(),
                    acc_sum + correct.sum(), dk), dh_c

        dk0 = (jnp.zeros((H, V), jnp.float32) if want_grads
               else jnp.zeros((), jnp.float32))
        (loss_sum, acc_sum, dk), dh = jax.lax.scan(
            chunk_fn,
            (jnp.zeros((), jnp.float32), jnp.zeros((), jnp.int32), dk0),
            (hp, tp, mp),
        )
        loss = loss_sum / n_tokens
        metrics = {"loss": loss, "accuracy": acc_sum / n_tokens,
                   "n_label_tokens": mask.sum()}
        if not want_grads:
            return loss, metrics, None, None
        dh = dh.reshape(-1, H)[:N].reshape(B, T - 1, H)
        dh = jnp.pad(dh, ((0, 0), (0, 1), (0, 0)))
        return loss, metrics, dh, dk.astype(kernel.dtype)

    @jax.custom_vjp
    def fused(hidden, kernel, labels):
        loss, metrics, _, _ = _impl(hidden, kernel, labels, want_grads=False)
        return loss, metrics

    def fused_fwd(hidden, kernel, labels):
        loss, metrics, dh, dk = _impl(hidden, kernel, labels, want_grads=True)
        return (loss, metrics), (dh, dk, labels.shape)

    def fused_bwd(res, ct):
        import numpy as np

        dh, dk, labels_shape = res
        # the loss scalar is returned twice (loss, metrics["loss"]); both
        # cotangents scale the precomputed grads (accuracy/n_label_tokens
        # are integer outputs -- no cotangent)
        g = ct[0] + ct[1]["loss"]
        g32 = g.astype(jnp.float32)
        return ((dh.astype(jnp.float32) * g32).astype(dh.dtype),
                (dk.astype(jnp.float32) * g32).astype(dk.dtype),
                np.zeros(labels_shape, dtype=jax.dtypes.float0))

    fused.defvjp(fused_fwd, fused_bwd)
    return fused


def make_chunked_sft_step(
    hidden_fn: Callable[[Any, dict], jax.Array],
    head_kernel_fn: Callable[[Any], jax.Array],
    optimizer,
    schedule=None,
    donate: bool = True,
    chunk_size: int = 512,
    aux_loss_coef: float = 0.0,
    fused_ce: bool = False,
    logits_dtype=jnp.float32,
):
    """SFT step with the memory-efficient chunked CE loss.

    ``aux_loss_coef`` > 0 expects ``hidden_fn`` to return (hidden, aux) --
    MoE router load-balancing loss (reference model_utils/moe.py
    output_router_logits + router_aux_loss_coef).

    ``fused_ce`` switches the loss to ``make_fused_chunked_ce`` (gradients
    computed in the forward scan; same math, one fewer head matmul --
    measured SLOWER than the checkpointed recompute on the v5e 0.5B leg,
    kept as an option).  ``logits_dtype`` sets the stored dtype of each
    [chunk, V] logits block (bf16 halves its HBM materialization
    traffic; reductions still accumulate in f32)."""

    ce = (make_fused_chunked_ce(chunk_size, logits_dtype=logits_dtype)
          if fused_ce else None)

    def step(state, batch):
        def loss_fn(params):
            out = hidden_fn(params, batch)
            if aux_loss_coef:
                hidden, aux = out
            else:
                hidden, aux = out, 0.0
            if ce is not None:
                loss, metrics = ce(
                    hidden, head_kernel_fn(params), batch["labels"]
                )
            else:
                loss, metrics = chunked_sft_loss(
                    hidden, head_kernel_fn(params), batch["labels"],
                    chunk_size, logits_dtype=logits_dtype,
                )
            if aux_loss_coef:
                loss = loss + aux_loss_coef * aux
                metrics = {**metrics, "aux_loss": aux, "loss": loss}
            return loss, metrics

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        new_state = state.apply_gradients(grads, optimizer)
        metrics["grad_norm"] = optax_global_norm(grads)
        if schedule is not None:
            metrics["learning_rate"] = schedule(state.step)
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_sft_step(
    forward_fn: Callable[[Any, dict], jax.Array],
    optimizer,
    schedule=None,
    donate: bool = True,
):
    """Build the jitted SFT train step.

    ``forward_fn(params, batch) -> logits`` is the model adapter (text or
    VLM); the step computes masked CE, global-norm-clipped AdamW update, and
    returns (new_state, metrics).
    """

    def step(state, batch):
        def loss_fn(params):
            logits = forward_fn(params, batch)
            return sft_loss(logits, batch["labels"])

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        new_state = state.apply_gradients(grads, optimizer)
        metrics["grad_norm"] = optax_global_norm(grads)
        if schedule is not None:
            metrics["learning_rate"] = schedule(state.step)
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def optax_global_norm(tree) -> jax.Array:
    leaves = jax.tree.leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(x.astype(jnp.float32))) for x in leaves))


class IterativeSFTTrainer:
    """Step-at-a-time SFT on caller-provided samples.

    Counterpart of the reference's vendored trl IterativeSFTTrainer
    (trl/trl/trainer/iterative_sft_trainer.py): the caller drives the
    loop -- generate / filter / edit samples however it likes between
    optimization steps -- and hands either token ids or raw texts to
    ``step``.  Prompt-masking is the caller's job (pass ``labels``),
    matching trl's input contract.
    """

    def __init__(self, bundle, tokenizer, optimizer, schedule=None,
                 state=None, max_length: int = 512, ce_chunk: int = 1024):
        import jax

        from iadr1_tpu.train.state import create_train_state

        self.bundle = bundle
        self.tokenizer = tokenizer
        self.max_length = max_length
        if state is None:
            params = bundle.init_params(jax.random.PRNGKey(0))
            state = create_train_state(params, optimizer)
        self.state = state
        self.update = make_chunked_sft_step(
            bundle.hidden_fn, bundle.head_kernel_fn, optimizer, schedule,
            chunk_size=ce_chunk,
        )
        self.metrics_history: list[dict] = []

    def step(self, input_ids=None, labels=None, texts=None) -> dict:
        """One optimization step on a list of samples.

        Either ``texts`` (list[str]; tokenized here, all tokens labeled)
        or ``input_ids`` (list[list[int]], with optional per-token
        ``labels`` defaulting to the inputs) -- trl's dual interface.
        """
        import numpy as np

        import jax.numpy as jnp

        from iadr1_tpu.data.tokenize import IGNORE_INDEX

        if texts is not None:
            input_ids = [
                self.tokenizer.encode(t, add_special_tokens=False)[
                    : self.max_length
                ]
                for t in texts
            ]
        if input_ids is None:
            raise ValueError("provide texts or input_ids")
        if labels is None:
            labels = input_ids
        pad = self.tokenizer.pad_token_id or 0
        B = len(input_ids)
        T = min(self.max_length, max(len(x) for x in input_ids))
        ids = np.full((B, T), pad, np.int64)
        lab = np.full((B, T), IGNORE_INDEX, np.int64)
        segs = np.zeros((B, T), np.int32)
        for i, (x, y) in enumerate(zip(input_ids, labels)):
            x, y = list(x)[:T], list(y)[:T]
            ids[i, : len(x)] = x
            lab[i, : len(y)] = y
            segs[i, : len(x)] = 1
        batch = {
            "input_ids": jnp.asarray(ids, jnp.int32),
            "labels": jnp.asarray(lab, jnp.int32),
            "segment_ids": jnp.asarray(segs),
            "position_ids": jnp.asarray(
                np.broadcast_to(np.arange(T), (B, T)).copy(), jnp.int32),
        }
        self.state, metrics = self.update(self.state, batch)
        out = {k: float(v) for k, v in metrics.items()}
        self.metrics_history.append(out)
        return out
