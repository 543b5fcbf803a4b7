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
