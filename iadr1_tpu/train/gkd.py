"""GKD: generalized knowledge distillation (on-policy JSD to a teacher).

TPU counterpart of the reference's vendored trl GKDTrainer
(trl/trl/trainer/gkd_trainer.py): the student minimizes the generalized
Jensen-Shannon divergence to a frozen teacher on completion tokens; with
probability ``lmbda`` the completions are sampled on-policy from the
student (gkd_trainer.py:285-302), else taken from the dataset.

TPU design: the JSD never materializes two [B, T, V] logits tensors --
like the chunked CE loss (train/sft.py), student and teacher logits are
computed per token-chunk inside a lax.scan under jax.checkpoint, so peak
memory is two [chunk, V] blocks.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp

from iadr1_tpu.data.tokenize import IGNORE_INDEX
from iadr1_tpu.train.rollout import RolloutEngine, SamplingConfig


@dataclasses.dataclass(frozen=True)
class GKDConfig:
    beta: float = 0.5          # JSD interpolant (gkd_config.py default)
    temperature: float = 0.9
    lmbda: float = 0.5         # on-policy data fraction
    max_prompt_length: int = 512
    max_completion_length: int = 128
    logit_chunk_size: int = 512


def _token_jsd(s_logits, t_logits, beta: float):
    """Per-token generalized JSD over [n, V] logits (natural units);
    matches trl generalized_jsd_loss (gkd_trainer.py:210-253)."""
    s_logp = jax.nn.log_softmax(s_logits, axis=-1)
    t_logp = jax.nn.log_softmax(t_logits, axis=-1)
    if beta == 0.0:
        # KL(teacher || student) in trl's F.kl_div(student, teacher) sense
        return jnp.sum(jnp.exp(t_logp) * (t_logp - s_logp), axis=-1)
    if beta == 1.0:
        return jnp.sum(jnp.exp(s_logp) * (s_logp - t_logp), axis=-1)
    m_logp = jnp.logaddexp(s_logp + np.log1p(-beta), t_logp + np.log(beta))
    kl_t = jnp.sum(jnp.exp(t_logp) * (t_logp - m_logp), axis=-1)
    kl_s = jnp.sum(jnp.exp(s_logp) * (s_logp - m_logp), axis=-1)
    return beta * kl_t + (1.0 - beta) * kl_s


def chunked_jsd_loss(student_hidden, teacher_hidden, student_kernel,
                     teacher_kernel, labels, *, beta: float,
                     temperature: float, chunk_size: int):
    """Masked-mean JSD between student and teacher next-token
    distributions without materializing [B, T, V] logits.

    hidden [B, T, H]; labels [B, T] with IGNORE_INDEX outside completion
    tokens (next-token alignment like sft.py chunked_sft_loss).
    """
    s_pred = student_hidden[:, :-1]
    t_pred = teacher_hidden[:, :-1]
    mask = (labels[:, 1:] != IGNORE_INDEX)

    B, Tm1, H = s_pred.shape
    n = B * Tm1
    pad = (-n) % chunk_size
    total = n + pad

    def flat(x, fill=0):
        x = x.reshape(n, *x.shape[2:])
        if pad:
            width = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
            x = jnp.pad(x, width, constant_values=fill)
        return x.reshape(total // chunk_size, chunk_size, *x.shape[1:])

    s_chunks = flat(s_pred)
    t_chunks = flat(t_pred)
    m_chunks = flat(mask.astype(jnp.float32))

    def chunk_fn(carry, xs):
        s, t, m = xs
        s_logits = (s @ student_kernel).astype(jnp.float32) / temperature
        t_logits = (t @ teacher_kernel).astype(jnp.float32) / temperature
        jsd = _token_jsd(s_logits, t_logits, beta)
        return (carry[0] + jnp.sum(jsd * m), carry[1] + jnp.sum(m)), None

    (tot, cnt), _ = jax.lax.scan(
        jax.checkpoint(chunk_fn), (jnp.zeros(()), jnp.zeros(())),
        (s_chunks, t_chunks, m_chunks),
    )
    return tot / jnp.maximum(cnt, 1.0), cnt


def make_gkd_step(score_fn, teacher_score_fn, optimizer, cfg: GKDConfig,
                  schedule=None):
    """(state, teacher_params, batch) -> (new_state, metrics).

    ``score_fn(params, batch, aux) -> (hidden, head_kernel)`` as in
    train.grpo.bundle_score_fn; the teacher shares the batch layout and
    vocab.  batch: input_ids/labels/segment_ids/position_ids.
    """

    def step(state, teacher_params, batch):
        def loss_fn(params):
            s_hidden, s_kernel = score_fn(params, batch, teacher_params)
            t_hidden, t_kernel = teacher_score_fn(
                teacher_params, batch, None)
            t_hidden = jax.lax.stop_gradient(t_hidden)
            t_kernel = jax.lax.stop_gradient(t_kernel)
            loss, n = chunked_jsd_loss(
                s_hidden, t_hidden, s_kernel, t_kernel, batch["labels"],
                beta=cfg.beta, temperature=cfg.temperature,
                chunk_size=cfg.logit_chunk_size,
            )
            return loss, {"loss": loss, "n_label_tokens": n}

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        new_state = state.apply_gradients(grads, optimizer)
        if schedule is not None:
            metrics["learning_rate"] = schedule(state.step)
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,))


class GKDTrainer:
    """Host loop: per step, with probability ``lmbda`` sample completions
    from the student (on-policy) else use the dataset completion, then run
    the chunked-JSD update against the frozen teacher."""

    def __init__(self, bundle, teacher_bundle, tokenizer, optimizer,
                 cfg: GKDConfig, state, teacher_params, schedule=None,
                 sampling_overrides: dict | None = None, seed: int = 0):
        from iadr1_tpu.train.grpo import bundle_score_fn

        self.bundle = bundle
        self.tokenizer = tokenizer
        self.cfg = cfg
        self.state = state
        self.teacher_params = teacher_params
        sampling_kw = dict(
            max_new_tokens=cfg.max_completion_length,
            temperature=cfg.temperature, top_p=1.0, top_k=0,
            eos_token_id=tokenizer.eos_token_id,
            pad_token_id=tokenizer.pad_token_id or tokenizer.eos_token_id,
        )
        sampling_kw.update(sampling_overrides or {})
        self.engine = RolloutEngine(
            bundle, SamplingConfig(**sampling_kw),
            max_len=cfg.max_prompt_length + cfg.max_completion_length,
        )
        self.update_step = make_gkd_step(
            bundle_score_fn(bundle), bundle_score_fn(teacher_bundle),
            optimizer, cfg, schedule,
        )
        self._rng = jax.random.PRNGKey(seed)
        self._host_rng = np.random.default_rng(seed)
        self.metrics_history: list[dict] = []

    def _collate_prompts(self, examples):
        P = self.cfg.max_prompt_length
        pad = self.tokenizer.pad_token_id or self.tokenizer.eos_token_id
        B = len(examples)
        input_ids = np.full((B, P), pad, np.int32)
        mask = np.zeros((B, P), np.int32)
        for i, ex in enumerate(examples):
            ids = ex["prompt_ids"][-P:]
            input_ids[i, P - len(ids):] = ids
            mask[i, P - len(ids):] = 1
        return input_ids, mask

    def step(self, examples: Sequence[dict]) -> dict:
        """examples: [{"prompt_ids": [...], "completion_ids": [...]}]."""
        cfg = self.cfg
        prompt_ids, prompt_mask = self._collate_prompts(examples)
        on_policy = float(self._host_rng.random()) <= cfg.lmbda
        if on_policy:
            self._rng, sub = jax.random.split(self._rng)
            rollout_batch = {"input_ids": jnp.asarray(prompt_ids),
                             "attention_mask": jnp.asarray(prompt_mask)}
            tcfg = getattr(self.bundle.cfg, "text", self.bundle.cfg)
            if getattr(tcfg, "mrope_section", None) is not None:
                # text-only prompts on an M-RoPE model (train/grpo.py note)
                B, P = prompt_ids.shape
                pos = np.clip(np.cumsum(prompt_mask, axis=1) - 1, 0, None)
                rollout_batch["position_ids"] = jnp.asarray(
                    np.broadcast_to(pos, (3, B, P)).copy(), jnp.int32)
                rollout_batch["mrope_deltas"] = jnp.asarray(
                    pos[:, -1] + 1 - P, jnp.int32)
            rollout = self.engine.generate(self.state.params, rollout_batch,
                                           sub)
            comp_ids = np.asarray(rollout["completion_ids"])
            comp_mask = np.asarray(rollout["completion_mask"])
        else:
            N = cfg.max_completion_length
            pad = self.tokenizer.pad_token_id or 0
            comp_ids = np.full((len(examples), N), pad, np.int32)
            comp_mask = np.zeros((len(examples), N), np.int32)
            for i, ex in enumerate(examples):
                ids = list(ex["completion_ids"])[:N]
                comp_ids[i, : len(ids)] = ids
                comp_mask[i, : len(ids)] = 1

        full_ids = np.concatenate([prompt_ids, comp_ids], axis=1)
        full_mask = np.concatenate([prompt_mask, comp_mask], axis=1)
        labels = np.where(
            np.concatenate(
                [np.zeros_like(prompt_mask), comp_mask], axis=1
            ).astype(bool),
            full_ids, IGNORE_INDEX,
        )
        positions = np.clip(np.cumsum(full_mask, axis=1) - 1, 0, None)
        tcfg = getattr(self.bundle.cfg, "text", self.bundle.cfg)
        if getattr(tcfg, "mrope_section", None) is not None:
            positions = np.broadcast_to(
                positions, (3,) + positions.shape).copy()
        batch = {
            "input_ids": jnp.asarray(full_ids, jnp.int32),
            "labels": jnp.asarray(labels, jnp.int32),
            "segment_ids": jnp.asarray(full_mask, jnp.int32),
            "position_ids": jnp.asarray(positions, jnp.int32),
        }
        self.state, metrics = self.update_step(
            self.state, self.teacher_params, batch
        )
        out = {k: float(v) for k, v in metrics.items()}
        out["on_policy"] = float(on_policy)
        self.metrics_history.append(out)
        return out
