"""Preference-learning stages: DPO (+ hinge/IPO/ORPO/SimPO), KTO, and
pairwise reward-model training.

Behavior matches the reference's vendored LLaMA-Factory trainers:

* DPO: CustomDPOTrainer (train/dpo/trainer.py) -- chosen/rejected run as
  one concatenated batch, sequence logps are sums (means for IPO/ORPO/
  SimPO), preference losses follow trl's dpo_loss (sigmoid with label
  smoothing, hinge, ipo) plus the reference's odds_ratio_loss
  (:137-147) and simpo_loss (:149-157); optional sft mixing via ftx.
* KTO: train/kto/trainer.py -- per-example desirable/undesirable tags,
  KL baseline from mismatched prompt/completion pairs.
* RM: PairwiseTrainer (train/rm/trainer.py:90-115) -- scalar value head,
  score at the last non-pad token, -logsigmoid(chosen - rejected).

All logp scoring is chunked over the LM head (no [B,T,V] logits), the
same memory discipline as SFT/GRPO.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp

from iadr1_tpu.data.tokenize import IGNORE_INDEX
from iadr1_tpu.train.grpo import chunked_token_logps


def sequence_logps(hidden, head_kernel, labels, chunk_size: int = 1024):
    """(sum_logps [B], valid_len [B]) of labeled tokens.

    hidden [B,T,H]; labels [B,T] with IGNORE_INDEX on prompt/pad positions;
    next-token alignment (labels[t] is predicted from hidden[t-1]).
    """
    pred = hidden[:, :-1]
    targets = labels[:, 1:]
    mask = targets != IGNORE_INDEX
    safe = jnp.where(mask, targets, 0)
    token_logps = chunked_token_logps(pred, head_kernel, safe, chunk_size)
    seq = jnp.where(mask, token_logps, 0.0).sum(axis=1)
    return seq, jnp.maximum(mask.sum(axis=1), 1)


@dataclasses.dataclass(frozen=True)
class DPOConfig:
    beta: float = 0.1                 # pref_beta (finetuning_args default)
    # sigmoid | hinge | ipo | orpo | simpo | cpo
    # cpo = reference-free sigmoid + ftx*NLL on chosen (trl
    # cpo_trainer.py:638-676, cpo_alpha -> ftx; default alpha 1.0)
    loss_type: str = "sigmoid"
    label_smoothing: float = 0.0      # dpo_label_smoothing
    simpo_gamma: float = 0.5          # reference finetuning_args default
    ftx: float = 0.0                  # sft-loss mixing weight (pref_ftx)
    logp_chunk_size: int = 1024

    @property
    def average_logps(self) -> bool:
        # IPO/ORPO/SimPO use length-averaged logps (trainer.py:200-204)
        return self.loss_type in ("ipo", "orpo", "simpo")

    @property
    def use_ref_model(self) -> bool:
        return self.loss_type in ("sigmoid", "hinge", "ipo")


def preference_loss(cfg: DPOConfig, pol_c, pol_r, ref_c=None, ref_r=None):
    """Per-pair preference losses (reference compute_preference_loss +
    trl dpo_loss variants)."""
    if cfg.loss_type == "orpo":
        log_odds = (pol_c - pol_r) - (
            jnp.log1p(-jnp.exp(pol_c)) - jnp.log1p(-jnp.exp(pol_r))
        )
        return -pol_c + cfg.beta * (-jax.nn.log_sigmoid(log_odds))
    if cfg.loss_type == "simpo":
        logits = (pol_c - pol_r) - cfg.simpo_gamma / cfg.beta
        return -jax.nn.log_sigmoid(cfg.beta * logits)
    if cfg.loss_type == "cpo":
        logits = pol_c - pol_r   # reference-free (beta -> 0 limit)
        return (
            -jax.nn.log_sigmoid(cfg.beta * logits) * (1 - cfg.label_smoothing)
            - jax.nn.log_sigmoid(-cfg.beta * logits) * cfg.label_smoothing
        )

    logits = (pol_c - pol_r) - (ref_c - ref_r)
    if cfg.loss_type == "sigmoid":
        return (
            -jax.nn.log_sigmoid(cfg.beta * logits) * (1 - cfg.label_smoothing)
            - jax.nn.log_sigmoid(-cfg.beta * logits) * cfg.label_smoothing
        )
    if cfg.loss_type == "hinge":
        return jax.nn.relu(1.0 - cfg.beta * logits)
    if cfg.loss_type == "ipo":
        return (logits - 1.0 / (2.0 * cfg.beta)) ** 2
    raise ValueError(f"unknown DPO loss type {cfg.loss_type!r}")


def make_dpo_step(score_fn, optimizer, cfg: DPOConfig, schedule=None):
    """(state, ref_params, batch) -> (new_state, metrics).

    batch: input_ids/labels/segment_ids/position_ids all [2B, T] with the
    first B rows chosen and the last B rejected (reference
    concatenated_forward, trainer.py:186-214).  score_fn as in
    train.grpo (params, batch, aux) -> (hidden, head_kernel).
    """

    def seq_logps(params, batch, aux):
        hidden, kernel = score_fn(params, batch, aux)
        seq, n = sequence_logps(
            hidden, kernel, batch["labels"], cfg.logp_chunk_size
        )
        return (seq / n if cfg.average_logps else seq), seq, n

    def step(state, ref_params, batch):
        B2 = batch["input_ids"].shape[0]
        B = B2 // 2

        def loss_fn(params):
            logps, seq_sum, n = seq_logps(params, batch, ref_params)
            pol_c, pol_r = logps[:B], logps[B:]
            if cfg.use_ref_model:
                ref_logps, _, _ = seq_logps(ref_params, batch, ref_params)
                ref_logps = jax.lax.stop_gradient(ref_logps)
                ref_c, ref_r = ref_logps[:B], ref_logps[B:]
            else:
                ref_c = ref_r = None
            losses = preference_loss(cfg, pol_c, pol_r, ref_c, ref_r)
            if cfg.ftx > 1e-6:
                # mix the chosen-side SFT loss (trainer.py get_batch_loss_metrics)
                sft = -(seq_sum[:B] / n[:B])
                losses = losses + cfg.ftx * sft
            loss = losses.mean()
            chosen_rewards = cfg.beta * (
                pol_c - (ref_c if ref_c is not None else 0.0)
            )
            rejected_rewards = cfg.beta * (
                pol_r - (ref_r if ref_r is not None else 0.0)
            )
            metrics = {
                "loss": loss,
                "rewards/chosen": chosen_rewards.mean(),
                "rewards/rejected": rejected_rewards.mean(),
                "rewards/accuracies": (
                    chosen_rewards > rejected_rewards
                ).astype(jnp.float32).mean(),
                "rewards/margins": (chosen_rewards - rejected_rewards).mean(),
            }
            return loss, metrics

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        new_state = state.apply_gradients(grads, optimizer)
        if schedule is not None:
            metrics["learning_rate"] = schedule(state.step)
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,))


# ---------------------------------------------------------------------------
# KTO
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class KTOConfig:
    beta: float = 0.1
    desirable_weight: float = 1.0
    undesirable_weight: float = 1.0
    logp_chunk_size: int = 1024


def make_kto_step(score_fn, optimizer, cfg: KTOConfig, schedule=None):
    """(state, ref_params, batch) -> (new_state, metrics).

    batch: target sequences (input_ids/labels/...), mismatched KL
    sequences (kl_input_ids/kl_labels/...), and ``tags`` [B] (1 =
    desirable).  The KL baseline is the batch-mean policy/ref logp gap on
    the mismatched pairs (reference train/kto/trainer.py; trl KTOTrainer).
    """

    def seq_logps(params, batch, prefix, aux):
        sub = {
            "input_ids": batch[f"{prefix}input_ids"],
            "labels": batch[f"{prefix}labels"],
            "segment_ids": batch.get(f"{prefix}segment_ids"),
            "position_ids": batch[f"{prefix}position_ids"],
        }
        hidden, kernel = score_fn(params, sub, aux)
        seq, _ = sequence_logps(
            hidden, kernel, sub["labels"], cfg.logp_chunk_size
        )
        return seq

    def step(state, ref_params, batch):
        tags = batch["tags"].astype(jnp.float32)

        def loss_fn(params):
            pol = seq_logps(params, batch, "", ref_params)
            pol_kl = seq_logps(params, batch, "kl_", ref_params)
            ref = jax.lax.stop_gradient(
                seq_logps(ref_params, batch, "", ref_params))
            ref_kl = jax.lax.stop_gradient(
                seq_logps(ref_params, batch, "kl_", ref_params))

            kl = jnp.clip((pol_kl - ref_kl).mean(), 0.0, None)
            kl = jax.lax.stop_gradient(kl)
            ratio = pol - ref
            chosen_losses = 1.0 - jax.nn.sigmoid(cfg.beta * (ratio - kl))
            rejected_losses = 1.0 - jax.nn.sigmoid(cfg.beta * (kl - ratio))
            losses = (
                cfg.desirable_weight * tags * chosen_losses
                + cfg.undesirable_weight * (1.0 - tags) * rejected_losses
            )
            loss = losses.mean()
            rewards = cfg.beta * ratio
            n_des = jnp.maximum(tags.sum(), 1.0)
            n_und = jnp.maximum((1 - tags).sum(), 1.0)
            return loss, {
                "loss": loss, "kl": kl,
                "rewards/chosen": (rewards * tags).sum() / n_des,
                "rewards/rejected": (rewards * (1 - tags)).sum() / n_und,
            }

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        new_state = state.apply_gradients(grads, optimizer)
        if schedule is not None:
            metrics["learning_rate"] = schedule(state.step)
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,))


# ---------------------------------------------------------------------------
# BCO (binary classifier optimization)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class BCOConfig:
    beta: float = 0.1
    logp_chunk_size: int = 1024


class RunningMoments:
    """Host-side running mean of implicit rewards (the BCO reward-shift
    delta; trl trainer/utils.py RunningMoments, bco_trainer.py:1142-1143).
    Welford over batch aggregates so resume keeps the stream exact."""

    def __init__(self):
        self.mean = 0.0
        self.var = 1.0
        self.count = 1e-24

    def update(self, batch_mean: float, batch_var: float, batch_count: float):
        delta = batch_mean - self.mean
        tot = self.count + batch_count
        new_sum = batch_var * batch_count
        old_sum = self.var * self.count + delta**2 * self.count * batch_count / tot
        self.mean += delta * batch_count / tot
        self.var = (old_sum + new_sum) / tot
        self.count = tot
        return self.mean

    def state_dict(self) -> dict:
        return {"mean": self.mean, "var": self.var, "count": self.count}

    def load_state_dict(self, d: dict):
        self.mean, self.var, self.count = d["mean"], d["var"], d["count"]


def make_bco_step(score_fn, optimizer, cfg: BCOConfig, schedule=None):
    """(state, ref_params, batch, delta) -> (new_state, metrics).

    batch: target sequences (input_ids/labels/segment_ids/position_ids)
    + ``tags`` [B] (1 = desirable); ``delta`` is the running mean of
    implicit rewards maintained on host via RunningMoments (metrics carry
    reward_mean/reward_var/reward_count for the update).  Loss per
    trl bco_trainer.py:1108-1156: -logsigmoid(+-(beta*(pol-ref) - delta)).
    """

    def seq_logps(params, batch, aux):
        hidden, kernel = score_fn(params, batch, aux)
        seq, _ = sequence_logps(
            hidden, kernel, batch["labels"], cfg.logp_chunk_size
        )
        return seq

    def step(state, ref_params, batch, delta):
        tags = batch["tags"].astype(jnp.float32)

        def loss_fn(params):
            pol = seq_logps(params, batch, ref_params)
            ref = jax.lax.stop_gradient(
                seq_logps(ref_params, batch, ref_params))
            rewards = cfg.beta * (pol - ref)
            chosen_losses = -jax.nn.log_sigmoid(rewards - delta)
            rejected_losses = -jax.nn.log_sigmoid(-(rewards - delta))
            losses = tags * chosen_losses + (1.0 - tags) * rejected_losses
            loss = losses.mean()
            n_des = jnp.maximum(tags.sum(), 1.0)
            n_und = jnp.maximum((1 - tags).sum(), 1.0)
            r_detached = jax.lax.stop_gradient(rewards)
            return loss, {
                "loss": loss, "delta": delta,
                "rewards/chosen": (r_detached * tags).sum() / n_des,
                "rewards/rejected": (r_detached * (1 - tags)).sum() / n_und,
                "reward_mean": r_detached.mean(),
                "reward_var": r_detached.var(),
                "reward_count": jnp.asarray(
                    r_detached.shape[0], jnp.float32),
            }

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        new_state = state.apply_gradients(grads, optimizer)
        if schedule is not None:
            metrics["learning_rate"] = schedule(state.step)
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,))


# ---------------------------------------------------------------------------
# PRM (process reward model)
# ---------------------------------------------------------------------------


def encode_prm_example(prompt_ids: list[int], completions_ids: list[list[int]],
                       step_labels: list[bool], separator_ids: list[int],
                       train_on_last_step_only: bool = False):
    """(input_ids, labels): per-step binary labels at each step's final
    (separator) token, IGNORE_INDEX elsewhere (trl prm_trainer.py
    tokenize_row:241-271)."""
    labels = [int(x) for x in step_labels]
    if train_on_last_step_only:
        labels = [IGNORE_INDEX] * (len(labels) - 1) + [labels[-1]]
    ids = list(prompt_ids)
    lab = [IGNORE_INDEX] * len(prompt_ids)
    for completion, label in zip(completions_ids, labels):
        step = list(completion) + list(separator_ids)
        ids += step
        lab += [IGNORE_INDEX] * (len(step) - 1) + [label]
    return ids, lab


def init_prm_head(key, hidden_size: int, num_labels: int = 2,
                  dtype=jnp.float32) -> dict:
    return {
        "kernel": jax.random.normal(key, (hidden_size, num_labels), dtype)
        * 0.01,
        "bias": jnp.zeros((num_labels,), dtype),
    }


def make_prm_step(hidden_fn, optimizer, schedule=None):
    """(state, batch) -> (new_state, metrics): token classification over
    step-separator positions (trl PRMTrainer = AutoModelForTokenClassifi-
    cation + CE on labeled positions).  state.params = {"model": ...,
    "prm_head": init_prm_head(...)}; batch labels [B, T] hold 0/1 at each
    step's last token and IGNORE_INDEX elsewhere."""

    def step(state, batch):
        labels = batch["labels"]
        mask = labels != IGNORE_INDEX
        safe = jnp.where(mask, labels, 0)

        def loss_fn(params):
            hidden = hidden_fn(params["model"], batch)
            logits = (
                hidden.astype(jnp.float32) @ params["prm_head"]["kernel"]
                + params["prm_head"]["bias"]
            )                                             # [B, T, n_labels]
            logp = jax.nn.log_softmax(logits, axis=-1)
            tok = jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
            n = jnp.maximum(mask.sum(), 1)
            loss = -(jnp.where(mask, tok, 0.0).sum() / n)
            acc = (
                jnp.where(mask, logits.argmax(-1) == safe, False).sum() / n
            )
            return loss, {"loss": loss, "accuracy": acc,
                          "n_label_tokens": n}

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        new_state = state.apply_gradients(grads, optimizer)
        if schedule is not None:
            metrics["learning_rate"] = schedule(state.step)
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,))


# ---------------------------------------------------------------------------
# pairwise reward model
# ---------------------------------------------------------------------------


def init_value_head(key, hidden_size: int, dtype=jnp.float32) -> dict:
    """Scalar value head (the trl AutoModelForCausalLMWithValueHead
    analogue used by the reference RM stage)."""
    return {
        "kernel": jax.random.normal(key, (hidden_size, 1), dtype) * 0.01,
        "bias": jnp.zeros((1,), dtype),
    }


def make_rm_step(hidden_fn, optimizer, schedule=None):
    """(state, batch) -> (new_state, metrics).

    state.params = {"model": <bundle params>, "value_head": {...}}.
    batch rows: chosen first half, rejected second half; the score is the
    value at each row's last non-pad token and the loss is
    -logsigmoid(chosen - rejected) (rm/trainer.py:101-109).
    """

    def step(state, batch):
        B2 = batch["input_ids"].shape[0]
        B = B2 // 2

        def loss_fn(params):
            hidden = hidden_fn(params["model"], batch)
            vh = params["value_head"]
            values = (
                jnp.einsum("bth,ho->bto", hidden.astype(jnp.float32),
                           vh["kernel"].astype(jnp.float32))[..., 0]
                + vh["bias"][0]
            )
            mask = batch["segment_ids"] != 0
            last = jnp.maximum(mask.sum(axis=1) - 1, 0)
            scores = jnp.take_along_axis(values, last[:, None], axis=1)[:, 0]
            chosen, rejected = scores[:B], scores[B:]
            loss = -jax.nn.log_sigmoid(chosen - rejected).mean()
            acc = (chosen > rejected).astype(jnp.float32).mean()
            return loss, {"loss": loss, "accuracy": acc,
                          "chosen_score": chosen.mean(),
                          "rejected_score": rejected.mean()}

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        new_state = state.apply_gradients(grads, optimizer)
        if schedule is not None:
            metrics["learning_rate"] = schedule(state.step)
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,))
