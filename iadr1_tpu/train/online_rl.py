"""On-policy trainers beyond SC-GRPO: RLOO and Online DPO.

TPU counterparts of the reference's vendored trl trainers
(trl/trl/trainer/rloo_trainer.py, online_dpo_trainer.py) that the recipe
never calls but the framework surface includes.  Both reuse the SC-GRPO
infrastructure: the in-program RolloutEngine (no vLLM sidecar, no weight
sync), host-side structured rewards, and chunked sequence logps.

* RLOO (rloo_trainer.py:431-439): the group baseline is leave-one-out --
  adv_i = r_i - mean(r_j, j != i) -- with optional whitening, instead of
  GRPO's (r - mean)/std.  KL control runs through the update step's k3
  penalty (GRPOConfig.beta) rather than trl's in-reward kl_coef: same
  gradient pressure, one fewer scoring pass.
* Online DPO (online_dpo_trainer.py:546-636): two completions per prompt,
  a scorer ranks them, and the DPO loss (sigmoid/ipo) is applied to the
  on-policy chosen/rejected pair against the frozen reference.  The
  scorer here is the summed structured reward functions (the IAD setting
  has programmatic rewards; trl uses a reward model or judge).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from iadr1_tpu.data.tokenize import IGNORE_INDEX
from iadr1_tpu.train.grpo import (
    GRPOTrainer,
    bundle_score_fn,
    chunked_token_logps,
)
from iadr1_tpu.train.preference import DPOConfig, make_dpo_step
from iadr1_tpu.train.rollout import RolloutEngine, SamplingConfig


def rloo_advantages(rewards: np.ndarray, k: int,
                    normalize: bool = False) -> np.ndarray:
    """Leave-one-out advantages over consecutive groups of ``k``.

    baseline_i = (sum - r_i)/(k-1); optional whitening over the whole
    batch (rloo_trainer.py:432-439, normalize_advantage).
    """
    if k < 2:
        raise ValueError("RLOO needs at least 2 generations per prompt")
    r = rewards.reshape(-1, k).astype(np.float64)
    baseline = (r.sum(axis=1, keepdims=True) - r) / (k - 1)
    adv = (r - baseline).reshape(-1)
    if normalize:
        adv = (adv - adv.mean()) / (adv.std() + 1e-8)
    return adv.astype(np.float32)


class RLOOTrainer(GRPOTrainer):
    """GRPO host loop with the RLOO leave-one-out baseline.

    Set GRPOConfig.beta to trl's kl_coef for KL control (module note).
    """

    def __init__(self, *args, normalize_advantages: bool = False, **kw):
        super().__init__(*args, **kw)
        self.normalize_advantages = normalize_advantages

    def compute_advantages(self, rewards: np.ndarray) -> np.ndarray:
        return rloo_advantages(rewards, self.cfg.num_generations,
                               self.normalize_advantages)


class OnlineDPOTrainer:
    """Host loop: rollout 2 completions/prompt -> score -> DPO update.

    ``reward_funcs`` follow the reference reward signature (summed);
    ``missing_eos_penalty`` subtracts from completions that never emitted
    EOS (online_dpo_trainer.py:595-597; reward-model path only there,
    always available here).
    """

    def __init__(self, bundle, tokenizer, optimizer, cfg: DPOConfig,
                 reward_funcs: Sequence[Callable], state, ref_params,
                 max_prompt_length: int = 512,
                 max_completion_length: int = 128,
                 sampling_overrides: dict | None = None, schedule=None,
                 missing_eos_penalty: float | None = None):
        self.bundle = bundle
        self.tokenizer = tokenizer
        self.cfg = cfg
        self.reward_funcs = list(reward_funcs)
        self.state = state
        self.ref_params = ref_params
        self.max_prompt_length = max_prompt_length
        self.max_completion_length = max_completion_length
        self.missing_eos_penalty = missing_eos_penalty
        sampling_kw = dict(
            max_new_tokens=max_completion_length,
            # trl OnlineDPOConfig defaults: temperature 0.9, no truncation
            temperature=0.9, top_p=1.0, top_k=0,
            eos_token_id=tokenizer.eos_token_id,
            pad_token_id=tokenizer.pad_token_id or tokenizer.eos_token_id,
        )
        sampling_kw.update(sampling_overrides or {})
        sampling = SamplingConfig(**sampling_kw)
        self.engine = RolloutEngine(
            bundle, sampling,
            max_len=max_prompt_length + max_completion_length,
        )
        self.update_step = make_dpo_step(
            bundle_score_fn(bundle), optimizer, cfg, schedule
        )
        self._rng = jax.random.PRNGKey(0)
        self.metrics_history: list[dict] = []

    def _collate_prompts(self, examples):
        P = self.max_prompt_length
        pad = self.tokenizer.pad_token_id or self.tokenizer.eos_token_id
        B = len(examples)
        input_ids = np.full((B, P), pad, np.int32)
        mask = np.zeros((B, P), np.int32)
        for i, ex in enumerate(examples):
            ids = ex["prompt_ids"][-P:]
            input_ids[i, P - len(ids):] = ids
            mask[i, P - len(ids):] = 1
        batch = {"input_ids": jnp.asarray(input_ids),
                 "attention_mask": jnp.asarray(mask)}
        tcfg = getattr(self.bundle.cfg, "text", self.bundle.cfg)
        if getattr(tcfg, "mrope_section", None) is not None:
            # text-only prompts on an M-RoPE model (train/grpo.py note)
            pos = np.clip(np.cumsum(mask, axis=1) - 1, 0, None)
            batch["position_ids"] = jnp.asarray(
                np.broadcast_to(pos, (3, B, P)).copy(), jnp.int32)
            batch["mrope_deltas"] = jnp.asarray(pos[:, -1] + 1 - P,
                                                jnp.int32)
        return batch

    def step(self, examples: Sequence[dict]) -> dict:
        """examples: [{"prompt_ids": [...], "solution": str, ...extras}]."""
        n = len(examples)
        rollout_batch = self._collate_prompts(examples)
        self._rng, sub = jax.random.split(self._rng)
        rollout = self.engine.generate(self.state.params, rollout_batch,
                                       sub, group_size=2)

        completion_ids = np.asarray(rollout["completion_ids"])   # [2n, N]
        completion_mask = np.asarray(rollout["completion_mask"])
        texts = self.tokenizer.batch_decode(
            [ids[m.astype(bool)]
             for ids, m in zip(completion_ids, completion_mask)],
            skip_special_tokens=True,
        )
        completions = [[{"role": "assistant", "content": t}] for t in texts]
        reward_kwargs = {
            k: [ex.get(k) for ex in examples for _ in range(2)]
            for k in {k for ex in examples for k in ex if k != "prompt_ids"}
        }
        scores = np.zeros(2 * n)
        for fn in self.reward_funcs:
            scores += np.asarray(
                fn(completions=completions, current_step=int(self.state.step),
                   **reward_kwargs),
                np.float64,
            )
        if self.missing_eos_penalty is not None:
            no_eos = completion_mask.sum(axis=1) >= completion_ids.shape[1]
            scores = scores - no_eos * self.missing_eos_penalty

        # per-prompt pair: rows 2i (first sample) vs 2i+1; ties -> first
        pair = scores.reshape(n, 2)
        chosen_col = (pair[:, 1] > pair[:, 0]).astype(np.int64)
        chosen_idx = 2 * np.arange(n) + chosen_col
        rejected_idx = 2 * np.arange(n) + (1 - chosen_col)
        order = np.concatenate([chosen_idx, rejected_idx])

        prompt_ids = np.asarray(rollout["prompt_ids"])[order]
        prompt_mask = np.asarray(rollout["prompt_mask"])[order]
        comp_ids = completion_ids[order]
        comp_mask = completion_mask[order]
        full_ids = np.concatenate([prompt_ids, comp_ids], axis=1)
        full_mask = np.concatenate([prompt_mask, comp_mask], axis=1)
        P = prompt_ids.shape[1]
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
        update_batch = {
            "input_ids": jnp.asarray(full_ids, jnp.int32),
            "labels": jnp.asarray(labels, jnp.int32),
            "segment_ids": jnp.asarray(full_mask, jnp.int32),
            "position_ids": jnp.asarray(positions, jnp.int32),
        }
        self.state, metrics = self.update_step(
            self.state, self.ref_params, update_batch
        )
        out = {k: float(v) for k, v in metrics.items()}
        out["objective/scores"] = float(scores.mean())
        out["objective/scores_margin"] = float(
            (pair.max(axis=1) - pair.min(axis=1)).mean()
        )
        out["completion_length"] = float(comp_mask.sum(axis=1).mean())
        self.metrics_history.append(out)
        return out


# ---------------------------------------------------------------------------
# XPO and Nash-MD (exploratory online preference optimization)
# ---------------------------------------------------------------------------


def _completion_token_logps(score_fn, params, batch, aux, chunk_size):
    """(token_logps [B, T-1], mask) on labeled (completion) positions."""
    hidden, kernel = score_fn(params, batch, aux)
    pred = hidden[:, :-1]
    targets = batch["labels"][:, 1:]
    mask = (targets != IGNORE_INDEX).astype(jnp.float32)
    safe = jnp.where(targets != IGNORE_INDEX, targets, 0)
    tok = chunked_token_logps(pred, kernel, safe, chunk_size)
    return tok * mask, mask


@dataclasses.dataclass(frozen=True)
class XPOConfig:
    beta: float = 0.1
    alpha: float = 1e-5            # exploration coef (xpo_config.py)
    loss_type: str = "sigmoid"     # sigmoid | ipo
    logp_chunk_size: int = 1024


def make_xpo_update_step(score_fn, optimizer, cfg: XPOConfig,
                         schedule=None):
    """(state, ref_params, batch) -> (new_state, metrics).

    batch rows: first n = policy-generated data, last n = ref-generated
    data (full sequences with completion-labeled ``labels``);
    ``chosen_mask`` [n] bool, True when the policy completion won.  Loss
    per trl xpo_trainer.py:306-344: DPO on the (chosen, rejected) log-
    ratios + alpha * policy logps on the REF data (the exploration term).
    """

    def step(state, ref_params, batch):
        cm = batch["chosen_mask"]

        def loss_fn(params):
            pol_tok, _ = _completion_token_logps(
                score_fn, params, batch, ref_params, cfg.logp_chunk_size)
            ref_tok, _ = _completion_token_logps(
                score_fn, ref_params, batch, ref_params,
                cfg.logp_chunk_size)
            ref_tok = jax.lax.stop_gradient(ref_tok)
            pol_sum = pol_tok.sum(axis=1)
            ref_sum = ref_tok.sum(axis=1)
            n = pol_sum.shape[0] // 2
            pol_m, pol_r = pol_sum[:n], pol_sum[n:]
            ref_m, ref_r = ref_sum[:n], ref_sum[n:]

            chosen_ratio = jnp.where(cm, pol_m - ref_m, pol_r - ref_r)
            rejected_ratio = jnp.where(cm, pol_r - ref_r, pol_m - ref_m)
            logits = chosen_ratio - rejected_ratio
            if cfg.loss_type == "sigmoid":
                dpo = -jax.nn.log_sigmoid(cfg.beta * logits)
            elif cfg.loss_type == "ipo":
                dpo = (logits - 1.0 / (2.0 * cfg.beta)) ** 2
            else:
                raise ValueError(f"invalid XPO loss type {cfg.loss_type!r}")
            xpo = cfg.alpha * pol_r
            loss = (dpo + xpo).mean()
            return loss, {
                "loss": loss, "loss/dpo": dpo.mean(), "loss/xpo": xpo.mean(),
                "rewards/chosen": (cfg.beta * chosen_ratio).mean(),
                "rewards/rejected": (cfg.beta * rejected_ratio).mean(),
            }

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        new_state = state.apply_gradients(grads, optimizer)
        if schedule is not None:
            metrics["learning_rate"] = schedule(state.step)
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,))


@dataclasses.dataclass(frozen=True)
class NashMDConfig:
    beta: float = 0.1              # KL coefficient
    mixture_coef: float = 0.5      # geometric-mixture opponent weight
    logp_chunk_size: int = 1024


def make_nash_md_update_step(score_fn, optimizer, cfg: NashMDConfig,
                             schedule=None):
    """(state, ref_params, batch) -> (new_state, metrics).

    batch: policy-generated sequences with completion ``labels`` and
    ``probability`` [B] = P(policy completion beats the mixture
    completion).  Loss per trl nash_md_trainer.py:302-320:
    beta * REINFORCE-KL - (p - 1/2) * sum logps.
    """

    def step(state, ref_params, batch):
        prob = batch["probability"].astype(jnp.float32)

        def loss_fn(params):
            pol_tok, _ = _completion_token_logps(
                score_fn, params, batch, ref_params, cfg.logp_chunk_size)
            ref_tok, _ = _completion_token_logps(
                score_fn, ref_params, batch, ref_params,
                cfg.logp_chunk_size)
            log_ratio = jax.lax.stop_gradient(pol_tok - ref_tok)
            score = (prob - 0.5) * pol_tok.sum(axis=1)
            kl_loss = (log_ratio * pol_tok).sum(axis=1)
            loss = (cfg.beta * kl_loss - score).mean()
            return loss, {
                "loss": loss, "objective/kl": log_ratio.sum(axis=1).mean(),
                "objective/score": score.mean(),
                "objective/probability": prob.mean(),
            }

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        new_state = state.apply_gradients(grads, optimizer)
        if schedule is not None:
            metrics["learning_rate"] = schedule(state.step)
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,))


class _PairedOnlineTrainer(OnlineDPOTrainer):
    """Shared host plumbing for XPO / Nash-MD: prompt collation, reward
    scoring, and full-sequence batch assembly are OnlineDPO's."""

    def _score(self, completion_ids, completion_mask, examples, reps):
        texts = self.tokenizer.batch_decode(
            [ids[m.astype(bool)]
             for ids, m in zip(completion_ids, completion_mask)],
            skip_special_tokens=True,
        )
        completions = [[{"role": "assistant", "content": t}] for t in texts]
        kwargs = {
            k: [ex.get(k) for _ in range(reps) for ex in examples]
            for k in {k for ex in examples for k in ex if k != "prompt_ids"}
        }
        scores = np.zeros(len(completions))
        for fn in self.reward_funcs:
            scores += np.asarray(
                fn(completions=completions,
                   current_step=int(self.state.step), **kwargs),
                np.float64,
            )
        return scores

    def _full_rows(self, rollout_like):
        prompt_ids = np.asarray(rollout_like["prompt_ids"])
        prompt_mask = np.asarray(rollout_like["prompt_mask"])
        comp_ids = np.asarray(rollout_like["completion_ids"])
        comp_mask = np.asarray(rollout_like["completion_mask"])
        full_ids = np.concatenate([prompt_ids, comp_ids], axis=1)
        full_mask = np.concatenate([prompt_mask, comp_mask], axis=1)
        labels = np.where(
            np.concatenate(
                [np.zeros_like(prompt_mask), comp_mask], axis=1
            ).astype(bool),
            full_ids, IGNORE_INDEX,
        )
        return full_ids, full_mask, labels

    def _positions(self, full_mask):
        pos = np.clip(np.cumsum(full_mask, axis=1) - 1, 0, None)
        tcfg = getattr(self.bundle.cfg, "text", self.bundle.cfg)
        if getattr(tcfg, "mrope_section", None) is not None:
            pos = np.broadcast_to(pos, (3,) + pos.shape).copy()
        return pos


class XPOTrainer(_PairedOnlineTrainer):
    """trl XPOTrainer counterpart: one completion from the policy and one
    from the frozen reference per prompt; the reward functions pick the
    winner; DPO + exploration update (make_xpo_update_step)."""

    def __init__(self, bundle, tokenizer, optimizer, cfg: XPOConfig,
                 reward_funcs, state, ref_params,
                 max_prompt_length: int = 512,
                 max_completion_length: int = 128,
                 sampling_overrides: dict | None = None, schedule=None):
        super().__init__(
            bundle, tokenizer, optimizer, DPOConfig(beta=cfg.beta),
            reward_funcs, state, ref_params, max_prompt_length,
            max_completion_length, sampling_overrides, schedule,
        )
        self.cfg = cfg
        self.update_step = make_xpo_update_step(
            bundle_score_fn(bundle), optimizer, cfg, schedule
        )

    def step(self, examples: Sequence[dict]) -> dict:
        n = len(examples)
        batch = self._collate_prompts(examples)
        self._rng, k1, k2 = jax.random.split(self._rng, 3)
        model_data = self.engine.generate(self.state.params, batch, k1)
        ref_data = self.engine.generate(self.ref_params, batch, k2)

        scores_m = self._score(np.asarray(model_data["completion_ids"]),
                               np.asarray(model_data["completion_mask"]),
                               examples, 1)
        scores_r = self._score(np.asarray(ref_data["completion_ids"]),
                               np.asarray(ref_data["completion_mask"]),
                               examples, 1)
        chosen_mask = scores_m >= scores_r   # ties -> policy data

        ids_m, mask_m, lab_m = self._full_rows(model_data)
        ids_r, mask_r, lab_r = self._full_rows(ref_data)
        full_ids = np.concatenate([ids_m, ids_r], axis=0)
        full_mask = np.concatenate([mask_m, mask_r], axis=0)
        labels = np.concatenate([lab_m, lab_r], axis=0)
        update_batch = {
            "input_ids": jnp.asarray(full_ids, jnp.int32),
            "labels": jnp.asarray(labels, jnp.int32),
            "segment_ids": jnp.asarray(full_mask, jnp.int32),
            "position_ids": jnp.asarray(self._positions(full_mask),
                                        jnp.int32),
            "chosen_mask": jnp.asarray(chosen_mask),
        }
        self.state, metrics = self.update_step(
            self.state, self.ref_params, update_batch
        )
        out = {k: float(v) for k, v in metrics.items()}
        out["objective/model_scores"] = float(scores_m.mean())
        out["objective/ref_scores"] = float(scores_r.mean())
        self.metrics_history.append(out)
        return out


class NashMDTrainer(_PairedOnlineTrainer):
    """trl NashMDTrainer counterpart: the opponent completion is sampled
    from the geometric mixture policy (RolloutEngine.generate_mixture);
    the reward functions act as the pairwise judge
    (probability = policy beats mixture, ties 1/2)."""

    def __init__(self, bundle, tokenizer, optimizer, cfg: NashMDConfig,
                 reward_funcs, state, ref_params,
                 max_prompt_length: int = 512,
                 max_completion_length: int = 128,
                 sampling_overrides: dict | None = None, schedule=None):
        super().__init__(
            bundle, tokenizer, optimizer, DPOConfig(beta=cfg.beta),
            reward_funcs, state, ref_params, max_prompt_length,
            max_completion_length, sampling_overrides, schedule,
        )
        self.cfg = cfg
        self.update_step = make_nash_md_update_step(
            bundle_score_fn(bundle), optimizer, cfg, schedule
        )

    def step(self, examples: Sequence[dict]) -> dict:
        batch = self._collate_prompts(examples)
        self._rng, k1, k2 = jax.random.split(self._rng, 3)
        model_data = self.engine.generate(self.state.params, batch, k1)
        mixture_data = self.engine.generate_mixture(
            self.state.params, self.ref_params, self.cfg.mixture_coef,
            batch, k2,
        )
        scores_m = self._score(np.asarray(model_data["completion_ids"]),
                               np.asarray(model_data["completion_mask"]),
                               examples, 1)
        scores_x = self._score(np.asarray(mixture_data["completion_ids"]),
                               np.asarray(mixture_data["completion_mask"]),
                               examples, 1)
        probability = np.where(
            scores_m > scores_x, 1.0,
            np.where(scores_m < scores_x, 0.0, 0.5),
        )

        full_ids, full_mask, labels = self._full_rows(model_data)
        update_batch = {
            "input_ids": jnp.asarray(full_ids, jnp.int32),
            "labels": jnp.asarray(labels, jnp.int32),
            "segment_ids": jnp.asarray(full_mask, jnp.int32),
            "position_ids": jnp.asarray(self._positions(full_mask),
                                        jnp.int32),
            "probability": jnp.asarray(probability, jnp.float32),
        }
        self.state, metrics = self.update_step(
            self.state, self.ref_params, update_batch
        )
        out = {k: float(v) for k, v in metrics.items()}
        out["objective/model_scores"] = float(scores_m.mean())
        out["objective/mixture_scores"] = float(scores_x.mean())
        self.metrics_history.append(out)
        return out
