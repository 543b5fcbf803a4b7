"""PPO trainer: clipped surrogate + clipped value loss with GAE.

Counterpart of the reference's CustomPPOTrainer
(train/stage_sft/llamafactory/train/ppo/trainer.py), which wraps trl
v0.8's PPOTrainer; the math reproduced here is trl's:

* per-token KL penalty rewards: -kl_coef * (logp - ref_logp), score added
  at the last response token (trl compute_rewards)
* GAE with (gamma, lam), advantages masked-whitened (compute_advantages)
* clipped surrogate pg loss + 0.5 * clipped value loss * vf_coef (trl loss)
* adaptive or fixed KL controller (trl AdaptiveKLController)
* optional score scaling/normalization via running moments
  (ppo_score_norm -> use_score_scaling/use_score_norm)

TPU design: one jit "experience" program computes old logps / ref logps /
values for the whole rollout (chunked LM head, no [B,T,V] logits); GAE and
reward shaping are tiny [B,N] numpy ops on host; ppo_epochs x minibatch
jit updates then revisit the same experience, as in trl's inner loop.
The value head rides the param pytree ({"model": ..., "vhead": ...}) so
policy and value train jointly from one forward, like trl's
AutoModelForCausalLMWithValueHead.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from iadr1_tpu.train.grpo import chunked_token_logps
from iadr1_tpu.train.preference import init_value_head
from iadr1_tpu.train.rollout import RolloutEngine, SamplingConfig


@dataclasses.dataclass(frozen=True)
class PPOConfig:
    # trl PPOConfig defaults as configured by the reference trainer
    gamma: float = 1.0
    lam: float = 0.95
    cliprange: float = 0.2
    cliprange_value: float = 0.2
    vf_coef: float = 0.1
    init_kl_coef: float = 0.2
    ppo_target: float = 6.0           # finetuning_args.ppo_target
    adaptive_kl: bool = True          # target is None -> fixed controller
    kl_horizon: float = 10000.0
    ppo_epochs: int = 4               # finetuning_args.ppo_epochs
    mini_batch_size: int = 1
    whiten_rewards: bool = False      # finetuning_args.ppo_whiten_rewards
    score_norm: bool = False          # finetuning_args.ppo_score_norm
    score_clip: float = 0.0           # trl score_clip (0 = off)
    max_prompt_length: int = 1024
    max_completion_length: int = 512
    temperature: float = 0.9
    top_p: float = 0.9
    top_k: int = 50
    logp_chunk_size: int = 1024
    remat: str = "save_flash"


class AdaptiveKLController:
    """trl core.AdaptiveKLController: kl_coef *= 1 + clip(err, ±0.2) * n/H."""

    def __init__(self, init_kl_coef: float, target: float, horizon: float):
        self.value = init_kl_coef
        self.target = target
        self.horizon = horizon

    def update(self, current_kl: float, n_steps: int):
        err = np.clip(current_kl / self.target - 1.0, -0.2, 0.2)
        self.value *= 1.0 + err * n_steps / self.horizon


class FixedKLController:
    def __init__(self, kl_coef: float):
        self.value = kl_coef

    def update(self, current_kl: float, n_steps: int):
        pass


class RunningMoments:
    """trl core.RunningMoments (Welford over batches) for score scaling."""

    def __init__(self):
        self.mean, self.std, self.var, self.count = 0.0, 1.0, 1.0, 1e-24

    def update(self, xs: np.ndarray) -> tuple[float, float]:
        xs_count = xs.size
        xs_mean = float(xs.mean())
        xs_var = float(xs.var())
        delta = xs_mean - self.mean
        tot_count = self.count + xs_count
        new_sum = xs_var * xs_count
        old_sum = self.var * self.count + delta**2 * self.count * xs_count / tot_count
        self.mean += delta * xs_count / tot_count
        self.var = (old_sum + new_sum) / tot_count
        self.std = float(np.sqrt(self.var * tot_count / max(tot_count - 1, 1)))
        self.count = tot_count
        return xs_mean, float(np.sqrt(xs_var * xs_count / max(xs_count - 1, 1)))


def masked_whiten(x: np.ndarray, mask: np.ndarray, shift_mean: bool = True) -> np.ndarray:
    m = mask.astype(np.float64)
    total = max(m.sum(), 1.0)
    mean = (x * m).sum() / total
    var = ((x - mean) ** 2 * m).sum() / total
    out = (x - mean) * (var + 1e-8) ** -0.5
    if not shift_mean:
        out = out + mean
    return out.astype(np.float32)


def compute_gae(rewards: np.ndarray, values: np.ndarray, mask: np.ndarray,
                gamma: float, lam: float) -> tuple[np.ndarray, np.ndarray]:
    """GAE over response tokens (trl compute_advantages).

    rewards/values/mask: [B, N].  Returns (advantages whitened, returns).
    """
    values = values * mask
    rewards = rewards * mask
    B, N = rewards.shape
    adv = np.zeros((B, N), np.float64)
    lastgaelam = np.zeros(B, np.float64)
    for t in reversed(range(N)):
        nextvalues = values[:, t + 1] if t < N - 1 else 0.0
        delta = rewards[:, t] + gamma * nextvalues - values[:, t]
        lastgaelam = delta + gamma * lam * lastgaelam
        adv[:, t] = lastgaelam
    returns = (adv + values).astype(np.float32)
    adv = masked_whiten(adv, mask)
    return adv * mask, returns * mask


def _pred_slice(hidden, prompt_len: int, n: int):
    # hidden states at P-1 .. P+N-2 predict response tokens 0..N-1; the
    # value head reads the same positions (trl batched_forward_pass masks)
    return jax.lax.dynamic_slice_in_dim(hidden, prompt_len - 1, n, axis=1)


def make_experience_fn(score_fn, cfg: PPOConfig, ref_score_fn=None):
    """jit (params, ref_params, batch) -> (old_logps, ref_logps, values)."""
    if ref_score_fn is None:
        ref_score_fn = score_fn

    def experience(params, ref_params, batch):
        hidden, kernel = score_fn(params["model"], batch, ref_params)
        P, N = batch["prompt_len"], batch["completion_ids"].shape[1]
        pred = _pred_slice(hidden, P, N)
        logps = chunked_token_logps(
            pred, kernel, batch["completion_ids"], cfg.logp_chunk_size)
        values = (
            pred.astype(jnp.float32) @ params["vhead"]["kernel"]
            + params["vhead"]["bias"]
        )[..., 0]
        ref_hidden, ref_kernel = ref_score_fn(ref_params, batch, ref_params)
        ref_logps = chunked_token_logps(
            _pred_slice(ref_hidden, P, N), ref_kernel,
            batch["completion_ids"], cfg.logp_chunk_size)
        return logps, ref_logps, values

    return jax.jit(experience)


def make_ppo_update_step(score_fn, optimizer, cfg: PPOConfig, schedule=None):
    """jit minibatch PPO step over (state, ref_params, batch).

    batch adds: old_logps, old_values, advantages, returns [B,N] to the
    usual input_ids/segment_ids/position_ids/completion_* fields.
    """

    def step(state, ref_params, batch):
        mask = batch["completion_mask"].astype(jnp.float32)
        denom = jnp.maximum(mask.sum(), 1.0)

        def loss_fn(params):
            hidden, kernel = score_fn(params["model"], batch, ref_params)
            P, N = batch["prompt_len"], batch["completion_ids"].shape[1]
            pred = _pred_slice(hidden, P, N)
            logps = chunked_token_logps(
                pred, kernel, batch["completion_ids"], cfg.logp_chunk_size)
            vpred = (
                pred.astype(jnp.float32) @ params["vhead"]["kernel"]
                + params["vhead"]["bias"]
            )[..., 0]

            # trl PPOTrainer.loss
            adv = batch["advantages"]
            ratio = jnp.exp(logps - batch["old_logps"])
            pg1 = -adv * ratio
            pg2 = -adv * jnp.clip(ratio, 1.0 - cfg.cliprange, 1.0 + cfg.cliprange)
            pg_loss = (jnp.maximum(pg1, pg2) * mask).sum() / denom

            vclip = batch["old_values"] + jnp.clip(
                vpred - batch["old_values"],
                -cfg.cliprange_value, cfg.cliprange_value,
            )
            vf1 = jnp.square(vpred - batch["returns"])
            vf2 = jnp.square(vclip - batch["returns"])
            vf_loss = 0.5 * (jnp.maximum(vf1, vf2) * mask).sum() / denom

            loss = pg_loss + cfg.vf_coef * vf_loss
            approx_kl = 0.5 * (jnp.square(logps - batch["old_logps"]) * mask).sum() / denom
            clipfrac = ((pg2 > pg1).astype(jnp.float32) * mask).sum() / denom
            return loss, {
                "loss": loss, "pg_loss": pg_loss, "vf_loss": vf_loss,
                "approx_kl": approx_kl, "clipfrac": clipfrac,
            }

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        new_state = state.apply_gradients(grads, optimizer)
        if schedule is not None:
            metrics["learning_rate"] = schedule(state.step)
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,))


class PPOTrainer:
    """Host loop: rollout -> score -> KL-shaped rewards -> GAE ->
    ppo_epochs x minibatch updates.

    ``reward_fn(texts, examples) -> [n_prompts] floats`` stands in for the
    reference's reward model / reward server (ppo_utils.py
    get_rewards_from_server, replace_model 'reward' swap).
    """

    def __init__(self, bundle, tokenizer, optimizer, cfg: PPOConfig,
                 reward_fn: Callable, state, ref_params,
                 sampling_overrides: dict | None = None, schedule=None):
        self.bundle = bundle
        self.tokenizer = tokenizer
        self.cfg = cfg
        self.reward_fn = reward_fn
        self.state = state
        self.ref_params = ref_params
        sampling = SamplingConfig(
            max_new_tokens=cfg.max_completion_length,
            temperature=cfg.temperature, top_p=cfg.top_p, top_k=cfg.top_k,
            eos_token_id=tokenizer.eos_token_id,
            pad_token_id=tokenizer.pad_token_id or tokenizer.eos_token_id,
        )
        self.engine = RolloutEngine(
            bundle, sampling,
            max_len=cfg.max_prompt_length + cfg.max_completion_length,
        )
        remat = True if cfg.remat == "save_flash" else cfg.remat

        def score(model_params, batch, _aux):
            return (bundle.hidden_fn(model_params, batch, remat=remat),
                    bundle.head_kernel_fn(model_params))

        self._score_fn = score
        self.experience_fn = make_experience_fn(score, cfg)
        self.update_step = make_ppo_update_step(score, optimizer, cfg, schedule)
        self.kl_ctl = (
            AdaptiveKLController(cfg.init_kl_coef, cfg.ppo_target, cfg.kl_horizon)
            if cfg.adaptive_kl else FixedKLController(cfg.init_kl_coef)
        )
        self.running = RunningMoments()
        self._rng = jax.random.PRNGKey(0)
        self.metrics_history: list[dict] = []

    def _collate_prompts(self, examples: Sequence[dict]) -> dict:
        P = self.cfg.max_prompt_length
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
            # text-only prompts on an M-RoPE model: all three axes share
            # the text position stream
            pos = np.clip(np.cumsum(mask, axis=1) - 1, 0, None)
            batch["position_ids"] = jnp.asarray(
                np.broadcast_to(pos, (3, B, P)).copy(), jnp.int32)
            batch["mrope_deltas"] = jnp.asarray(
                pos[:, -1] + 1 - P, jnp.int32)
        return batch

    def step(self, examples: Sequence[dict]) -> dict:
        cfg = self.cfg
        batch = self._collate_prompts(examples)
        self._rng, sub = jax.random.split(self._rng)
        rollout = self.engine.generate(self.state.params["model"], batch, sub)

        completion_ids = np.asarray(rollout["completion_ids"])
        completion_mask = np.asarray(rollout["completion_mask"])
        texts = self.tokenizer.batch_decode(
            [ids[m.astype(bool)] for ids, m in zip(completion_ids, completion_mask)],
            skip_special_tokens=True,
        )
        scores = np.asarray(self.reward_fn(texts, examples), np.float64)

        # score scaling/normalization (trl use_score_scaling/use_score_norm)
        if cfg.score_norm:
            mean, std = self.running.update(scores)
            scores = (scores - self.running.mean) / max(self.running.std, 1e-8)
        if cfg.score_clip and cfg.score_clip > 0:
            scores = np.clip(scores, -cfg.score_clip, cfg.score_clip)

        prompt_ids = np.asarray(rollout["prompt_ids"])
        prompt_mask = np.asarray(rollout["prompt_mask"])
        full_ids = np.concatenate([prompt_ids, completion_ids], axis=1)
        full_mask = np.concatenate([prompt_mask, completion_mask], axis=1)
        B, P = prompt_ids.shape
        N = completion_ids.shape[1]
        if "position_ids" in batch:   # M-RoPE: prompt grids + delta positions
            prompt_pos = np.asarray(batch["position_ids"])       # [3, B, P]
            deltas = np.asarray(batch["mrope_deltas"])           # [B]
            comp_pos = (P + deltas[:, None] + np.arange(N)[None, :])
            positions = np.concatenate(
                [prompt_pos, np.broadcast_to(comp_pos, (3, B, N))], axis=-1)
        else:
            positions = np.clip(np.cumsum(full_mask, axis=1) - 1, 0, None)
        base_batch = {
            "input_ids": jnp.asarray(full_ids, jnp.int32),
            "segment_ids": jnp.asarray(full_mask, jnp.int32),
            "position_ids": jnp.asarray(positions, jnp.int32),
            "completion_ids": jnp.asarray(completion_ids, jnp.int32),
            "completion_mask": jnp.asarray(completion_mask, jnp.int32),
            "prompt_len": P,
        }
        old_logps, ref_logps, old_values = (
            np.asarray(x, np.float64)
            for x in self.experience_fn(self.state.params, self.ref_params,
                                        base_batch)
        )

        # KL-shaped per-token rewards (trl compute_rewards, kl_penalty="kl")
        kl = (old_logps - ref_logps) * completion_mask
        rewards = -self.kl_ctl.value * kl
        last_idx = np.maximum(completion_mask.sum(axis=1).astype(int) - 1, 0)
        rewards[np.arange(B), last_idx] += scores
        if cfg.whiten_rewards:
            rewards = masked_whiten(rewards, completion_mask, shift_mean=False)

        advantages, returns = compute_gae(
            rewards, old_values * completion_mask, completion_mask,
            cfg.gamma, cfg.lam,
        )

        # ppo_epochs x shuffled minibatches over the same experience
        mb = max(min(cfg.mini_batch_size, B), 1)
        n_mb = B // mb
        agg: dict[str, list[float]] = {}
        order_rng = np.random.default_rng(int(self.state.step))
        for _ in range(cfg.ppo_epochs):
            perm = order_rng.permutation(B)
            for j in range(n_mb):
                sel = np.sort(perm[j * mb:(j + 1) * mb])
                mb_batch = {}
                for k, v in base_batch.items():
                    if k == "position_ids" and v.ndim == 3:   # M-RoPE [3,B,T]
                        mb_batch[k] = v[:, sel]
                    elif hasattr(v, "shape") and v.ndim >= 1 and v.shape[0] == B:
                        mb_batch[k] = v[sel]
                    else:
                        mb_batch[k] = v
                mb_batch["old_logps"] = jnp.asarray(old_logps[sel], jnp.float32)
                mb_batch["old_values"] = jnp.asarray(old_values[sel], jnp.float32)
                mb_batch["advantages"] = jnp.asarray(advantages[sel])
                mb_batch["returns"] = jnp.asarray(returns[sel])
                self.state, metrics = self.update_step(
                    self.state, self.ref_params, mb_batch)
                for k, v in metrics.items():
                    agg.setdefault(k, []).append(float(v))

        mean_kl = float(
            (kl.sum(axis=1) / np.maximum(completion_mask.sum(axis=1), 1)).mean()
        )
        self.kl_ctl.update(mean_kl, B)
        out = {k: float(np.mean(v)) for k, v in agg.items()}
        out.update({
            "reward": float(scores.mean()),
            "kl": mean_kl,
            "kl_coef": float(self.kl_ctl.value),
            "completion_length": float(completion_mask.sum(axis=1).mean()),
        })
        self.metrics_history.append(out)
        return out


def make_ppo_state_params(model_params, hidden_size: int, key=None):
    """Combined policy+value pytree for PPOTrainer (valuehead counterpart)."""
    key = key if key is not None else jax.random.PRNGKey(0)
    return {"model": model_params,
            "vhead": init_value_head(key, hidden_size)}
