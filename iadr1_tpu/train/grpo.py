"""SC-GRPO: structured-control group-relative policy optimization.

Behavior-compatible with the reference SCGRPOTrainer
(train/stage_rl/trainer/sc_grpo_trainer.py): per step --
rollout G completions per prompt (vLLM there, the in-program RolloutEngine
here), score with the structured reward functions, group-normalize
advantages ((r - mean_G) / (std_G + 1e-4), :786-793), compute per-token
policy logps and frozen-reference logps, k3 KL estimator
(exp(ref-lp) - (ref-lp) - 1, :746), and the REINFORCE-with-baseline loss
-(exp(lp - sg(lp)) * adv - beta * KL) averaged per-sequence then per-batch
(:796-798).

TPU design: generation, scoring, and update are jit programs sharing one
mesh and one copy of the policy parameters -- no weight transfer, no
dedicated generation chip, no gather/broadcast of rollouts (the reference
burns one GPU on vLLM and syncs weights every step, :314-352, :569-579).
Rewards are host-side regex (pure Python) between the generate and update
programs.

One deliberate divergence: prompts repeat G times *consecutively* so group
advantage normalization is correct for any per-step batch size (the
reference tiles the whole batch and its .view(-1, G) grouping is only
correct when each rank carries a single prompt).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from iadr1_tpu.train.rollout import RolloutEngine, SamplingConfig


@dataclasses.dataclass(frozen=True)
class GRPOConfig:
    num_generations: int = 4          # G (SC_GRPO_*.sh --num_generations 4)
    beta: float = 0.04                # KL coefficient (trl GRPOConfig default)
    temperature: float = 0.9
    top_p: float = 0.9
    top_k: int = 50
    max_prompt_length: int = 1024
    max_completion_length: int = 512
    scale_rewards: bool = True        # divide by group std
    logp_chunk_size: int = 1024       # LM-head chunking for logp scoring
    # upstream-trl GRPO features (grpo_trainer.py _compute_loss:1182-1234;
    # the SC-GRPO reference runs the defaults: 1 on-policy iteration, no
    # effective clipping, per-sequence token mean):
    # * num_iterations (mu): update passes per rollout; >1 makes the step
    #   off-policy against the generation-time logps, engaging epsilon
    # * epsilon / epsilon_high: PPO-style ratio clipping bounds
    # * loss_type: "grpo" (per-seq mean of token losses, then mean),
    #   "bnpo" (token sum / total tokens), "dr_grpo" (token sum /
    #   (B * max_completion_length))
    num_iterations: int = 1
    epsilon: float = 0.2
    epsilon_high: "float | None" = None
    loss_type: str = "grpo"
    # TR-DPO-style periodic ref refresh (trl GRPOConfig sync_ref_model /
    # ref_model_mixup_alpha / ref_model_sync_steps, grpo_config.py:140-152):
    # every sync_steps, ref <- alpha*policy + (1-alpha)*ref
    sync_ref_model: bool = False
    ref_model_mixup_alpha: float = 0.6
    ref_model_sync_steps: int = 512
    # "save_flash" keeps flash (out,lse) as remat residuals (faster);
    # "full" recomputes them in backward (memory-tight large-model mode)
    remat: str = "save_flash"
    # factor the update forward so unique prompts run once and completions
    # attend shared prompt KV (models/shared_prompt.py; DualKV-style) --
    # prompt-side FLOPs drop by G.  Auto-disabled when the bundle has no
    # shared path (VLM collator mode).
    shared_prompt_scoring: bool = True


# ---------------------------------------------------------------------------
# jit update step
# ---------------------------------------------------------------------------


def chunked_token_logps(
    hidden: jax.Array,        # [B, N, H] hidden states; hidden[:, i]
    head_kernel: jax.Array,   # [H, V]     predicts targets[:, i]
    targets: jax.Array,       # [B, N]
    chunk_size: int = 1024,
    logits_dtype=jnp.float32,
) -> jax.Array:
    """Per-token log p(targets) without materializing [B, N, V] logits.

    The LM-head matmul + log-softmax run chunk-by-chunk over the flattened
    token stream under lax.scan with rematerialization (same shape as
    chunked_sft_loss, train/sft.py).  The reference computes completion
    logps the same chunked way (trl/trl/trainer/grpo_trainer.py:802-860);
    the round-1 dense path could not fit the 7B recipe (V=152k, P+N~4.6k).
    """
    B, N, H = hidden.shape
    h = hidden.reshape(-1, H)
    t = targets.reshape(-1)
    total = B * N
    pad = (-total) % chunk_size
    h = jnp.pad(h, ((0, pad), (0, 0)))
    t = jnp.pad(t, (0, pad))
    n_chunks = h.shape[0] // chunk_size
    h = h.reshape(n_chunks, chunk_size, H)
    t = t.reshape(n_chunks, chunk_size)
    # consistent sharding across the per-chunk checkpoint boundary
    # (core/mesh.constrain_scan_chunks)
    from iadr1_tpu.core.mesh import constrain_scan_chunks

    h = constrain_scan_chunks(h)

    @jax.checkpoint
    def chunk_fn(_, xs):
        hc, tc = xs
        logits = jnp.einsum(
            "ch,hv->cv", hc, head_kernel.astype(hc.dtype),
            preferred_element_type=logits_dtype,
        )
        lse = jax.scipy.special.logsumexp(logits, axis=-1)
        picked = jnp.take_along_axis(logits, tc[:, None], axis=-1)[:, 0]
        return None, picked - lse

    _, logps = jax.lax.scan(chunk_fn, None, (h, t))
    return logps.reshape(-1)[:total].reshape(B, N)


def completion_logps(score_fn, params, batch,
                     chunk_size: int = 1024, aux=None) -> jax.Array:
    """Per-token logps of completion tokens given the full sequence.

    ``score_fn(params, batch, aux) -> (hidden [B,P+N,H], head_kernel [H,V])``;
    ``aux`` carries extra traced parameters (the frozen LoRA base) so they
    enter jit as arguments, never as baked-in constants.
    batch: input_ids [B, P+N] (prompt left-padded + completion),
    segment_ids, position_ids.  Returns [B, N] log p(token | prefix).
    """
    hidden, kernel = score_fn(params, batch, aux)
    P = batch["prompt_len"]
    N = batch["completion_ids"].shape[1]
    # hidden states at positions P-1 .. P+N-2 predict completion tokens 0..N-1
    pred = jax.lax.dynamic_slice_in_dim(hidden, P - 1, N, axis=1)
    return chunked_token_logps(
        pred, kernel, batch["completion_ids"], chunk_size
    )


def bundle_score_fn(bundle, remat: bool = True):
    """Default score_fn for a registry ModelBundle (ignores aux)."""
    def score(params, batch, aux=None):
        return bundle.hidden_fn(params, batch, remat=remat), \
            bundle.head_kernel_fn(params)

    return score


def make_grpo_update_step(score_fn, optimizer, cfg: GRPOConfig,
                          schedule=None, ref_score_fn=None,
                          logps_fn=None, ref_logps_fn=None):
    """(state, ref_params, batch) -> (new_state, metrics).

    ``score_fn(params, batch, aux) -> (hidden, head_kernel)`` (see
    bundle_score_fn); ``aux`` is the step's ``ref_params`` pytree, passed
    through so LoRA-mode scoring can reach the frozen base as a traced jit
    argument rather than a multi-GB baked constant.  ``ref_score_fn``
    overrides scoring of the reference model -- used for LoRA ref-model
    elision where the frozen base weights ARE the reference (trl
    PEFT-ref-None path, sc_grpo_trainer.py:153-182): pass the base as
    ``ref_params``.

    ``logps_fn(params, batch, aux) -> [B, N]`` (and ``ref_logps_fn``)
    override the whole scoring path -- the shared-prompt factorization
    uses this (models/shared_prompt.py).

    batch fields (dense path): input_ids [B, P+N], segment_ids,
    position_ids, completion_ids [B, N], completion_mask [B, N],
    advantages [B], prompt_len (static int).
    """
    if ref_score_fn is None:
        ref_score_fn = score_fn
    if logps_fn is None:
        def logps_fn(params, batch, aux):
            return completion_logps(score_fn, params, batch,
                                    cfg.logp_chunk_size, aux=aux)
    if ref_logps_fn is None:
        def ref_logps_fn(ref_params, batch, aux):
            return completion_logps(ref_score_fn, ref_params, batch,
                                    cfg.logp_chunk_size, aux=aux)

    eps_low = cfg.epsilon
    eps_high = cfg.epsilon_high if cfg.epsilon_high is not None else cfg.epsilon

    def step(state, ref_params, batch):
        completion_mask = batch["completion_mask"].astype(jnp.float32)

        def loss_fn(params):
            logps = logps_fn(params, batch, ref_params)
            ref_logps = ref_logps_fn(ref_params, batch, ref_params)
            ref_logps = jax.lax.stop_gradient(ref_logps)

            # k3 KL estimator (sc_grpo_trainer.py:746)
            kl = jnp.exp(ref_logps - logps) - (ref_logps - logps) - 1.0

            adv = batch["advantages"][:, None]
            # off-policy iterations (mu > 1) score against the generation-
            # time logps carried in the batch; on-policy falls back to the
            # detached current logps (ratio == 1, clipping inert) -- the
            # reference SC-GRPO path (sc_grpo_trainer.py:796-798)
            old_logps = batch.get("old_logps")
            if old_logps is None:
                old_logps = jax.lax.stop_gradient(logps)
            coef1 = jnp.exp(logps - old_logps)
            coef2 = jnp.clip(coef1, 1.0 - eps_low, 1.0 + eps_high)
            pg = jnp.minimum(coef1 * adv, coef2 * adv)
            per_token = -(pg - cfg.beta * kl)

            denom = jnp.maximum(completion_mask.sum(axis=1), 1.0)
            if cfg.loss_type == "grpo":
                seq_loss = (per_token * completion_mask).sum(axis=1) / denom
                loss = seq_loss.mean()
            elif cfg.loss_type == "bnpo":
                loss = (per_token * completion_mask).sum() / jnp.maximum(
                    completion_mask.sum(), 1.0)
            elif cfg.loss_type == "dr_grpo":
                loss = (per_token * completion_mask).sum() / (
                    completion_mask.shape[0] * cfg.max_completion_length)
            else:
                raise ValueError(f"unknown loss_type {cfg.loss_type!r}")

            mean_kl = ((kl * completion_mask).sum(axis=1) / denom).mean()
            clip_frac = (
                (jnp.abs(coef1 - coef2) > 1e-9).astype(jnp.float32)
                * completion_mask
            ).sum() / jnp.maximum(completion_mask.sum(), 1.0)
            return loss, {"loss": loss, "kl": mean_kl,
                          "clip_ratio": clip_frac}

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        from iadr1_tpu.train.sft import optax_global_norm

        metrics["grad_norm"] = optax_global_norm(grads)
        new_state = state.apply_gradients(grads, optimizer)
        if schedule is not None:
            metrics["learning_rate"] = schedule(state.step)
        metrics["completion_length"] = completion_mask.sum(axis=1).mean()
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,))


def make_grpo_logps_eval(score_fn, cfg: "GRPOConfig", logps_fn=None):
    """jit'd (params, ref_params, batch) -> [B, N] generation-time logps,
    used to snapshot ``old_logps`` before mu-iteration updates (trl
    grpo_trainer.py:903-1010 _generate_and_score_completions)."""
    if logps_fn is None:
        def logps_fn(params, batch, aux):
            return completion_logps(score_fn, params, batch,
                                    cfg.logp_chunk_size, aux=aux)

    def run(params, ref_params, batch):
        return jax.lax.stop_gradient(logps_fn(params, batch, ref_params))

    return jax.jit(run)


# ---------------------------------------------------------------------------
# host-side orchestration
# ---------------------------------------------------------------------------


def group_advantages(rewards: np.ndarray, num_generations: int,
                     scale: bool = True) -> np.ndarray:
    """(r - mean_G) / (std_G + 1e-4) over consecutive groups of G.

    Matches sc_grpo_trainer.py:786-793 (torch .std -> ddof=1).
    """
    r = rewards.reshape(-1, num_generations)
    mean = r.mean(axis=1, keepdims=True)
    std = r.std(axis=1, ddof=1, keepdims=True)
    adv = r - mean
    if scale:
        adv = adv / (std + 1e-4)
    return adv.reshape(-1).astype(np.float32)


class GRPOTrainer:
    """Host loop: collate prompts -> rollout -> rewards -> jit update.

    ``reward_funcs`` follow the reference signature
    fn(completions, solution=..., **cols) -> list[float]; rewards from all
    functions are summed (sc_grpo_trainer.py:756-784).
    """

    def __init__(self, bundle, tokenizer, optimizer, cfg: GRPOConfig,
                 reward_funcs: Sequence[Callable], state, ref_params,
                 sampling_overrides: dict | None = None, schedule=None,
                 template=None, prompt_collator: Callable | None = None,
                 base_params=None, tuning_cfg=None):
        """``base_params``/``tuning_cfg``: LoRA mode with ref-model elision.

        When given, ``state.params`` is the LoRA pytree (adapters.py
        init_lora_params); the policy is base+LoRA, the KL reference is the
        frozen base itself (one weight copy total -- trl's PEFT-ref-None
        path, sc_grpo_trainer.py:153-182), and ``ref_params`` is ignored
        (pass {}).
        """
        self.bundle = bundle
        self.tokenizer = tokenizer
        self.cfg = cfg
        self.reward_funcs = list(reward_funcs)
        self.state = state
        self.template = template
        # optional VLM collator: (examples, G) -> rollout batch with vision
        # arrays + M-RoPE positions (see cli/train_grpo.py)
        self.prompt_collator = prompt_collator
        sampling = SamplingConfig(
            max_new_tokens=cfg.max_completion_length,
            temperature=cfg.temperature, top_p=cfg.top_p, top_k=cfg.top_k,
            eos_token_id=tokenizer.eos_token_id,
            pad_token_id=tokenizer.pad_token_id or tokenizer.eos_token_id,
            **(sampling_overrides or {}),
        )
        self.engine = RolloutEngine(
            bundle, sampling,
            max_len=cfg.max_prompt_length + cfg.max_completion_length,
        )
        if base_params is not None:
            if tuning_cfg is None or tuning_cfg.finetuning_type != "lora":
                raise ValueError("base_params requires a LoRA TuningConfig")
            # the frozen base rides the ref_params slot: one weight copy
            # total, entering every jit program as an argument (closing
            # over it would bake multi-GB constants into the executable).
            # LoRA is applied *factored* (y += s*(x@A)@B) -- merging would
            # materialize weight-shaped cotangents in backward (~1 GB per
            # MLP kernel stack at 7B; measured HBM OOM).
            self.ref_params = base_params
            scale = tuning_cfg.lora_scale
            self._lora_mode = True
            self.engine = RolloutEngine(
                bundle, sampling,
                max_len=cfg.max_prompt_length + cfg.max_completion_length,
                lora_scale=scale,
            )
            remat = True if cfg.remat == "save_flash" else cfg.remat

            def score(lora_params, batch, base):
                return (
                    bundle.hidden_fn(base, batch, lora=lora_params,
                                     lora_scale=scale, remat=remat),
                    bundle.head_kernel_fn(base),
                )

            ref_score = lambda base, batch, _aux: bundle_score_fn(
                bundle, remat=remat
            )(base, batch)
            logps_fn = ref_logps_fn = None
            self._shared = (cfg.shared_prompt_scoring
                            and bundle.shared_pred_fn is not None)
            if self._shared:
                G = cfg.num_generations

                def logps_fn(lora_params, batch, base):
                    pred = bundle.shared_pred_fn(
                        base, batch, G, remat=remat, lora=lora_params,
                        lora_scale=scale)
                    return chunked_token_logps(
                        pred, bundle.head_kernel_fn(base),
                        batch["completion_ids"], cfg.logp_chunk_size)

                def ref_logps_fn(base, batch, _aux):
                    pred = bundle.shared_pred_fn(base, batch, G, remat=remat)
                    return chunked_token_logps(
                        pred, bundle.head_kernel_fn(base),
                        batch["completion_ids"], cfg.logp_chunk_size)

            self.update_step = make_grpo_update_step(
                score, optimizer, cfg, schedule, ref_score_fn=ref_score,
                logps_fn=logps_fn, ref_logps_fn=ref_logps_fn,
            )
            self.logps_eval = make_grpo_logps_eval(score, cfg,
                                                   logps_fn=logps_fn)
        else:
            self.ref_params = ref_params
            self._lora_mode = False
            remat = True if cfg.remat == "save_flash" else cfg.remat
            logps_fn = None
            self._shared = (cfg.shared_prompt_scoring
                            and bundle.shared_pred_fn is not None)
            if self._shared:
                G = cfg.num_generations

                def logps_fn(params, batch, _aux):
                    pred = bundle.shared_pred_fn(params, batch, G,
                                                 remat=remat)
                    return chunked_token_logps(
                        pred, bundle.head_kernel_fn(params),
                        batch["completion_ids"], cfg.logp_chunk_size)

            self.update_step = make_grpo_update_step(
                bundle_score_fn(bundle, remat=remat), optimizer, cfg,
                schedule, logps_fn=logps_fn, ref_logps_fn=logps_fn,
            )
            self.logps_eval = make_grpo_logps_eval(
                bundle_score_fn(bundle, remat=remat), cfg,
                logps_fn=logps_fn)
        self._rng = jax.random.PRNGKey(0)
        self.metrics_history: list[dict] = []
        # TR-DPO ref sync (SyncRefModelCallback._sync_target_model:
        # ref = (1-alpha)*ref + alpha*policy)
        self._sync_ref = jax.jit(
            lambda ref, pol: jax.tree.map(
                lambda r, p: ((1.0 - cfg.ref_model_mixup_alpha) * r.astype(jnp.float32)
                              + cfg.ref_model_mixup_alpha * p.astype(jnp.float32)
                              ).astype(r.dtype),
                ref, pol,
            )
        )

    def maybe_sync_ref(self):
        """Periodic reference refresh (trl sync_ref_model); no-op in LoRA
        ref-elision mode where the frozen base IS the reference."""
        if not self.cfg.sync_ref_model or self._lora_mode:
            return False
        step = int(self.state.step)
        if step > 0 and step % self.cfg.ref_model_sync_steps == 0:
            self.ref_params = self._sync_ref(self.ref_params, self.state.params)
            return True
        return False

    def fast_forward_rng(self, n_steps: int):
        """Advance the sampling PRNG as if ``n_steps`` rollouts had run
        (resume support: keeps the sampling stream aligned with an
        uninterrupted run)."""
        for _ in range(n_steps):
            self._rng, _ = jax.random.split(self._rng)

    # --- prompt collation --------------------------------------------------

    def _run_updates(self, update_batch):
        """One (mu = 1, reference SC-GRPO) or mu off-policy update passes
        against the snapshotted generation-time logps (trl num_iterations,
        grpo_trainer.py:1182-1234 -- epsilon clipping engages only here)."""
        mu = self.cfg.num_iterations
        if mu > 1:
            update_batch = dict(update_batch)
            update_batch["old_logps"] = self.logps_eval(
                self.state.params, self.ref_params, update_batch)
        for _ in range(mu):
            self.state, metrics = self.update_step(
                self.state, self.ref_params, update_batch)
        return self.state, metrics

    def compute_advantages(self, rewards: np.ndarray) -> np.ndarray:
        """Group-normalized advantages; subclass hook (train/online_rl.py
        RLOOTrainer swaps in the leave-one-out baseline)."""
        return group_advantages(rewards, self.cfg.num_generations,
                                self.cfg.scale_rewards)

    def _collate_prompts(self, examples: Sequence[dict]) -> dict:
        """Left-pad tokenized prompts to max_prompt_length -- one row per
        UNIQUE prompt; the engine's grouped generate repeats the prefilled
        KV cache G ways (prefix caching, sc_grpo_trainer.py:351)."""
        P = self.cfg.max_prompt_length
        pad = self.tokenizer.pad_token_id or self.tokenizer.eos_token_id
        img_id = getattr(self.bundle.cfg, "image_token_id", None)
        ids_list = []
        for ex in examples:
            ids = ex["prompt_ids"][-P:]
            if len(ex["prompt_ids"]) > P and img_id is not None and (
                img_id in ex["prompt_ids"]
            ):
                # slicing through an image-token run desynchronizes the
                # feature scatter indices -- fail loudly instead
                raise ValueError(
                    f"prompt ({len(ex['prompt_ids'])} tokens) with image "
                    f"tokens exceeds max_prompt_length={P}; raise "
                    "max_prompt_length or lower max_pixels"
                )
            ids_list.append(ids)
        B = len(ids_list)
        input_ids = np.full((B, P), pad, np.int32)
        mask = np.zeros((B, P), np.int32)
        for i, ids in enumerate(ids_list):
            input_ids[i, P - len(ids):] = ids
            mask[i, P - len(ids):] = 1
        batch = {"input_ids": jnp.asarray(input_ids),
                 "attention_mask": jnp.asarray(mask)}
        tcfg = getattr(self.bundle.cfg, "text", self.bundle.cfg)
        if getattr(tcfg, "mrope_section", None) is not None:
            # text-only prompts on an M-RoPE model: all three axes share
            # the text position stream (collator.py get_rope_index text
            # branch)
            pos = np.clip(np.cumsum(mask, axis=1) - 1, 0, None)
            batch["position_ids"] = jnp.asarray(
                np.broadcast_to(pos, (3, B, P)).copy(), jnp.int32)
            batch["mrope_deltas"] = jnp.asarray(pos[:, -1] + 1 - P,
                                                jnp.int32)
        return batch

    # --- one GRPO step -----------------------------------------------------

    def step(self, examples: Sequence[dict]) -> dict:
        """examples: [{"prompt_ids": [...], "solution": str, ...extras}]."""
        G = self.cfg.num_generations
        if self.prompt_collator is not None:
            # unique-prompt batch for the prefix-cached rollout (vision
            # tower runs once per prompt).  Shared-prompt scoring reuses it
            # for the update too; the dense path needs a G-repeated batch
            # (its scatter plans want one row per rollout).
            rollout_batch = self.prompt_collator(examples, 1)
            batch = (rollout_batch if self._shared
                     else self.prompt_collator(examples, G))
        else:
            rollout_batch = self._collate_prompts(examples)
            batch = rollout_batch
        self._rng, sub = jax.random.split(self._rng)
        if self._lora_mode:
            rollout = self.engine.generate(
                self.ref_params, rollout_batch, sub, lora=self.state.params,
                group_size=G,
            )
        else:
            rollout = self.engine.generate(self.state.params, rollout_batch,
                                           sub, group_size=G)

        completion_ids = np.asarray(rollout["completion_ids"])
        completion_mask = np.asarray(rollout["completion_mask"])
        texts = self.tokenizer.batch_decode(
            [ids[m.astype(bool)] for ids, m in zip(completion_ids, completion_mask)],
            skip_special_tokens=True,
        )
        completions = [[{"role": "assistant", "content": t}] for t in texts]

        # reward kwargs: every extra column repeated G times per example
        reward_kwargs = {}
        keys = {k for ex in examples for k in ex if k != "prompt_ids"}
        for key in keys:
            reward_kwargs[key] = [
                ex.get(key) for ex in examples for _ in range(G)
            ]
        rewards_per_func = np.zeros((len(completions), len(self.reward_funcs)))
        step_idx = int(self.state.step)
        for i, fn in enumerate(self.reward_funcs):
            # current_step passthrough matches the reference trainer's reward
            # invocation (sc_grpo_trainer.py:780)
            out = fn(completions=completions, current_step=step_idx,
                     **reward_kwargs)
            rewards_per_func[:, i] = np.asarray(out, np.float64)
        rewards = rewards_per_func.sum(axis=1)
        advantages = self.compute_advantages(rewards)

        # truncation rate: completions that hit max_completion_length
        # without emitting EOS.  The silent recipe-killer: a too-short
        # budget truncates every answer mid-sentence, every structured
        # reward scores 0, and training "runs" while learning nothing
        # (the reference has the same blind spot)
        eos_id = self.tokenizer.eos_token_id
        full_rows = completion_mask.sum(axis=1) == completion_ids.shape[1]
        truncated = full_rows & (completion_ids[:, -1] != eos_id)
        trunc_frac = float(truncated.mean())
        if trunc_frac > 0.5 and not np.any(rewards):
            import warnings

            warnings.warn(
                f"{trunc_frac:.0%} of completions hit "
                f"max_completion_length={self.cfg.max_completion_length} "
                "without EOS and every reward is zero -- answers are "
                "likely truncated before they can be scored; raise "
                "GRPOConfig.max_completion_length",
                stacklevel=2,
            )

        # assemble update batch (static shapes)
        prompt_ids = np.asarray(rollout["prompt_ids"])
        prompt_mask = np.asarray(rollout["prompt_mask"])
        B, P = prompt_ids.shape
        N = completion_ids.shape[1]
        if self._shared:
            # factored update: unique prompts once, completions per rollout
            # attending the shared prompt KV (models/shared_prompt.py)
            pu_ids = prompt_ids[::G]
            pu_mask = prompt_mask[::G]
            if "position_ids" in batch:   # M-RoPE (VLM collator batch)
                pu_pos = np.asarray(batch["position_ids"])     # [3, n, P]
                deltas = np.asarray(batch["mrope_deltas"])     # [n]
                comp_pos = (P + np.repeat(deltas, G)[:, None]
                            + np.arange(N)[None, :]).astype(np.int32)
                comp_pos = np.broadcast_to(comp_pos, (3, B, N)).copy()
            else:
                pu_pos = np.clip(np.cumsum(pu_mask, axis=1) - 1, 0, None)
                plen = pu_mask.sum(axis=1)
                comp_pos = (np.repeat(plen, G)[:, None]
                            + np.arange(N)[None, :]).astype(np.int32)
            update_batch = {
                "prompt_ids": jnp.asarray(pu_ids, jnp.int32),
                "prompt_segments": jnp.asarray(pu_mask, jnp.int32),
                "prompt_positions": jnp.asarray(pu_pos, jnp.int32),
                "completion_ids": jnp.asarray(completion_ids, jnp.int32),
                "completion_mask": jnp.asarray(completion_mask, jnp.int32),
                "completion_positions": jnp.asarray(comp_pos),
                "advantages": jnp.asarray(advantages),
            }
            for key in ("patches", "rot_cos", "rot_sin", "vision_segments",
                        "scatter_rows", "scatter_cols"):
                if key in batch:
                    update_batch[key] = batch[key]
            self.state, metrics = self._run_updates(update_batch)
            out = {k: float(v) for k, v in metrics.items()}
            out["completion_truncated_frac"] = trunc_frac
            out["ref_synced"] = float(self.maybe_sync_ref())
            out["reward"] = float(rewards.mean())
            out["reward_std"] = float(
                rewards.reshape(-1, G).std(axis=1, ddof=1).mean()
            )
            for i, fn in enumerate(self.reward_funcs):
                out[f"rewards/{fn.__name__}"] = float(
                    rewards_per_func[:, i].mean())
            self.metrics_history.append(out)
            return out
        full_ids = np.concatenate([prompt_ids, completion_ids], axis=1)
        full_mask = np.concatenate([prompt_mask, completion_mask], axis=1)
        if "position_ids" in batch:  # M-RoPE: prompt grids + delta positions
            prompt_pos = np.asarray(batch["position_ids"])       # [3, B, P]
            deltas = np.asarray(batch["mrope_deltas"])           # [B]
            comp_pos = (P + deltas[:, None] + np.arange(N)[None, :])
            comp_pos = np.broadcast_to(comp_pos, (3, B, N))
            positions = np.concatenate([prompt_pos, comp_pos], axis=-1)
        else:
            positions = np.clip(np.cumsum(full_mask, axis=1) - 1, 0, None)
        update_batch = {
            "input_ids": jnp.asarray(full_ids, jnp.int32),
            "segment_ids": jnp.asarray(full_mask, jnp.int32),
            "position_ids": jnp.asarray(positions, jnp.int32),
            "completion_ids": jnp.asarray(completion_ids, jnp.int32),
            "completion_mask": jnp.asarray(completion_mask, jnp.int32),
            "advantages": jnp.asarray(advantages),
            "prompt_len": P,
        }
        for key in ("patches", "rot_cos", "rot_sin", "vision_segments",
                    "scatter_rows", "scatter_cols"):
            if key in batch:
                update_batch[key] = batch[key]
        self.state, metrics = self._run_updates(update_batch)

        out = {k: float(v) for k, v in metrics.items()}
        out["completion_truncated_frac"] = trunc_frac
        out["ref_synced"] = float(self.maybe_sync_ref())
        out["reward"] = float(rewards.mean())
        out["reward_std"] = float(
            rewards.reshape(-1, G).std(axis=1, ddof=1).mean()
        )
        for i, fn in enumerate(self.reward_funcs):
            out[f"rewards/{fn.__name__}"] = float(rewards_per_func[:, i].mean())
        self.metrics_history.append(out)
        return out
