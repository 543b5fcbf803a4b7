"""Rollout engine: jit-compiled batched sampling with a static KV cache.

The TPU-native replacement for the reference's vLLM dependency (GRPO rollouts
at sc_grpo_trainer.py:343-358 and 651-677; eval inference at
vLLM_Qwen_detect_format.py:277-287).  Key design points:

* rollout and training share one mesh and one set of live parameters -- the
  reference's per-step weight sync (_move_model_to_vllm,
  sc_grpo_trainer.py:569-579) is eliminated by construction.
* prompts are left-padded into a static [B, max_prompt] block (matching the
  reference's left padding, sc_grpo_trainer.py:184-227), prefilled in one
  pass, then decoded with lax.scan over max_new_tokens.
* sampling: temperature + top-k + top-p (the reference's SamplingParams:
  temperature, top_p=0.9, top_k=50, sc_grpo_trainer.py:353-358); greedy when
  temperature == 0 (the eval drivers' setting).
* sequences freeze at EOS: the emitted token becomes pad and the cache
  segment mask stops growing, mirroring the reference's mask-to-first-EOS
  (sc_grpo_trainer.py:722-726).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SamplingConfig:
    max_new_tokens: int = 512
    temperature: float = 0.9
    top_p: float = 0.9
    top_k: int = 50
    eos_token_id: int = 0
    pad_token_id: int = 0
    # TPU-accelerated approximate top-k (jax.lax.approx_max_k, ~0.95
    # recall): a decode-step speedup knob -- exact lax.top_k over a 152k
    # vocab is a per-step sort on the VPU.  Off by default (exact
    # HF-parity sampling).
    approx_top_k: bool = False
    # stop decoding once EVERY row has emitted EOS (lax.while_loop instead
    # of a fixed-trip scan).  Output-identical to the full loop -- unfilled
    # steps hold pad tokens either way -- but eval-style generates where
    # answers are ~10-30 tokens against max_new=512 skip ~95% of the
    # decode steps (the vLLM dynamic-stopping analogue,
    # vLLM_Qwen_detect_format.py greedy answers).
    early_stop: bool = True


def sample_token(rng, logits, cfg: SamplingConfig):
    """One sampling step over [B, V] logits."""
    if cfg.temperature == 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = logits / cfg.temperature
    k = min(cfg.top_k if cfg.top_k > 0 else logits.shape[-1], logits.shape[-1])
    if cfg.approx_top_k and 0 < cfg.top_k < logits.shape[-1]:
        top_logits, top_idx = jax.lax.approx_max_k(logits, k)
        # approx results are value-sorted descending, like top_k
    else:
        top_logits, top_idx = jax.lax.top_k(logits, k)        # [B, k] desc
    if cfg.top_p < 1.0:
        probs = jax.nn.softmax(top_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # keep tokens while the cumulative mass *before* them is < top_p
        keep = (cum - probs) < cfg.top_p
        top_logits = jnp.where(keep, top_logits, -jnp.inf)
    choice = jax.random.categorical(rng, top_logits, axis=-1)  # [B]
    return jnp.take_along_axis(top_idx, choice[:, None], axis=-1)[:, 0].astype(
        jnp.int32
    )


class RolloutEngine:
    """Batched generate() over a model bundle with a KV cache.

    ``prefill_fn(params, batch, cache) -> (hidden, cache)`` and
    ``decode_fn(params, token_batch, cache) -> (hidden, cache)`` are built
    from the registry bundle; ``logits_fn(params, hidden) -> [B, T, V]``.
    """

    def __init__(self, bundle, sampling: SamplingConfig, max_len: int,
                 cache_dtype=jnp.bfloat16, lora_scale: float = 1.0):
        self.bundle = bundle
        self.sampling = sampling
        self.max_len = max_len
        self.cache_dtype = cache_dtype
        self._generate = jax.jit(
            functools.partial(_generate_impl, bundle=bundle,
                              sampling=sampling, max_len=max_len,
                              cache_dtype=cache_dtype,
                              lora_scale=lora_scale),
            static_argnames=("group_size",),
        )
        self._mixture_jits: dict = {}

    def generate_mixture(self, params, mixture_params, mixture_coef: float,
                         batch, rng) -> dict:
        """Sample from the geometric mixture of two policies: per-step
        logits = (1-c)*log_softmax(policy) + c*log_softmax(mixture) (trl
        GeometricMixtureWrapper, models/modeling_base.py; Nash-MD's
        mixture opponent).  Both models share the batch; each keeps its
        own KV cache."""
        key = float(mixture_coef)
        if key not in self._mixture_jits:
            self._mixture_jits[key] = jax.jit(
                functools.partial(
                    _generate_impl, bundle=self.bundle,
                    sampling=self.sampling, max_len=self.max_len,
                    cache_dtype=self.cache_dtype, mixture_coef=key,
                ),
                static_argnames=("group_size",),
            )
        return self._mixture_jits[key](params, batch, rng, None,
                                       mixture_params)

    def generate(self, params, batch, rng, lora=None,
                 group_size: int = 1) -> dict:
        """batch: left-padded prompt arrays (+ optional vision arrays).

        ``lora``: optional factored-adapter pytree applied on top of
        ``params`` (base + LoRA serving without materializing merged
        weights).  ``group_size`` G > 1 is the prefix-cache analogue of
        vLLM's enable_prefix_caching under GRPO (sc_grpo_trainer.py:351):
        each prompt is prefilled ONCE (vision tower included) and its KV
        cache is repeated G ways before decoding G independent samples --
        prefill cost drops by G.  Returns {"completion_ids"
        [B*G, max_new], "completion_mask": ..., "prompt_ids": ...,
        "prompt_mask": ...} with prompts repeated G times consecutively.
        """
        return self._generate(params, batch, rng, lora,
                              group_size=group_size)


def _generate_impl(params, batch, rng, lora=None, mixture_params=None, *,
                   bundle, sampling: SamplingConfig, max_len: int,
                   cache_dtype, lora_scale: float = 1.0,
                   group_size: int = 1, mixture_coef: float = 0.0):
    from iadr1_tpu.models import qwen2

    lora_kw = {"lora": lora, "lora_scale": lora_scale} if lora is not None else {}

    cfg = bundle.cfg
    tcfg = getattr(cfg, "text", cfg)
    input_ids = batch["input_ids"]                  # [B, P] left-padded
    attn_mask = batch["attention_mask"]             # [B, P] 1 = real
    B, P = input_ids.shape
    mrope = tcfg.mrope_section is not None

    cache = qwen2.init_cache(tcfg, B, max_len, cache_dtype)

    # --- prefill ----------------------------------------------------------
    segs = attn_mask.astype(jnp.int32)
    if mrope:
        position_ids = batch["position_ids"]        # [3, B, P] precomputed
        deltas = batch["mrope_deltas"]              # [B]
    else:
        position_ids = jnp.clip(jnp.cumsum(attn_mask, axis=1) - 1, 0)
        deltas = position_ids[:, -1] + 1 - P        # next pos = P + delta

    prefill_batch = {**batch, "position_ids": position_ids,
                     "segment_ids": segs}
    # prefill from the empty cache goes through the fused flash kernel and
    # writes K/V; decode steps use the ragged decode kernel (cost scales
    # with valid cache length) -- the vLLM-PagedAttention analogue
    hidden, cache = bundle.apply(
        params, prefill_batch, cache=cache, cache_mode="prefill", **lora_kw
    )
    logits_fn = lambda h: bundle.logits_fn(params, h)

    last_logits = logits_fn(hidden[:, -1:, :])[:, 0]          # [B, V]

    if mixture_params is not None:
        # geometric mixture opponent: second model, own KV cache; logits
        # combine per step below (Nash-MD, trl GeometricMixtureWrapper)
        mix_cache = qwen2.init_cache(tcfg, B, max_len, cache_dtype)
        mix_hidden, mix_cache = bundle.apply(
            mixture_params, prefill_batch, cache=mix_cache,
            cache_mode="prefill",
        )
        mix_logits_fn = lambda h: bundle.logits_fn(mixture_params, h)
        mix_last = mix_logits_fn(mix_hidden[:, -1:, :])[:, 0]
        last_logits = (
            (1.0 - mixture_coef) * jax.nn.log_softmax(last_logits, axis=-1)
            + mixture_coef * jax.nn.log_softmax(mix_last, axis=-1)
        )

    if group_size > 1 and mixture_params is not None:
        raise ValueError("mixture sampling does not support group_size > 1")
    if group_size > 1:
        # prefix caching: the prompt (and its vision tower pass) was
        # prefilled once; fan the KV cache out G ways for G samples
        G = group_size
        cache = {
            "k": jnp.repeat(cache["k"], G, axis=1),
            "v": jnp.repeat(cache["v"], G, axis=1),
            "segment_ids": jnp.repeat(cache["segment_ids"], G, axis=0),
            "write_idx": cache["write_idx"],
        }
        last_logits = jnp.repeat(last_logits, G, axis=0)
        deltas = jnp.repeat(deltas, G, axis=0)
        input_ids = jnp.repeat(input_ids, G, axis=0)
        attn_mask = jnp.repeat(attn_mask, G, axis=0)
        B = B * G

    rng, sub = jax.random.split(rng)
    first_token = sample_token(sub, last_logits, sampling)

    # --- decode loop -------------------------------------------------------
    eos = sampling.eos_token_id
    pad = sampling.pad_token_id

    def body(carry, step_rng):
        cache, mcache, token, done, t = carry
        token_in = jnp.where(done, pad, token)
        # positions: all three mrope axes advance together after the prompt
        pos_t = (P + deltas + t).astype(jnp.int32)[:, None]   # [B, 1]
        pos = (
            jnp.broadcast_to(pos_t, (3, B, 1)) if mrope else pos_t
        )
        seg = jnp.where(done, 0, 1).astype(jnp.int32)[:, None]
        dec_batch = {"input_ids": token_in[:, None], "position_ids": pos,
                     "segment_ids": seg}
        hidden, new_cache = bundle.apply(
            params, dec_batch, cache=cache, cache_mode="decode", **lora_kw,
        )
        logits = logits_fn(hidden)[:, 0]
        if mixture_params is not None:
            mh, new_mcache = bundle.apply(
                mixture_params, dec_batch, cache=mcache,
                cache_mode="decode",
            )
            logits = (
                (1.0 - mixture_coef) * jax.nn.log_softmax(logits, axis=-1)
                + mixture_coef
                * jax.nn.log_softmax(mix_logits_fn(mh)[:, 0], axis=-1)
            )
        else:
            new_mcache = mcache
        next_token = sample_token(step_rng, logits, sampling)
        emitted = jnp.where(done, pad, token)
        new_done = done | (token == eos)
        next_token = jnp.where(new_done, pad, next_token)
        return (new_cache, new_mcache, next_token, new_done, t + 1), emitted

    rngs = jax.random.split(rng, sampling.max_new_tokens)
    done0 = jnp.zeros((B,), bool)
    mix_cache0 = mix_cache if mixture_params is not None else None
    carry0 = (cache, mix_cache0, first_token, done0,
              jnp.zeros((), jnp.int32))
    if sampling.early_stop:
        # same per-step body, but exit as soon as every row is done; the
        # emitted-token buffer starts at pad, matching what the fixed-trip
        # scan writes for finished rows
        buf0 = jnp.full((sampling.max_new_tokens, B), pad, jnp.int32)

        def cond(state):
            (_, _, _, done, t), _ = state
            return (t < sampling.max_new_tokens) & ~jnp.all(done)

        def while_body(state):
            carry, buf = state
            t = carry[-1]
            new_carry, emitted = body(carry, rngs[t])
            buf = jax.lax.dynamic_update_index_in_dim(
                buf, emitted.astype(jnp.int32), t, axis=0)
            return new_carry, buf

        (_, tokens) = jax.lax.while_loop(cond, while_body, (carry0, buf0))
    else:
        _, tokens = jax.lax.scan(body, carry0, rngs)
    completion_ids = tokens.T                                  # [B, max_new]

    # mask: tokens up to and including the first EOS
    # (sc_grpo_trainer.py:722-726)
    is_eos = completion_ids == eos
    any_eos = is_eos.any(axis=1)
    first_eos = jnp.where(any_eos, jnp.argmax(is_eos, axis=1),
                          completion_ids.shape[1])
    idx = jnp.arange(completion_ids.shape[1])[None, :]
    completion_mask = (idx <= first_eos[:, None]).astype(jnp.int32)
    # positions past max_new with no EOS keep mask 1 (reference behavior)

    return {
        "completion_ids": completion_ids,
        "completion_mask": completion_mask,
        "prompt_ids": input_ids,
        "prompt_mask": attn_mask.astype(jnp.int32),
    }
