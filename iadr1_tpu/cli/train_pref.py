"""Preference-stage launcher: DPO (+ ORPO/SimPO/IPO/hinge), KTO, RM, PPO.

The TPU counterpart of the reference's stage dispatch
(llamafactory/train/tuner.py run_exp -> run_dpo / run_kto / run_rm /
run_ppo) over ranking / feedback datasets:

* dpo / rm rows: {"messages": [...prompt turns...],
                  "chosen": "...", "rejected": "..."}
  (llamafactory ranking sharegpt format; chosen/rejected may also be
  {"role": ..., "content": ...} dicts)
* kto rows: {"messages": [...full conversation...], "label": true|false}
  (feedback format: kto_tag)
* ppo rows: {"messages": [...prompt turns...], "solution": "..."} --
  prompts only; responses come from in-program rollout and are scored by
  ``pref.reward_funcs`` from the reward registry (standing in for the
  reference's reward model / reward server, ppo/trainer.py:239-263)

Usage:
    python -m iadr1_tpu.cli.train_pref --config configs/dpo.yaml \
        stage=dpo pref.beta=0.1 train.max_steps=100
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os

import numpy as np


@dataclasses.dataclass
class PrefSection:
    beta: float = 0.1                 # pref_beta
    loss_type: str = "sigmoid"        # sigmoid|hinge|ipo|orpo|simpo (dpo)
    label_smoothing: float = 0.0
    simpo_gamma: float = 0.5
    ftx: float = 0.0
    # rloo / online_dpo (rollout-based stages; trl rloo_config.py /
    # online_dpo_config.py defaults)
    num_generations: int = 4          # rloo_k (2 for online_dpo)
    max_completion_length: int = 128
    kl_coef: float = 0.05             # rloo KL (runs through k3 beta)
    missing_eos_penalty: float = 0.0  # online_dpo; 0 disables
    xpo_alpha: float = 1e-5           # xpo exploration coefficient
    mixture_coef: float = 0.5         # nash_md mixture opponent weight
    # bco/prm/gkd
    step_separator: str = "\n\n"      # prm step separator (trl default)
    gkd_beta: float = 0.5             # gkd JSD interpolant
    gkd_lmbda: float = 0.5            # gkd on-policy fraction
    gkd_temperature: float = 0.9
    teacher_model_name_or_path: str = ""   # gkd teacher checkpoint
    desirable_weight: float = 1.0     # kto
    undesirable_weight: float = 1.0   # kto
    ref_dtype: str = "bfloat16"
    reward_funcs: tuple = ("format", "accuracy")  # ppo reward registry


@dataclasses.dataclass
class PrefDataSection:
    dataset_name: str = ""
    template: str = "qwen2_vl"
    cutoff_len: int = 1024
    max_samples: int | None = None


@dataclasses.dataclass
class PrefJobConfig:
    stage: str = "dpo"                # dpo | kto | rm
    model: dict = dataclasses.field(default_factory=dict)
    data: PrefDataSection = dataclasses.field(default_factory=PrefDataSection)
    pref: PrefSection = dataclasses.field(default_factory=PrefSection)
    mesh: dict = dataclasses.field(default_factory=dict)
    optim: dict = dataclasses.field(default_factory=dict)
    train: dict = dataclasses.field(default_factory=dict)
    ppo: dict = dataclasses.field(default_factory=dict)  # PPOConfig fields


def _content(x) -> str:
    return x["content"] if isinstance(x, dict) else str(x)


def _pad_rows(rows, pad_id, length):
    """Right-pad encoded (ids, labels) rows into [N, length] arrays."""
    from iadr1_tpu.data.tokenize import IGNORE_INDEX

    ids = np.full((len(rows), length), pad_id, np.int32)
    labels = np.full((len(rows), length), IGNORE_INDEX, np.int32)
    segs = np.zeros((len(rows), length), np.int32)
    pos = np.zeros((len(rows), length), np.int32)
    for i, (seq, lab) in enumerate(rows):
        n = min(len(seq), length)
        ids[i, :n] = seq[:n]
        labels[i, :n] = lab[:n]
        segs[i, :n] = 1
        pos[i, :n] = np.arange(n)
    return ids, labels, segs, pos


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", required=True)
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from transformers import AutoTokenizer

    from iadr1_tpu.core import MeshConfig, build_mesh
    from iadr1_tpu.core.config import dataclass_from_dict, load_config
    from iadr1_tpu.core.distributed import maybe_initialize_distributed
    from iadr1_tpu.core.mesh import pytree_shardings
    from iadr1_tpu.data.template import get_template
    from iadr1_tpu.data.tokenize import (
        encode_pairwise_example,
        encode_supervised_example,
    )
    from iadr1_tpu.models.params_io import load_safetensors_path
    from iadr1_tpu.models.registry import bundle_from_hf_config, bundle_from_pretrained
    from iadr1_tpu.train import OptimizerConfig, make_optimizer
    from iadr1_tpu.train.checkpoint import CheckpointManager
    from iadr1_tpu.train.grpo import bundle_score_fn
    from iadr1_tpu.train.loop import JsonlLogger, LoopConfig
    from iadr1_tpu.train.preference import (
        DPOConfig,
        KTOConfig,
        init_value_head,
        make_dpo_step,
        make_kto_step,
        make_rm_step,
    )
    from iadr1_tpu.train.state import create_sharded_state

    maybe_initialize_distributed()
    cfg = load_config(PrefJobConfig, args.config, args.overrides)
    loop_cfg = dataclass_from_dict(LoopConfig, cfg.train)
    opt_cfg = dataclass_from_dict(OptimizerConfig, cfg.optim)
    if not opt_cfg.total_steps:
        opt_cfg = dataclasses.replace(opt_cfg, total_steps=loop_cfg.max_steps)
    _STAGES = ("dpo", "kto", "rm", "ppo", "rloo", "online_dpo", "xpo",
               "nash_md", "bco", "prm", "gkd")
    if cfg.stage not in _STAGES:
        raise ValueError(f"unknown stage {cfg.stage!r}; one of {_STAGES}")

    model_cfg = cfg.model
    dtype = getattr(jnp, model_cfg.get("dtype", "float32"))
    attention = model_cfg.get("attention", "auto")
    if model_cfg.get("hf_config"):
        bundle = bundle_from_hf_config(model_cfg["hf_config"],
                                       attention=attention)
        params = bundle.init_params(
            jax.random.PRNGKey(model_cfg.get("seed", 0)), dtype=dtype)
    else:
        bundle = bundle_from_pretrained(model_cfg["model_name_or_path"],
                                        attention=attention)
        params = bundle.convert_hf(
            load_safetensors_path(model_cfg["model_name_or_path"]),
            dtype=dtype)
    tokenizer = AutoTokenizer.from_pretrained(model_cfg["model_name_or_path"])
    template = get_template(cfg.data.template)
    pad_id = tokenizer.pad_token_id or tokenizer.eos_token_id

    with open(cfg.data.dataset_name) as f:
        raw = json.load(f)
    if cfg.data.max_samples:
        raw = raw[: cfg.data.max_samples]

    T = cfg.data.cutoff_len
    if cfg.stage in ("rloo", "online_dpo", "xpo", "nash_md"):
        # prompts-only rows, rollout-scored (trl rloo_trainer.py /
        # online_dpo_trainer.py / xpo_trainer.py / nash_md_trainer.py;
        # rewards stand in for the reward model / pairwise judge)
        from iadr1_tpu.rewards import get_reward_funcs
        from iadr1_tpu.train.grpo import GRPOConfig
        from iadr1_tpu.train.online_rl import (
            NashMDConfig,
            NashMDTrainer,
            OnlineDPOTrainer,
            RLOOTrainer,
            XPOConfig,
            XPOTrainer,
        )

        examples = []
        for row in raw:
            messages = row.get("messages", row.get("conversations"))
            if messages and messages[-1].get("role") == "assistant":
                messages = messages[:-1]
            ex = {k: v for k, v in row.items()
                  if k not in ("messages", "conversations")}
            ex["prompt_ids"] = template.encode_prompt(
                tokenizer, messages, system=row.get("system"))
            examples.append(ex)

        mesh = build_mesh(dataclass_from_dict(MeshConfig, cfg.mesh))
        params = jax.device_put(
            params, pytree_shardings(bundle.logical_axes(), mesh))
        optimizer, schedule = make_optimizer(opt_cfg)
        state = create_sharded_state(params, optimizer)
        funcs = get_reward_funcs(list(cfg.pref.reward_funcs))
        ref_dtype = getattr(jnp, cfg.pref.ref_dtype)
        ref_params = jax.tree.map(lambda x: x.astype(ref_dtype), params)

        if cfg.stage == "rloo":
            gcfg = GRPOConfig(
                num_generations=cfg.pref.num_generations,
                beta=cfg.pref.kl_coef,
                max_prompt_length=T,
                max_completion_length=cfg.pref.max_completion_length,
            )
            trainer = RLOOTrainer(bundle, tokenizer, optimizer, gcfg,
                                  funcs, state, ref_params,
                                  schedule=schedule)
        elif cfg.stage == "xpo":
            trainer = XPOTrainer(
                bundle, tokenizer, optimizer,
                XPOConfig(beta=cfg.pref.beta, alpha=cfg.pref.xpo_alpha),
                funcs, state, ref_params, max_prompt_length=T,
                max_completion_length=cfg.pref.max_completion_length,
                schedule=schedule,
            )
        elif cfg.stage == "nash_md":
            trainer = NashMDTrainer(
                bundle, tokenizer, optimizer,
                NashMDConfig(beta=cfg.pref.beta,
                             mixture_coef=cfg.pref.mixture_coef),
                funcs, state, ref_params, max_prompt_length=T,
                max_completion_length=cfg.pref.max_completion_length,
                schedule=schedule,
            )
        else:
            dcfg = DPOConfig(beta=cfg.pref.beta,
                             loss_type=cfg.pref.loss_type,
                             label_smoothing=cfg.pref.label_smoothing)
            trainer = OnlineDPOTrainer(
                bundle, tokenizer, optimizer, dcfg, funcs, state,
                ref_params, max_prompt_length=T,
                max_completion_length=cfg.pref.max_completion_length,
                schedule=schedule,
                missing_eos_penalty=cfg.pref.missing_eos_penalty or None,
            )

        logger = JsonlLogger(loop_cfg.output_dir, loop_cfg.max_steps)
        ckpt = CheckpointManager(
            os.path.join(loop_cfg.output_dir, "checkpoints"),
            max_to_keep=loop_cfg.keep_checkpoints,
        )
        rng = np.random.default_rng(loop_cfg.seed)
        bs = max(loop_cfg.batch_size, 1)
        for step_idx in range(1, loop_cfg.max_steps + 1):
            idx = rng.choice(len(examples), size=min(bs, len(examples)),
                             replace=False)
            metrics = trainer.step([examples[i] for i in idx])
            if step_idx % max(loop_cfg.logging_steps, 1) == 0:
                logger.log(step_idx, metrics)
            if loop_cfg.save_steps and step_idx % loop_cfg.save_steps == 0:
                ckpt.save(step_idx, trainer.state)
        ckpt.save(loop_cfg.max_steps, trainer.state)
        ckpt.wait()
        logger.close()
        return 0

    if cfg.stage == "gkd":
        # {messages} rows: last assistant turn is the dataset completion;
        # with prob lmbda the student generates its own (gkd_trainer.py)
        from iadr1_tpu.train.gkd import GKDConfig, GKDTrainer

        teacher_path = cfg.pref.teacher_model_name_or_path
        if not teacher_path:
            raise ValueError("stage=gkd needs pref.teacher_model_name_or_path")
        teacher_bundle = bundle_from_pretrained(teacher_path,
                                                attention=attention)
        teacher_params = teacher_bundle.convert_hf(
            load_safetensors_path(teacher_path), dtype=dtype)

        examples = []
        for row in raw:
            messages = row.get("messages", row.get("conversations"))
            completion = ""
            if messages and messages[-1].get("role") == "assistant":
                completion = messages[-1]["content"]
                messages = messages[:-1]
            examples.append({
                "prompt_ids": template.encode_prompt(
                    tokenizer, messages, system=row.get("system")),
                "completion_ids": tokenizer.encode(
                    completion, add_special_tokens=False),
            })

        mesh = build_mesh(dataclass_from_dict(MeshConfig, cfg.mesh))
        params = jax.device_put(
            params, pytree_shardings(bundle.logical_axes(), mesh))
        teacher_params = jax.device_put(
            teacher_params,
            pytree_shardings(teacher_bundle.logical_axes(), mesh))
        optimizer, schedule = make_optimizer(opt_cfg)
        state = create_sharded_state(params, optimizer)
        gkd_cfg = GKDConfig(
            beta=cfg.pref.gkd_beta, temperature=cfg.pref.gkd_temperature,
            lmbda=cfg.pref.gkd_lmbda, max_prompt_length=T,
            max_completion_length=cfg.pref.max_completion_length,
        )
        trainer = GKDTrainer(bundle, teacher_bundle, tokenizer, optimizer,
                             gkd_cfg, state, teacher_params,
                             schedule=schedule, seed=loop_cfg.seed)
        logger = JsonlLogger(loop_cfg.output_dir, loop_cfg.max_steps)
        ckpt = CheckpointManager(
            os.path.join(loop_cfg.output_dir, "checkpoints"),
            max_to_keep=loop_cfg.keep_checkpoints,
        )
        rng = np.random.default_rng(loop_cfg.seed)
        bs = max(loop_cfg.batch_size, 1)
        for step_idx in range(1, loop_cfg.max_steps + 1):
            idx = rng.choice(len(examples), size=min(bs, len(examples)),
                             replace=False)
            metrics = trainer.step([examples[i] for i in idx])
            if step_idx % max(loop_cfg.logging_steps, 1) == 0:
                logger.log(step_idx, metrics)
            if loop_cfg.save_steps and step_idx % loop_cfg.save_steps == 0:
                ckpt.save(step_idx, trainer.state)
        ckpt.save(loop_cfg.max_steps, trainer.state)
        ckpt.wait()
        logger.close()
        return 0

    if cfg.stage == "ppo":
        from iadr1_tpu.core.config import dataclass_from_dict as _dfd
        from iadr1_tpu.rewards import get_reward_funcs
        from iadr1_tpu.train.ppo import (
            PPOConfig,
            PPOTrainer,
            make_ppo_state_params,
        )
        from iadr1_tpu.train.state import create_sharded_state as _css

        examples = []
        for row in raw:
            messages = row.get("messages", row.get("conversations"))
            if messages and messages[-1].get("role") == "assistant":
                messages = messages[:-1]   # prompts only; rollout answers
            ex = {k: v for k, v in row.items()
                  if k not in ("messages", "conversations")}
            ex["prompt_ids"] = template.encode_prompt(
                tokenizer, messages, system=row.get("system"))
            examples.append(ex)

        mesh = build_mesh(dataclass_from_dict(MeshConfig, cfg.mesh))
        params = jax.device_put(
            params, pytree_shardings(bundle.logical_axes(), mesh))
        optimizer, schedule = make_optimizer(opt_cfg)
        tcfg = getattr(bundle.cfg, "text", bundle.cfg)
        full_params = make_ppo_state_params(
            params, tcfg.hidden_size, jax.random.PRNGKey(1))
        state = create_sharded_state(full_params, optimizer)

        funcs = get_reward_funcs(list(cfg.pref.reward_funcs))
        extra_keys = {k for ex in examples for k in ex if k != "prompt_ids"}

        def reward_fn(texts, batch_examples):
            completions = [[{"role": "assistant", "content": t}] for t in texts]
            kwargs = {k: [ex.get(k) for ex in batch_examples]
                      for k in extra_keys}
            total = np.zeros(len(texts))
            for fn in funcs:
                total += np.asarray(
                    fn(completions=completions, current_step=0, **kwargs),
                    np.float64)
            return total

        ppo_cfg = _dfd(PPOConfig, cfg.ppo)
        # distinct frozen ref copy: state is donated into the update step,
        # so the reference cannot alias state.params["model"] buffers
        ref_dtype = getattr(jnp, cfg.pref.ref_dtype)
        ref_params = jax.tree.map(lambda x: x.astype(ref_dtype), params)
        trainer = PPOTrainer(bundle, tokenizer, optimizer, ppo_cfg,
                             reward_fn, state, ref_params, schedule=schedule)
        logger = JsonlLogger(loop_cfg.output_dir, loop_cfg.max_steps)
        ckpt = CheckpointManager(
            os.path.join(loop_cfg.output_dir, "checkpoints"),
            max_to_keep=loop_cfg.keep_checkpoints,
        )
        rng = np.random.default_rng(loop_cfg.seed)
        bs = max(loop_cfg.batch_size, 1)
        for step_idx in range(1, loop_cfg.max_steps + 1):
            idx = rng.choice(len(examples), size=min(bs, len(examples)),
                             replace=False)
            metrics = trainer.step([examples[i] for i in idx])
            if step_idx % max(loop_cfg.logging_steps, 1) == 0:
                logger.log(step_idx, metrics)
            if loop_cfg.save_steps and step_idx % loop_cfg.save_steps == 0:
                ckpt.save(step_idx, trainer.state)
        ckpt.save(loop_cfg.max_steps, trainer.state)
        ckpt.wait()
        logger.close()
        return 0

    if cfg.stage in ("dpo", "rm"):
        pairs = []
        for row in raw:
            messages = row.get("messages", row.get("conversations"))
            pairs.append(encode_pairwise_example(
                messages, _content(row["chosen"]), _content(row["rejected"]),
                template, tokenizer, system=row.get("system"), cutoff_len=T,
            ))
        chosen = [p[0] for p in pairs]
        rejected = [p[1] for p in pairs]

        def collate(idx):
            rows = [chosen[i] for i in idx] + [rejected[i] for i in idx]
            ids, labels, segs, pos = _pad_rows(rows, pad_id, T)
            return {"input_ids": jnp.asarray(ids),
                    "labels": jnp.asarray(labels),
                    "segment_ids": jnp.asarray(segs),
                    "position_ids": jnp.asarray(pos)}
    elif cfg.stage == "bco":
        # feedback rows like kto ({messages, label}) but no mismatched KL
        # sequences -- BCO's baseline is the running reward delta
        encoded, tags = [], []
        for row in raw:
            messages = row.get("messages", row.get("conversations"))
            encoded.append(encode_supervised_example(
                messages, template, tokenizer, system=row.get("system"),
                cutoff_len=T))
            tags.append(bool(row.get("label", row.get("kto_tag", True))))
        tags = np.asarray(tags)

        def collate(idx):
            rows = [encoded[i] for i in idx]
            ids, labels, segs, pos = _pad_rows(rows, pad_id, T)
            return {"input_ids": jnp.asarray(ids),
                    "labels": jnp.asarray(labels),
                    "segment_ids": jnp.asarray(segs),
                    "position_ids": jnp.asarray(pos),
                    "tags": jnp.asarray(tags[idx].astype(np.int32))}
    elif cfg.stage == "prm":
        # stepwise rows: {"prompt": str | messages, "completions":
        # [str, ...], "labels": [bool, ...]} (trl prm_trainer.py)
        from iadr1_tpu.train.preference import encode_prm_example

        sep_ids = tokenizer.encode(cfg.pref.step_separator,
                                   add_special_tokens=False)
        encoded = []
        for row in raw:
            prompt = row["prompt"]
            if isinstance(prompt, list):
                prompt_ids = template.encode_prompt(tokenizer, prompt)
            else:
                prompt_ids = tokenizer.encode(prompt,
                                              add_special_tokens=False)
            completions_ids = [
                tokenizer.encode(c, add_special_tokens=False)
                for c in row["completions"]
            ]
            ids, labels = encode_prm_example(
                prompt_ids, completions_ids, row["labels"], sep_ids)
            encoded.append((ids[:T], labels[:T]))

        def collate(idx):
            rows = [encoded[i] for i in idx]
            ids, labels, segs, pos = _pad_rows(rows, pad_id, T)
            return {"input_ids": jnp.asarray(ids),
                    "labels": jnp.asarray(labels),
                    "segment_ids": jnp.asarray(segs),
                    "position_ids": jnp.asarray(pos)}
    else:  # kto
        encoded, tags = [], []
        for row in raw:
            messages = row.get("messages", row.get("conversations"))
            encoded.append(encode_supervised_example(
                messages, template, tokenizer, system=row.get("system"),
                cutoff_len=T))
            tags.append(bool(row.get("label", row.get("kto_tag", True))))
        tags = np.asarray(tags)

        def collate(idx):
            rows = [encoded[i] for i in idx]
            ids, labels, segs, pos = _pad_rows(rows, pad_id, T)
            # mismatched completions for the KL baseline: shift by one
            roll = np.roll(idx, 1)
            kl_rows = [encoded[i] for i in roll]
            kids, klabels, ksegs, kpos = _pad_rows(kl_rows, pad_id, T)
            return {"input_ids": jnp.asarray(ids),
                    "labels": jnp.asarray(labels),
                    "segment_ids": jnp.asarray(segs),
                    "position_ids": jnp.asarray(pos),
                    "kl_input_ids": jnp.asarray(kids),
                    "kl_labels": jnp.asarray(klabels),
                    "kl_segment_ids": jnp.asarray(ksegs),
                    "kl_position_ids": jnp.asarray(kpos),
                    "tags": jnp.asarray(tags[idx].astype(np.int32))}

    mesh = build_mesh(dataclass_from_dict(MeshConfig, cfg.mesh))
    params = jax.device_put(params, pytree_shardings(bundle.logical_axes(), mesh))
    optimizer, schedule = make_optimizer(opt_cfg)

    if cfg.stage == "rm":
        tcfg = getattr(bundle.cfg, "text", bundle.cfg)
        full_params = {
            "model": params,
            "value_head": init_value_head(
                jax.random.PRNGKey(1), tcfg.hidden_size, dtype),
        }
        state = create_sharded_state(full_params, optimizer)
        step = make_rm_step(
            lambda p, b: bundle.hidden_fn(p, b), optimizer, schedule)
        ref_params = None
    elif cfg.stage == "prm":
        from iadr1_tpu.train.preference import init_prm_head, make_prm_step

        tcfg = getattr(bundle.cfg, "text", bundle.cfg)
        full_params = {
            "model": params,
            "prm_head": init_prm_head(
                jax.random.PRNGKey(1), tcfg.hidden_size, dtype=dtype),
        }
        state = create_sharded_state(full_params, optimizer)
        step = make_prm_step(
            lambda p, b: bundle.hidden_fn(p, b), optimizer, schedule)
        ref_params = None
    elif cfg.stage == "bco":
        from iadr1_tpu.train.preference import BCOConfig, make_bco_step

        state = create_sharded_state(params, optimizer)
        ref_dtype = getattr(jnp, cfg.pref.ref_dtype)
        ref_params = jax.tree.map(lambda x: x.astype(ref_dtype), params)
        step = make_bco_step(
            bundle_score_fn(bundle), optimizer,
            BCOConfig(beta=cfg.pref.beta), schedule)
    else:
        state = create_sharded_state(params, optimizer)
        ref_dtype = getattr(jnp, cfg.pref.ref_dtype)
        if cfg.stage == "dpo":
            dcfg = DPOConfig(
                beta=cfg.pref.beta, loss_type=cfg.pref.loss_type,
                label_smoothing=cfg.pref.label_smoothing,
                simpo_gamma=cfg.pref.simpo_gamma, ftx=cfg.pref.ftx,
            )
            step = make_dpo_step(bundle_score_fn(bundle), optimizer, dcfg,
                                 schedule)
            ref_params = (
                jax.tree.map(lambda x: x.astype(ref_dtype), params)
                if dcfg.use_ref_model else {}
            )
        else:
            kcfg = KTOConfig(
                beta=cfg.pref.beta,
                desirable_weight=cfg.pref.desirable_weight,
                undesirable_weight=cfg.pref.undesirable_weight,
            )
            step = make_kto_step(bundle_score_fn(bundle), optimizer, kcfg,
                                 schedule)
            ref_params = jax.tree.map(lambda x: x.astype(ref_dtype), params)

    logger = JsonlLogger(loop_cfg.output_dir, loop_cfg.max_steps)
    ckpt = CheckpointManager(
        os.path.join(loop_cfg.output_dir, "checkpoints"),
        max_to_keep=loop_cfg.keep_checkpoints,
    )
    rng = np.random.default_rng(loop_cfg.seed)
    n = len(raw)
    bs = max(loop_cfg.batch_size, 1)
    if cfg.stage == "bco":
        from iadr1_tpu.train.preference import RunningMoments

        running = RunningMoments()
    for step_idx in range(1, loop_cfg.max_steps + 1):
        idx = rng.choice(n, size=min(bs, n), replace=False)
        batch = collate(idx)
        if cfg.stage in ("rm", "prm"):
            state, metrics = step(state, batch)
        elif cfg.stage == "bco":
            state, metrics = step(state, ref_params, batch,
                                  jnp.asarray(running.mean, jnp.float32))
            running.update(float(metrics["reward_mean"]),
                           float(metrics["reward_var"]),
                           float(metrics["reward_count"]))
        else:
            state, metrics = step(state, ref_params, batch)
        if step_idx % max(loop_cfg.logging_steps, 1) == 0:
            logger.log(step_idx, {k: float(v) for k, v in metrics.items()})
        if loop_cfg.save_steps and step_idx % loop_cfg.save_steps == 0:
            ckpt.save(step_idx, state)
    ckpt.save(loop_cfg.max_steps, state)
    ckpt.wait()
    logger.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
