"""Optimizers and LR schedules.

Covers the reference recipe's optimization envelope: AdamW with cosine or
linear schedules and warmup (PA_SFT scripts: --lr_scheduler_type cosine,
--warmup_ratio 0.1, --learning_rate 1e-5/2e-7), gradient clipping, and
weight decay; plus the custom-optimizer hook point mirroring
llamafactory/train/trainer_utils.py create_custom_optimizer.
"""

from __future__ import annotations

import dataclasses

import optax


@dataclasses.dataclass(frozen=True)
class OptimizerConfig:
    learning_rate: float = 1e-5
    schedule: str = "cosine"          # cosine | linear | constant
    warmup_ratio: float = 0.1
    warmup_steps: int | None = None   # overrides warmup_ratio when set
    total_steps: int = 0              # 0: CLIs fill in train.max_steps; set
    # explicitly to decouple the schedule horizon from the run length
    # (needed so an interrupted run resumes onto the same LR curve)
    min_lr_ratio: float = 0.0
    weight_decay: float = 0.0
    b1: float = 0.9
    b2: float = 0.999
    eps: float = 1e-8
    # dtype of the Adam first moment ("bfloat16" halves optimizer HBM for
    # the m buffer; v stays f32 for rsqrt precision)
    mu_dtype: str | None = None
    max_grad_norm: float = 1.0
    # adamw | adafactor | sgd | lion | galore | apollo | badam | adam_mini | muon
    optimizer: str = "adamw"
    # custom-optimizer knobs (llamafactory finetuning_args names/defaults)
    galore_rank: int = 16
    galore_update_interval: int = 200
    galore_scale: float = 0.25
    apollo_rank: int = 16
    apollo_update_interval: int = 200
    apollo_scale: float = 1.0
    apollo_scale_type: str = "channel"   # channel | tensor (apollo-mini)
    badam_switch_interval: int = 50
    badam_switch_mode: str = "ascending"
    badam_num_layers: int = 0            # 0: infer from stacked kernels
    adam_mini_head_dim: int = 0          # 0: per-neuron v for q/k too
    loraplus_lr_ratio: float = 0.0       # >0 enables LoRA+ grouping
    loraplus_lr_embedding: float = 1e-6


def make_schedule(cfg: OptimizerConfig) -> optax.Schedule:
    warmup = (
        cfg.warmup_steps
        if cfg.warmup_steps is not None
        else int(cfg.total_steps * cfg.warmup_ratio)
    )
    peak = cfg.learning_rate
    end = peak * cfg.min_lr_ratio
    decay_steps = max(cfg.total_steps - warmup, 1)
    if cfg.schedule == "cosine":
        decay = optax.cosine_decay_schedule(peak, decay_steps, alpha=cfg.min_lr_ratio)
    elif cfg.schedule == "linear":
        decay = optax.linear_schedule(peak, end, decay_steps)
    elif cfg.schedule == "constant":
        decay = optax.constant_schedule(peak)
    else:
        raise ValueError(f"unknown schedule {cfg.schedule!r}")
    if warmup == 0:
        return decay
    return optax.join_schedules(
        [optax.linear_schedule(0.0, peak, warmup), decay], [warmup]
    )


def make_optimizer(cfg: OptimizerConfig) -> tuple[optax.GradientTransformation, optax.Schedule]:
    from iadr1_tpu.train import custom_optim

    schedule = make_schedule(cfg)
    if cfg.loraplus_lr_ratio and cfg.loraplus_lr_ratio > 0:
        opt = custom_optim.loraplus(
            schedule, lr_ratio=cfg.loraplus_lr_ratio,
            lr_embedding=cfg.loraplus_lr_embedding,
            b1=cfg.b1, b2=cfg.b2, eps=cfg.eps,
            weight_decay=cfg.weight_decay,
        )
        if cfg.max_grad_norm and cfg.max_grad_norm > 0:
            opt = optax.chain(optax.clip_by_global_norm(cfg.max_grad_norm), opt)
        return opt, schedule
    if cfg.optimizer in ("galore", "apollo", "badam", "adam_mini"):
        scaler = {
            "galore": lambda: custom_optim.scale_by_galore(
                rank=cfg.galore_rank, update_proj_gap=cfg.galore_update_interval,
                scale=cfg.galore_scale, b1=cfg.b1, b2=cfg.b2, eps=cfg.eps),
            "apollo": lambda: custom_optim.scale_by_apollo(
                rank=cfg.apollo_rank, update_proj_gap=cfg.apollo_update_interval,
                scale=cfg.apollo_scale, scale_type=cfg.apollo_scale_type,
                b1=cfg.b1, b2=cfg.b2, eps=cfg.eps),
            "badam": lambda: custom_optim.scale_by_badam(
                num_layers=cfg.badam_num_layers or None,
                switch_interval=cfg.badam_switch_interval,
                switch_mode=cfg.badam_switch_mode,
                b1=cfg.b1, b2=cfg.b2, eps=cfg.eps),
            "adam_mini": lambda: custom_optim.scale_by_adam_mini(
                b1=cfg.b1, b2=cfg.b2, eps=cfg.eps,
                head_dim=cfg.adam_mini_head_dim or None),
        }[cfg.optimizer]()
        parts = []
        if cfg.max_grad_norm and cfg.max_grad_norm > 0:
            parts.append(optax.clip_by_global_norm(cfg.max_grad_norm))
        parts.append(scaler)
        if cfg.weight_decay:
            parts.append(optax.add_decayed_weights(cfg.weight_decay))
        parts.append(optax.scale_by_learning_rate(schedule))
        return optax.chain(*parts), schedule
    if cfg.optimizer == "muon":
        opt = custom_optim.muon(
            schedule, weight_decay=cfg.weight_decay,
            adam_b1=cfg.b1, adam_b2=cfg.b2,
        )
        if cfg.max_grad_norm and cfg.max_grad_norm > 0:
            opt = optax.chain(optax.clip_by_global_norm(cfg.max_grad_norm), opt)
        return opt, schedule
    if cfg.optimizer == "adamw":
        opt = optax.adamw(
            schedule, b1=cfg.b1, b2=cfg.b2, eps=cfg.eps,
            weight_decay=cfg.weight_decay, mu_dtype=cfg.mu_dtype,
        )
    elif cfg.optimizer == "adafactor":
        opt = optax.adafactor(schedule)
    elif cfg.optimizer == "lion":
        opt = optax.lion(schedule, weight_decay=cfg.weight_decay)
    elif cfg.optimizer == "sgd":
        opt = optax.sgd(schedule)
    else:
        raise ValueError(f"unknown optimizer {cfg.optimizer!r}")
    if cfg.max_grad_norm and cfg.max_grad_norm > 0:
        opt = optax.chain(optax.clip_by_global_norm(cfg.max_grad_norm), opt)
    return opt, schedule
