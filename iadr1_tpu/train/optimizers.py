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
    max_grad_norm: float = 1.0
    optimizer: str = "adamw"          # adamw | adafactor | sgd | lion


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
    schedule = make_schedule(cfg)
    if cfg.optimizer == "adamw":
        opt = optax.adamw(
            schedule, b1=cfg.b1, b2=cfg.b2, eps=cfg.eps,
            weight_decay=cfg.weight_decay,
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
