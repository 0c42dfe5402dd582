"""LR schedules: linear warmup into the reference's scheduler family
(FABind/fabind/main_fabind.py:256-287: constant | poly_decay | cosine_decay |
cosine_decay_restart | exp_decay, all stepped per-batch after warmup_epochs).
"""
from __future__ import annotations

import optax

from fabind_tpu.config import TrainConfig


def build_schedule(cfg: TrainConfig) -> optax.Schedule:
    warmup_steps = cfg.warmup_epochs * cfg.steps_per_epoch
    main_steps = max(
        (cfg.total_epochs - cfg.warmup_epochs) * cfg.steps_per_epoch, 1)
    warmup = optax.linear_schedule(0.0, cfg.lr, warmup_steps)
    name = cfg.lr_scheduler
    if name == "constant":
        main = optax.constant_schedule(cfg.lr)
    elif name == "poly_decay":
        main = optax.polynomial_schedule(cfg.lr, 0.0, power=1.0,
                                         transition_steps=main_steps)
    elif name == "exp_decay":
        main = optax.exponential_decay(cfg.lr, main_steps, 0.01)
    elif name == "cosine_decay":
        main = optax.cosine_decay_schedule(cfg.lr, main_steps)
    elif name == "cosine_decay_restart":
        n_restarts = 4
        per = max(main_steps // n_restarts, 1)
        scheds = [optax.cosine_decay_schedule(cfg.lr, per)
                  for _ in range(n_restarts)]
        main = optax.join_schedules(scheds, [per * (i + 1)
                                             for i in range(n_restarts - 1)])
    else:
        raise ValueError(name)
    return optax.join_schedules([warmup, main], [warmup_steps])


def build_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    """Adam/AdamW + optional global-norm clip (main_fabind.py:256-262,419-423)."""
    sched = build_schedule(cfg)
    if cfg.optim == "adamw":
        opt = optax.adamw(sched, weight_decay=cfg.weight_decay)
    elif cfg.optim == "adam":
        opt = optax.adam(sched)
    else:
        raise ValueError(cfg.optim)
    parts = []
    if cfg.clip_grad:
        parts.append(optax.clip_by_global_norm(1.0))
    parts.append(opt)
    if cfg.gradient_accumulate_step > 1:
        return optax.MultiSteps(optax.chain(*parts),
                                cfg.gradient_accumulate_step)
    return optax.chain(*parts)
