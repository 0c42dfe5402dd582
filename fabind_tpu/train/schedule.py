"""LR schedules: linear warmup into the reference's scheduler family
(FABind/fabind/main_fabind.py:256-287: constant | poly_decay | cosine_decay |
cosine_decay_restart | exp_decay, all stepped per-batch after warmup_epochs).
"""
from __future__ import annotations

import optax

from fabind_tpu.config import TrainConfig


def build_schedule(cfg: TrainConfig) -> optax.Schedule:
    """Reference-exact scheduler family (main_fabind.py:263-287):
    - warmup: LinearLR(start_factor=0.5) — 0.5*lr -> lr, NOT from zero;
    - exp_decay: ExponentialLR(gamma=0.995) per step;
    - cosine_decay: CosineAnnealingLR(eta_min=1e-5);
    - cosine_decay_restart: CosineAnnealingWarmRestarts(T_0=10,
      eta_min=1e-4) — a 10-STEP restart period (the reference steps the
      scheduler per batch, so T_0 counts batches, not epochs).
    With gradient accumulation the reference also steps the scheduler once
    per optimizer update (training.py:109-112), matching MultiSteps'
    per-update schedule advance — no horizon correction needed."""
    warmup_steps = cfg.warmup_epochs * cfg.steps_per_epoch
    main_steps = max(
        (cfg.total_epochs - cfg.warmup_epochs) * cfg.steps_per_epoch, 1)
    warmup = optax.linear_schedule(0.5 * cfg.lr, cfg.lr, warmup_steps)
    name = cfg.lr_scheduler
    if name == "constant":
        main = optax.constant_schedule(cfg.lr)
    elif name == "poly_decay":
        main = optax.polynomial_schedule(cfg.lr, 0.0, power=1.0,
                                         transition_steps=main_steps)
    elif name == "exp_decay":
        main = optax.exponential_decay(cfg.lr, transition_steps=1,
                                       decay_rate=0.995)
    elif name == "cosine_decay":
        main = optax.cosine_decay_schedule(cfg.lr, main_steps,
                                           alpha=1e-5 / cfg.lr)
    elif name == "cosine_decay_restart":
        import jax.numpy as jnp
        t0, eta = 10, 1e-4

        def main(t):
            tc = jnp.mod(t, t0)
            return eta + 0.5 * (cfg.lr - eta) * (
                1 + jnp.cos(jnp.pi * tc / t0))
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
