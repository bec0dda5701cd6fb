"""Step-based learning-rate schedules.

Rebuilds the reference's three schedules exactly
(/root/reference/main_vg.py:269-287, util/lr_scheduler.py:19-52), all
expressed as multipliers on the per-group base LR, stepped every optimizer
step (the reference calls lr_scheduler.step() per step, engine_vg.py:67):

  * StepLR: 0.1 ** floor(step / (steps_per_epoch * lr_drop))
  * MultiStepWarmupLR: linear warmup then 0.1 ** #milestones-passed,
    floored at min_decay_rate=0.01
  * CosineWarmupLR: linear warmup then half-cosine to 0, floored at 0.01

Schedules are pure functions of the step count, so resume reproduces the
reference's LR-override-on-resume behavior (main_vg.py:320-336) by
construction.
"""

from __future__ import annotations

import math
from typing import Callable, Sequence

import jax.numpy as jnp

from reftr_tpu.core.config import TrainConfig

Schedule = Callable[[jnp.ndarray], jnp.ndarray]


def step_lr(step_size: int, gamma: float = 0.1) -> Schedule:
    def fn(step):
        return gamma ** jnp.floor(step / step_size)

    return fn


def multistep_warmup_lr(
    lr_milestones: Sequence[int],
    warm_up_steps: int,
    decay_rate: float = 0.1,
    min_decay_rate: float = 0.01,
) -> Schedule:
    milestones = jnp.asarray(list(lr_milestones), jnp.float32)

    def fn(step):
        warm = (step + 1.0) / warm_up_steps
        n_passed = (milestones <= step).sum().astype(jnp.float32)
        decayed = decay_rate ** n_passed
        rate = jnp.where(step < warm_up_steps, warm, decayed)
        return jnp.where(rate <= min_decay_rate, min_decay_rate, rate)

    return fn


def cosine_warmup_lr(
    max_t: int, warm_up_steps: int, min_decay_rate: float = 0.01
) -> Schedule:
    def fn(step):
        warm = (step + 1.0) / warm_up_steps
        cos = 0.5 * (jnp.cos(
            (step - warm_up_steps) / (max_t - warm_up_steps) * math.pi) + 1.0)
        rate = jnp.where(step < warm_up_steps, warm, cos)
        return jnp.where(rate <= min_decay_rate, min_decay_rate, rate)

    return fn


def build_schedule(cfg: TrainConfig, steps_per_epoch: int) -> Schedule:
    if cfg.lr_schedule == "StepLR":
        return step_lr(steps_per_epoch * cfg.lr_drop)
    if cfg.lr_schedule == "MultiStepWarmupLR":
        milestones = [steps_per_epoch * e for e in (cfg.lr_drop_epochs or ())]
        return multistep_warmup_lr(
            milestones, steps_per_epoch * cfg.warm_up_epoch,
            decay_rate=cfg.lr_decay)
    if cfg.lr_schedule == "CosineWarmupLR":
        return cosine_warmup_lr(
            steps_per_epoch * cfg.epochs, steps_per_epoch * cfg.warm_up_epoch)
    raise ValueError(f"unknown lr_schedule {cfg.lr_schedule!r}")
