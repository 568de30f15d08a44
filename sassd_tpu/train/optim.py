"""Optimizer + one-cycle schedules (optax).

Equivalent of the reference's fastai `adam_onecycle` stack
(/root/reference/tools/train_utils/optimization/__init__.py:9-34,
fastai_optim.py, learning_schedules_fastai.py:52-75):

  * AdamW (decoupled "true" weight decay, applied to every parameter —
    the reference passes bn_wd=True), betas (b1 scheduled, b2=0.99)
  * one-cycle cosine lr: lr_max/div_factor -> lr_max over pct_start of
    training, then -> lr_max/div_factor/1e4
  * inverse one-cycle momentum (b1): moms[0] -> moms[1] -> moms[0]
  * global-norm gradient clipping before the update (max_norm=10,
    car_cfg.py:200 / train_utils/__init__.py:60)

Both schedules are optax schedules over the optimizer step count, so the
whole update rule lives inside the jitted train step (the reference mutates
optimizer hyper-parameters from python every iteration).
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import optax

from sassd_tpu.config import TrainConfig


def annealing_cos(start: float, end: float, pct):
    """Cosine anneal (learning_schedules_fastai.py:52-56)."""
    cos_out = jnp.cos(jnp.pi * pct) + 1.0
    return end + (start - end) / 2.0 * cos_out


def one_cycle_lr(lr_max: float, div_factor: float, pct_start: float,
                 total_steps: int):
    low = lr_max / div_factor
    split = int(total_steps * pct_start)

    def schedule(count):
        count = jnp.minimum(count, total_steps)
        pct1 = count / jnp.maximum(split, 1)
        pct2 = (count - split) / jnp.maximum(total_steps - split, 1)
        return jnp.where(count < split,
                         annealing_cos(low, lr_max, pct1),
                         annealing_cos(lr_max, low / 1e4, pct2))

    return schedule


def one_cycle_momentum(moms: Tuple[float, float], pct_start: float,
                       total_steps: int):
    split = int(total_steps * pct_start)

    def schedule(count):
        count = jnp.minimum(count, total_steps)
        pct1 = count / jnp.maximum(split, 1)
        pct2 = (count - split) / jnp.maximum(total_steps - split, 1)
        return jnp.where(count < split,
                         annealing_cos(moms[0], moms[1], pct1),
                         annealing_cos(moms[1], moms[0], pct2))

    return schedule


def make_optimizer(cfg: TrainConfig, total_steps: int,
                   kind: str = "adam_onecycle") -> optax.GradientTransformation:
    """Build the optimizer; `kind` mirrors the reference's registry
    (optimization/__init__.py:9-16: adam_onecycle / adam / sgd)."""
    clip = optax.clip_by_global_norm(cfg.grad_clip_norm)
    if kind == "adam_onecycle":
        lr = one_cycle_lr(cfg.lr, cfg.div_factor, cfg.pct_start, total_steps)
        mom = one_cycle_momentum(cfg.moms, cfg.pct_start, total_steps)
        return optax.chain(
            clip,
            optax.inject_hyperparams(optax.adamw)(
                learning_rate=lr, b1=mom, b2=0.99, eps=1e-8,
                weight_decay=cfg.weight_decay),
        )
    if kind == "adam":
        return optax.chain(clip, optax.inject_hyperparams(optax.adamw)(
            learning_rate=cfg.lr, weight_decay=cfg.weight_decay))
    if kind == "sgd":
        return optax.chain(clip, optax.inject_hyperparams(optax.sgd)(
            learning_rate=cfg.lr, momentum=cfg.moms[0]))
    raise ValueError(f"unknown optimizer kind {kind!r}")


def current_hyperparams(opt_state):
    """(lr, b1) actually applied at the last step (for logging)."""
    hp = opt_state[1].hyperparams
    return float(hp["learning_rate"]), float(hp.get("b1", 0.0))
