"""Optimizer + one-cycle schedules (optax).

Equivalent of the reference's fastai `adam_onecycle` stack
(/root/reference/tools/train_utils/optimization/__init__.py:9-34,
fastai_optim.py, learning_schedules_fastai.py:52-87):

  * AdamW (decoupled "true" weight decay), betas (b1 scheduled, b2=0.99).
    Weight-decay scope is configurable (`TrainConfig.weight_decay_mode`):
    "exclude_bn_bias" (default) decays only conv/linear kernels, leaving
    BatchNorm scales/biases and all biases undecayed — the fastai
    OptimWrapper recipe the reference's optimizer stack is built on
    (fastai_optim.py:13-24 `split_bn_bias` + the true_wd step :135-145);
    "all" decays every parameter, which is what the reference's own call
    site actually selects (`bn_wd=True`, optimization/__init__.py:29).
  * one-cycle cosine lr: lr_max/div_factor -> lr_max over pct_start of
    training, then -> lr_max/div_factor/1e4
  * inverse one-cycle momentum (b1): moms[0] -> moms[1] -> moms[0]
  * optional cosine warmup prefix (`warmup_iters`/`warmup_ratio`): lr rises
    lr*ratio -> lr along a half-cosine over the first warmup_iters steps
    (CosineWarmupLR, learning_schedules_fastai.py:78-87, wired by the
    reference's `if 'warmup' in lr_cfg` path, optimization/__init__.py:57-61)
  * global-norm gradient clipping before the update (max_norm=10,
    car_cfg.py:200 / train_utils/__init__.py:60)

All schedules are optax schedules over the optimizer step count, so the
whole update rule lives inside the jitted train step (the reference mutates
optimizer hyper-parameters from python every iteration).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import optax

from sassd_tpu.config import TrainConfig


def weight_decay_mask(params):
    """True for leaves that receive weight decay: conv/linear kernels only.

    In this framework's parameter pytrees every trainable kernel lives under
    a "w" key (models/layers.py: linear_init/conv2d_init/sparse_conv3_init);
    biases are "b" and BatchNorm parameters are "scale"/"bias". Masking on
    the leaf key therefore reproduces fastai's `split_bn_bias` grouping
    (BN params + biases -> no true weight decay) exactly.
    """
    return jax.tree_util.tree_map_with_path(
        lambda path, _: getattr(path[-1], "key", None) == "w", params)


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


def cosine_warmup(base_lr: float, warmup_iters: int, warmup_ratio: float,
                  after_schedule):
    """Half-cosine warmup prefix: lr*ratio -> lr over warmup_iters, then
    `after_schedule(count)` (CosineWarmupLR.get_lr semantics,
    learning_schedules_fastai.py:84-87: eta_min + (lr-eta_min) *
    (1 - cos(pi*t/T))/2)."""
    eta_min = base_lr * warmup_ratio

    def schedule(count):
        pct = jnp.clip(count / jnp.maximum(warmup_iters, 1), 0.0, 1.0)
        warm = eta_min + (base_lr - eta_min) * (1.0 - jnp.cos(jnp.pi * pct)) / 2.0
        after = after_schedule(count) if callable(after_schedule) \
            else after_schedule
        return jnp.where(count < warmup_iters, warm, after)

    return schedule


def cosine_annealing(base_lr: float, total_steps: int):
    """torch CosineAnnealingLR (the reference's lr_cfg.policy == 'cosine',
    optimization/__init__.py:47-49): lr * (1 + cos(pi*t/T)) / 2."""
    def schedule(count):
        pct = jnp.clip(count / jnp.maximum(total_steps, 1), 0.0, 1.0)
        return base_lr * (1.0 + jnp.cos(jnp.pi * pct)) / 2.0
    return schedule


def make_optimizer(cfg: TrainConfig, total_steps: int,
                   kind: str = "adam_onecycle") -> optax.GradientTransformation:
    """Build the optimizer; `kind` mirrors the reference's registry
    (optimization/__init__.py:9-16: adam_onecycle / adam / sgd, plus
    adam_cosine = the 'cosine' lr policy; a warmup prefix applies to the
    non-onecycle kinds when cfg.warmup_iters > 0)."""
    clip = optax.clip_by_global_norm(cfg.grad_clip_norm)
    mode = getattr(cfg, "weight_decay_mode", "exclude_bn_bias")
    if mode == "exclude_bn_bias":
        mask = weight_decay_mask
    elif mode == "all":
        mask = None
    else:
        raise ValueError(f"unknown weight_decay_mode {mode!r}")
    adamw = optax.inject_hyperparams(optax.adamw, static_args=("mask",))

    def with_warmup(lr):
        if getattr(cfg, "warmup_iters", 0):
            return cosine_warmup(cfg.lr, cfg.warmup_iters,
                                 getattr(cfg, "warmup_ratio", 0.1), lr)
        return lr

    if kind == "adam_onecycle":
        lr = one_cycle_lr(cfg.lr, cfg.div_factor, cfg.pct_start, total_steps)
        mom = one_cycle_momentum(cfg.moms, cfg.pct_start, total_steps)
        return optax.chain(
            clip,
            adamw(learning_rate=lr, b1=mom, b2=0.99, eps=1e-8,
                  weight_decay=cfg.weight_decay, mask=mask),
        )
    if kind == "adam_cosine":
        return optax.chain(clip, adamw(
            learning_rate=with_warmup(cosine_annealing(cfg.lr, total_steps)),
            b2=0.99, weight_decay=cfg.weight_decay, mask=mask))
    if kind == "adam":
        return optax.chain(clip, adamw(
            learning_rate=with_warmup(cfg.lr),
            weight_decay=cfg.weight_decay, mask=mask))
    if kind == "sgd":
        return optax.chain(clip, optax.inject_hyperparams(optax.sgd)(
            learning_rate=with_warmup(cfg.lr), momentum=cfg.moms[0]))
    raise ValueError(f"unknown optimizer kind {kind!r}")


def current_hyperparams(opt_state):
    """(lr, b1) actually applied at the last step (for logging).

    Fetches ONLY the scalar hyperparams subtree to the host — a device_get
    of the whole opt_state would pull the full Adam moments (2x params)
    over the interconnect just to print lr/momentum. The opt_state[1]
    indexing (clip chain element 0, injected adamw element 1) lives only
    here.
    """
    hp = jax.device_get(opt_state[1].hyperparams)
    return float(hp["learning_rate"]), float(hp.get("b1", 0.0))
