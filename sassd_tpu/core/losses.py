"""Loss functions (pure jnp).

Semantics match /root/reference/mmdet/core/loss/losses.py (the active subset:
weighted sigmoid focal loss, weighted smooth-L1, weighted cross entropy) with
`avg_factor` handled by the caller, as at every active call site in the
reference (always 1.0).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def sigmoid_focal_loss(pred, target, weight, gamma: float = 2.0,
                       alpha: float = 0.25):
    """Per-element focal loss, weighted, summed.

    Mirrors /root/reference/mmdet/core/loss/losses.py:31-65 with avg_factor=1:
      pt      = (1 - p) * t + p * (1 - t)
      w_focal = (alpha * t + (1 - alpha) * (1 - t)) * pt**gamma * weight
      loss    = sum(BCE_with_logits(pred, t) * w_focal)
    """
    p = jax.nn.sigmoid(pred)
    target = target.astype(pred.dtype)
    pt = (1.0 - p) * target + p * (1.0 - target)
    w = (alpha * target + (1.0 - alpha) * (1.0 - target)) * jnp.power(pt, gamma)
    w = w * weight
    bce = jnp.maximum(pred, 0.0) - pred * target + jnp.log1p(jnp.exp(-jnp.abs(pred)))
    return jnp.sum(bce * w)


def smooth_l1_loss(pred, target, weight, beta: float = 1.0):
    """Weighted smooth-L1, summed (losses.py:76-96, avg_factor=1)."""
    diff = jnp.abs(pred - target)
    loss = jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)
    return jnp.sum(loss * weight)


def softmax_cross_entropy(logits, labels, weight):
    """Weighted softmax CE over the last axis, summed (losses.py:13-20).

    logits: [..., C], labels: [...] int, weight: [...].
    """
    logz = jax.nn.logsumexp(logits, axis=-1)
    picked = jnp.take_along_axis(logits, labels[..., None], axis=-1)[..., 0]
    return jnp.sum((logz - picked) * weight)


def binary_cross_entropy(pred, target, weight):
    """Weighted BCE-with-logits, summed (losses.py:23-28, avg_factor=1)."""
    bce = jnp.maximum(pred, 0.0) - pred * target + jnp.log1p(jnp.exp(-jnp.abs(pred)))
    return jnp.sum(bce * weight)
