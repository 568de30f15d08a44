"""Loss tests against the reference formulas transcribed with torch (CPU)."""
import numpy as np
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from sassd_tpu.core import losses as L


def torch_sigmoid_focal(pred, target, weight, gamma=2.0, alpha=0.25):
    """Transcription of losses.py:31-65 (reduction='sum', avg_factor=1)."""
    pred_sigmoid = pred.sigmoid()
    pt = (1 - pred_sigmoid) * target + pred_sigmoid * (1 - target)
    w = (alpha * target + (1 - alpha) * (1 - target)) * weight
    w = w * pt.pow(gamma)
    return (F.binary_cross_entropy_with_logits(
        pred, target, reduction='none') * w).sum()


def test_focal_matches_torch():
    rng = np.random.default_rng(0)
    pred = rng.normal(size=(16, 9)).astype(np.float32) * 3
    target = (rng.uniform(size=(16, 9)) > 0.8).astype(np.float32)
    weight = rng.uniform(size=(16, 9)).astype(np.float32)
    ref = torch_sigmoid_focal(torch.tensor(pred), torch.tensor(target),
                              torch.tensor(weight)).item()
    got = float(L.sigmoid_focal_loss(jnp.asarray(pred), jnp.asarray(target),
                                     jnp.asarray(weight)))
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_smooth_l1_matches_torch():
    rng = np.random.default_rng(1)
    pred = rng.normal(size=(32, 7)).astype(np.float32)
    target = rng.normal(size=(32, 7)).astype(np.float32)
    weight = rng.uniform(size=(32, 1)).astype(np.float32)
    beta = 1 / 9.0
    diff = torch.abs(torch.tensor(pred - target))
    ref = (torch.where(diff < beta, 0.5 * diff ** 2 / beta, diff - 0.5 * beta)
           * torch.tensor(weight)).sum().item()
    got = float(L.smooth_l1_loss(jnp.asarray(pred), jnp.asarray(target),
                                 jnp.asarray(weight), beta=beta))
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_cross_entropy_matches_torch():
    rng = np.random.default_rng(2)
    logits = rng.normal(size=(64, 2)).astype(np.float32)
    labels = rng.integers(0, 2, 64)
    weight = rng.uniform(size=64).astype(np.float32)
    ref = (F.cross_entropy(torch.tensor(logits), torch.tensor(labels),
                           reduction='none') * torch.tensor(weight)).sum().item()
    got = float(L.softmax_cross_entropy(jnp.asarray(logits),
                                        jnp.asarray(labels), jnp.asarray(weight)))
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_bce_matches_torch():
    rng = np.random.default_rng(3)
    pred = rng.normal(size=(20,)).astype(np.float32)
    target = (rng.uniform(size=20) > 0.5).astype(np.float32)
    weight = rng.uniform(size=20).astype(np.float32)
    ref = F.binary_cross_entropy_with_logits(
        torch.tensor(pred), torch.tensor(target), torch.tensor(weight),
        reduction='sum').item()
    got = float(L.binary_cross_entropy(jnp.asarray(pred), jnp.asarray(target),
                                       jnp.asarray(weight)))
    np.testing.assert_allclose(got, ref, rtol=1e-4)
