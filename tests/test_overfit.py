"""End-to-end learning smoke test: overfit one tiny synthetic scene.

Trains the full detector (aux branch + RPN + PSWarp) on a single fixed scene
for a few dozen steps and checks that (a) losses drop, (b) inference recalls
the ground-truth objects. This exercises every subsystem together: voxelize,
sparse backbone, BEV trunk, heads, target assignment, losses, optimizer.
"""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sassd_tpu.config import tiny_config
from sassd_tpu.core import riou
from sassd_tpu.data.kitti import build_anchors, build_host_plans
from sassd_tpu.models import detector
from sassd_tpu.ops.voxelize import voxelize_np
from sassd_tpu.train import loop, optim


def make_scene_batch(cfg, rng):
    """One fixed scene with 2 'cars' inside the tiny range."""
    pcr = np.asarray(cfg.voxel.point_cloud_range)
    # anchor-shaped boxes (many positive anchors -> fast overfit)
    boxes = np.array([
        [2.0, -1.2, -2.0, 1.6, 3.2, 1.4, 0.0],
        [4.4, 1.4, -2.0, 1.6, 3.2, 1.4, 1.57],
    ], np.float32)
    from sassd_tpu.data.synthetic import sample_box_points
    pts = [sample_box_points(b, 300, rng) for b in boxes]
    nground = 1500
    ground = np.stack([
        rng.uniform(pcr[0], pcr[3], nground),
        rng.uniform(pcr[1], pcr[4], nground),
        rng.normal(-2.3, 0.02, nground),
        rng.uniform(0, 1, nground)], 1).astype(np.float32)
    points = np.concatenate(pts + [ground])
    v, c, n = voxelize_np(points, cfg.voxel, pad=True)
    g = cfg.caps.max_gt
    gtb = np.zeros((g, 7), np.float32)
    gtb[:2] = boxes
    batch = {
        "voxels": v[None], "num_points": n[None], "coords": c[None],
        "anchors_mask": np.ones((1, cfg.num_anchors), bool),
        "gt_boxes": gtb[None],
        "gt_classes": np.where(np.arange(g) < 2, 1, 0)[None].astype(np.int32),
        "gt_valid": (np.arange(g) < 2)[None],
    }
    for k, arr in build_host_plans(cfg, c).items():
        batch[k] = arr[None]
    return {k: jnp.asarray(x) for k, x in batch.items()}, boxes


@pytest.mark.slow
def test_overfit_single_scene():
    cfg = tiny_config()
    rng = np.random.default_rng(0)
    batch, gt = make_scene_batch(cfg, rng)
    anchors = jnp.asarray(build_anchors(cfg)[0])
    params, state = detector.detector_init(jax.random.PRNGKey(0), cfg)
    tx = optim.make_optimizer(
        dataclasses.replace(cfg.train, lr=0.003), total_steps=600)
    opt_state = tx.init(params)
    step = loop.make_train_step(cfg, anchors, tx)

    first = None
    p, s, o = params, state, opt_state
    # 600 steps: 250/400 leave the second GT's IoU chaotically near the 0.3
    # gate (measured [0.33,0.29] / [0.23,0.40]); 600 is robustly clear
    # ([0.92,0.50]) — PSWarp + direction-head convergence is non-monotone
    # early on.
    for i in range(600):
        p, s, o, metrics = step(p, s, o, batch)
        if first is None:
            first = {k: float(v) for k, v in metrics.items()}
    last = {k: float(v) for k, v in metrics.items()}
    assert last["loss"] < first["loss"] * 0.5, (first, last)
    assert last["rpn_cls_loss"] < first["rpn_cls_loss"]

    # low score threshold: 600 steps is enough to localize but the PSWarp
    # rescorer (positives need IoU>=0.7) converges slower than the RPN
    cfg_t = dataclasses.replace(
        cfg, test=dataclasses.replace(cfg.test, score_thr=0.05))
    dets = detector.forward_test(p, s, batch, anchors, cfg_t)
    valid = np.asarray(dets["valid"])[0]
    boxes = np.asarray(dets["boxes"])[0][valid]
    assert len(boxes) >= 1, "no detections after overfitting"
    # every GT must be hit by some detection with BEV IoU > 0.3
    ious = np.asarray(riou.rotate_iou_bev(
        jnp.asarray(boxes[:, [0, 1, 3, 4, 6]]),
        jnp.asarray(gt[:, [0, 1, 3, 4, 6]])))
    assert ious.max(axis=0).min() > 0.3, ious.max(axis=0)
