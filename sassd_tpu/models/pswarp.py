"""Part-sensitive warping head (confidence rescoring).

TPU re-design of PSWarpHead (/root/reference/mmdet/models/
single_stage_heads/ssd_rotate_head.py:416-533): a part-sensitive score map
(3x3 conv -> BN -> ReLU -> 1x1 conv, K = num_parts channels) is sampled at a
rotated per-box lattice, one part channel per lattice point, and the mean of
the K samples is the rescored confidence. Boxes are fixed-capacity padded
candidates (GuidedAnchors) so everything vmaps under jit.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from sassd_tpu.core import losses as loss_ops
from sassd_tpu.core import riou
from sassd_tpu.core import targets as target_ops
from sassd_tpu.ops import warp
from . import layers as L


def pswarp_init(key, in_channels: int, num_class: int = 1,
                num_parts: int = 28):
    out_channels = num_class * num_parts
    k1, k2 = jax.random.split(key)
    params = {
        "conv0": L.conv2d_init(k1, 3, in_channels, out_channels),
        "conv1": L.conv2d_init(k2, 1, out_channels, out_channels),
    }
    params["bn0"], bn_state = L.bn_init(out_channels)
    return params, {"bn0": bn_state}


def pswarp_apply(params, state, conv6, boxes, valid, *,
                 window_size: Tuple[int, int] = (4, 7),
                 grid_offsets: Tuple[float, float] = (0.0, 40.0),
                 featmap_stride: float = 0.4,
                 train: bool = False,
                 compute_dtype=jnp.float32,
                 packed: bool = True):
    """Score candidate boxes.

    Args:
      conv6: [B, H, W, C] BEV feature map (pre-1x1 BEVNet output).
      boxes: [B, K, 7] candidate boxes, `valid` [B, K].
    Returns:
      (scores [B, K], new_state)
    """
    x = L.conv2d(params["conv0"], conv6, compute_dtype=compute_dtype)
    x, bn_state = L.batch_norm(params["bn0"], state["bn0"], x, train=train)
    x = L.relu(x)
    x = L.conv2d(params["conv1"], x, compute_dtype=compute_dtype)  # [B,H,W,K]

    scale = 1.0 / featmap_stride

    sample = (warp.bilinear_sample_per_part_packed if packed
              else warp.bilinear_sample_per_part)

    def score_one(img, bx):
        xs, ys = warp.gen_sample_grid(
            bx[:, [0, 1, 3, 4, 6]], window_size, grid_offsets, scale)
        samples = sample(img, xs, ys)                          # [K_parts, K]
        return jnp.mean(samples, axis=0)

    scores = jax.vmap(score_one)(x, boxes)
    scores = jnp.where(valid, scores, 0.0)
    return scores, {"bn0": bn_state}


def pswarp_loss(scores, boxes, valid, gt_boxes, gt_valid, *,
                pos_iou_thr: float = 0.7, neg_iou_thr: float = 0.7
                ) -> Dict[str, jnp.ndarray]:
    """Rescoring focal loss (ssd_rotate_head.py:450-485).

    Targets come from class-agnostic RotateIou3d assignment at 0.7; the
    normalizer is the total positive count over the whole batch.
    """
    b = scores.shape[0]

    def assign(bx, v, gt, gv):
        return target_ops.create_targets(
            bx, gt, gv, target_ops.rotate_iou3d_similarity,
            pos_iou_thr, neg_iou_thr, anchors_mask=v)

    out = jax.vmap(assign)(boxes, valid, gt_boxes, gt_valid)
    labels = out.labels                                       # [B, K]

    cared = labels >= 0
    positives = labels > 0
    negatives = labels == 0
    cls_weights = (negatives | positives).astype(jnp.float32)
    pos_norm = jnp.clip(jnp.sum(positives.astype(jnp.float32)), a_min=1.0)
    cls_weights = cls_weights / pos_norm
    cls_targets = jnp.where(cared, labels, 0).astype(jnp.float32)

    loss = loss_ops.sigmoid_focal_loss(scores, cls_targets, cls_weights) / b
    return dict(loss_cls=loss)


def rescore_and_nms(boxes, scores, labels, valid, *,
                    score_thr: float = 0.3, nms_iou_thr: float = 0.1,
                    max_det: int = 100, nms_pre: int = 2000):
    """Final detections (get_rescore_bboxes, ssd_rotate_head.py:487-533).

    sigmoid -> score threshold -> top nms_pre -> rotated NMS -> top max_det;
    static shapes. Default nms_pre matches the reference's test budget
    (nms_pre=2000, car_cfg.py:74).
    Returns (det_boxes [B,D,7], det_scores [B,D], det_labels [B,D],
    det_valid [B,D]).
    """
    probs = jax.nn.sigmoid(scores)
    keep_in = valid & (probs > score_thr)

    def one(bx, sc, lb, ok):
        if nms_pre < sc.shape[0]:
            vals, sel = jax.lax.top_k(jnp.where(ok, sc, -1.0), nms_pre)
            bx, lb, sc, ok = bx[sel], lb[sel], sc[sel], ok[sel] & (vals > 0)
        order, keep = riou.rotate_nms(
            riou.boxes3d_to_bev5(bx), sc, nms_iou_thr, valid=ok,
            max_det=max_det)
        # kept boxes first, sorted by score
        rank = jnp.where(keep, jnp.arange(keep.shape[0]), keep.shape[0])
        take = jnp.argsort(rank)[:max_det]
        idx = order[take]
        dvalid = keep[take]
        return bx[idx], sc[idx] * dvalid, lb[idx], dvalid

    db, ds, dl, dv = jax.vmap(one)(boxes, probs, labels, keep_in)
    return db, jnp.where(dv, ds, 0.0), dl, dv
