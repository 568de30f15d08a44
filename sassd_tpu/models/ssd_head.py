"""Anchor-based rotated SSD head (classification / box / direction).

TPU re-design of SSDRotateHead (/root/reference/mmdet/models/
single_stage_heads/ssd_rotate_head.py:93-372). Differences from the
reference are purely structural, never semantic:
  * target assignment is the vectorized padded-GT `create_targets` and runs
    vmapped inside the jitted step (the reference calls create_target_torch
    per sample per class mid-step);
  * guided-anchor selection is a fixed-capacity top-k instead of boolean
    indexing, so inference compiles once with static shapes.

Prediction flattening order is (class, y, x, anchor_rot) — identical to the
reference's view/permute chain (ssd_rotate_head.py:218-235, 245-265), so the
anchor tensor built by `flat_anchors` lines up with predictions.
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sassd_tpu.core import boxes as box_ops
from sassd_tpu.core import losses as loss_ops
from sassd_tpu.core import targets as target_ops
from . import layers as L


class HeadOutputs(NamedTuple):
    box_preds: jnp.ndarray   # [B, A, 7]
    cls_preds: jnp.ndarray   # [B, A, num_class]
    dir_preds: jnp.ndarray   # [B, A, 2]


class GuidedAnchors(NamedTuple):
    boxes: jnp.ndarray       # [B, K, 7] decoded candidate boxes
    labels: jnp.ndarray      # [B, K] int32 class indices (0-based)
    valid: jnp.ndarray       # [B, K] bool
    truncated: jnp.ndarray   # [B] int32 over-threshold candidates the static
    #                          cap dropped (the reference keeps ALL passing
    #                          anchors, ssd_rotate_head.py:307-372 — nonzero
    #                          here means the negative pool was thinned; it
    #                          surfaces as the `guided_truncated` train metric
    #                          and in detection outputs)


def head_init(key, num_output_filters: int, num_class: int,
              num_anchor_per_loc: int, box_code_size: int = 7):
    npl = num_anchor_per_loc * num_class
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "conv_cls": L.conv2d_init(k1, 1, num_output_filters,
                                  npl * num_class, bias=True),
        "conv_box": L.conv2d_init(k2, 1, num_output_filters,
                                  npl * box_code_size, bias=True),
        "conv_dir": L.conv2d_init(k3, 1, num_output_filters, npl * 2,
                                  bias=True),
    }


def _flatten(pred, num_class: int, per_anchor: int, anchors_per_loc: int = 2):
    """[B,H,W, ncls*apl*d] -> [B, ncls*H*W*apl, d] (class-major, then y, x,
    anchor) — the reference's view/permute order (ssd_rotate_head.py:218-235)."""
    b, h, w, _ = pred.shape
    pred = pred.reshape(b, h, w, num_class, anchors_per_loc, per_anchor)
    pred = jnp.transpose(pred, (0, 3, 1, 2, 4, 5))
    return pred.reshape(b, num_class * h * w * anchors_per_loc, per_anchor)


def head_apply(params, x, num_class: int, box_code_size: int = 7,
               anchors_per_loc: int = 2, fold: bool = True) -> HeadOutputs:
    npl = num_class * anchors_per_loc
    if fold:
        # One fused 1x1 conv over the concatenated output channels instead of
        # three separate head convs: each output channel is the same dot
        # product either way (conv is linear per-channel), so numerics are
        # identical while the MXU sees one [HW, C] @ [C, out_total] matmul.
        w = jnp.concatenate([params[k]["w"] for k in
                             ("conv_box", "conv_cls", "conv_dir")], axis=-1)
        b = jnp.concatenate([params[k]["b"] for k in
                             ("conv_box", "conv_cls", "conv_dir")], axis=-1)
        y = L.conv2d({"w": w, "b": b}, x)
        nb, nc = npl * box_code_size, npl * num_class
        box_y, cls_y, dir_y = (y[..., :nb], y[..., nb:nb + nc],
                               y[..., nb + nc:])
    else:
        box_y = L.conv2d(params["conv_box"], x)
        cls_y = L.conv2d(params["conv_cls"], x)
        dir_y = L.conv2d(params["conv_dir"], x)
    box = _flatten(box_y, num_class, box_code_size, anchors_per_loc)
    cls = _flatten(cls_y, num_class, num_class, anchors_per_loc)
    dirp = _flatten(dir_y, num_class, 2, anchors_per_loc)
    return HeadOutputs(box, cls, dirp)


def flat_anchors(anchors_per_class: Dict[str, np.ndarray]) -> np.ndarray:
    """Stack per-class [D,H,W,S,R,7] grids into the [A, 7] prediction order."""
    flats = [a.reshape(-1, 7) for a in anchors_per_class.values()]
    return np.concatenate(flats, axis=0)


# ---------------------------------------------------------------------------
# loss
# ---------------------------------------------------------------------------

def add_sin_difference(boxes1, boxes2):
    """Angle channel -> sin(a-b) decomposition (ssd_rotate_head.py:127-133)."""
    rad1 = jnp.sin(boxes1[..., -1:]) * jnp.cos(boxes2[..., -1:])
    rad2 = jnp.cos(boxes1[..., -1:]) * jnp.sin(boxes2[..., -1:])
    return (jnp.concatenate([boxes1[..., :-1], rad1], axis=-1),
            jnp.concatenate([boxes2[..., :-1], rad2], axis=-1))


def head_loss(outs: HeadOutputs,
              anchors: jnp.ndarray,
              anchors_mask: jnp.ndarray,
              gt_boxes: jnp.ndarray,
              gt_classes: jnp.ndarray,
              gt_valid: jnp.ndarray,
              *,
              num_class: int,
              matched_thresholds: Tuple[float, ...],
              unmatched_thresholds: Tuple[float, ...],
              similarity_fn=target_ops.nearest_iou_similarity,
              box_code_size: int = 7) -> Dict[str, jnp.ndarray]:
    """RPN losses (ssd_rotate_head.py:237-305).

    Args:
      anchors: [A, 7] (constant, class-major flatten).
      anchors_mask: [B, A] bool.
      gt_boxes/gt_classes/gt_valid: [B,G,7] / [B,G] (1-based ids) / [B,G].
    """
    b = outs.box_preds.shape[0]
    a_total = anchors.shape[0]
    a_cls = a_total // num_class

    labels_c, targets_c = [], []
    for c in range(num_class):
        sl = slice(c * a_cls, (c + 1) * a_cls)
        gv = gt_valid & (gt_classes == c + 1)

        def assign(mask_b, gt_b, gv_b, gc_b):
            return target_ops.create_targets(
                anchors[sl], gt_b, gv_b, similarity_fn,
                matched_thresholds[c], unmatched_thresholds[c],
                anchors_mask=mask_b, gt_classes=gc_b)

        out = jax.vmap(assign)(anchors_mask[:, sl], gt_boxes, gv, gt_classes)
        labels_c.append(out.labels)
        targets_c.append(out.bbox_targets)
    labels = jnp.stack(labels_c, 1).reshape(b, -1)            # [B, A]
    targets = jnp.stack(targets_c, 1).reshape(b, -1, box_code_size)

    # loss weights (prepare_loss_weights, NormByNumPositives, :145-180)
    cared = labels >= 0
    positives = labels > 0
    negatives = labels == 0
    cls_weights = (negatives | positives).astype(jnp.float32)
    reg_weights = positives.astype(jnp.float32)
    pos_norm = jnp.clip(jnp.sum(reg_weights, axis=1, keepdims=True), a_min=1.0)
    cls_weights = cls_weights / pos_norm
    reg_weights = reg_weights / pos_norm

    cls_targets = jnp.where(cared, labels, 0)
    one_hot = jax.nn.one_hot(cls_targets, num_class + 1)[..., 1:]

    box_preds, reg_targets = add_sin_difference(outs.box_preds, targets)
    loc_loss = loss_ops.smooth_l1_loss(
        box_preds, reg_targets, reg_weights[..., None], beta=1 / 9.0)
    cls_loss = loss_ops.sigmoid_focal_loss(
        outs.cls_preds, one_hot, cls_weights[..., None])

    loc_loss = loc_loss / b * 2.0
    cls_loss = cls_loss / b * 1.0

    # direction classifier (:135-143, 292-303): target = (gt yaw > 0)
    rot_gt = targets[..., -1] + anchors[None, :, -1]
    dir_targets = (rot_gt > 0).astype(jnp.int32)
    dir_weights = positives.astype(jnp.float32)
    dir_weights = dir_weights / jnp.clip(
        jnp.sum(dir_weights, axis=1, keepdims=True), a_min=1.0)
    dir_loss = loss_ops.softmax_cross_entropy(
        outs.dir_preds, dir_targets, dir_weights) / b * 0.2

    return dict(rpn_loc_loss=loc_loss, rpn_cls_loss=cls_loss,
                rpn_dir_loss=dir_loss)


# ---------------------------------------------------------------------------
# guided anchors
# ---------------------------------------------------------------------------

def get_guided_anchors(outs: HeadOutputs,
                       anchors: jnp.ndarray,
                       anchors_mask: jnp.ndarray,
                       *,
                       num_class: int,
                       thr: float,
                       cap: int,
                       gt_boxes=None,
                       gt_labels=None,
                       gt_valid=None) -> GuidedAnchors:
    """Decode + score-threshold + (train) append GTs, under a static cap.

    Mirrors ssd_rotate_head.py:307-372; selection is top-`cap` by score among
    anchors passing (score > thr) & anchors_mask — the reference keeps *all*
    passing anchors, so `cap` must be generous (the score threshold passes a
    few hundred anchors on KITTI scans).
    """
    b = outs.box_preds.shape[0]
    decoded = box_ops.second_box_decode(outs.box_preds, anchors[None])
    scores = jax.nn.sigmoid(outs.cls_preds)                   # [B, A, ncls]
    if num_class == 1:
        top_scores = scores[..., 0]
        top_labels = jnp.zeros(top_scores.shape, jnp.int32)
    else:
        top_scores = jnp.max(scores, axis=-1)
        top_labels = jnp.argmax(scores, axis=-1).astype(jnp.int32)

    sel = (top_scores > thr) & anchors_mask
    ranked = jnp.where(sel, top_scores, -jnp.inf)
    k = cap if gt_boxes is None else cap - gt_boxes.shape[1]
    n_pass = jnp.sum(sel, axis=1).astype(jnp.int32)           # [B]
    truncated = jnp.maximum(n_pass - k, 0)
    top_vals, top_idx = jax.lax.top_k(ranked, k)              # [B, k]
    valid = jnp.isfinite(top_vals)

    take = jax.vmap(lambda arr, i: arr[i])
    boxes = take(decoded, top_idx)                            # [B, k, 7]
    labels = take(top_labels, top_idx)
    dir_labels = jnp.argmax(take(outs.dir_preds, top_idx), axis=-1)

    # flip boxes whose predicted yaw sign disagrees with the direction head
    opp = (boxes[..., -1] > 0) != (dir_labels > 0)
    boxes = boxes.at[..., -1].add(jnp.where(opp, np.pi, 0.0))
    boxes = jnp.where(valid[..., None], boxes, 0.0)

    if gt_boxes is not None:
        boxes = jnp.concatenate([gt_boxes, boxes], axis=1)
        labels = jnp.concatenate(
            [jnp.maximum(gt_labels - 1, 0).astype(jnp.int32), labels], axis=1)
        valid = jnp.concatenate([gt_valid, valid], axis=1)
    return GuidedAnchors(boxes, labels, valid, truncated)
