"""Anchor-GT target assignment — fully vectorized, static shapes, on device.

Re-designs /root/reference/mmdet/core/bbox3d/target_ops.py:139-277
(`create_target_torch`) for the TPU: the reference runs this per sample per
class mid-step with dynamic boolean indexing; here the whole assignment is a
fixed-shape tensor program over padded GT sets, so it stays inside the jitted
train step (no host sync) and vmaps over the batch.

Assignment rules preserved exactly:
  * per-anchor argmax GT; positive if max IoU >= matched_threshold
  * per-GT force-match: every anchor tied at a GT's best overlap is positive
    (unless that GT's best overlap is 0)
  * negative if max IoU < unmatched_threshold, force-match wins over negative
  * anchors outside `anchors_mask` are "don't care" (-1), targets unmapped to 0
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from . import boxes as box_ops
from . import riou


class TargetAssignment(NamedTuple):
    labels: jnp.ndarray        # [A] int32: -1 ignore / 0 negative / >0 class id
    bbox_targets: jnp.ndarray  # [A, code_size] residual encodings (0 for non-pos)
    max_overlap: jnp.ndarray   # [A] best IoU with any valid GT


def nearest_iou_similarity(anchors, gt_boxes):
    """BEV IoU of nearest axis-aligned boxes (NearestIouSimilarity)."""
    return box_ops.nearest_iou_similarity(anchors, gt_boxes)


def rotate_iou3d_similarity(anchors, gt_boxes):
    """Exact rotated 3D IoU (RotateIou3dSimilarity)."""
    return riou.rotate_iou_3d(anchors, gt_boxes)


def rotate_iou2d_similarity(anchors, gt_boxes):
    """Exact rotated BEV IoU (RotateIou2dSimilarity,
    /root/reference/mmdet/core/bbox3d/region_similarity.py:51-58)."""
    return riou.rotate_iou_bev(riou.boxes3d_to_bev5(anchors),
                               riou.boxes3d_to_bev5(gt_boxes))


def make_distance_similarity(dist_norm: float, with_rotation: bool = False,
                             rot_alpha: float = 0.5) -> Callable:
    """Negated-distance similarity (DistanceSimilarity,
    region_similarity.py:98-128 / geometry.py:460-483 distance_similarity):

        1 - min(d^2/dist_norm, dist_norm)                 (no rotation)
        1 - (1-a)*min(d^2/dist_norm, dist_norm) - a*|sin(dth)|   (rotated)

    gated to 0 outside the |dx|,|dy| <= dist_norm window.
    """
    def similarity(anchors, gt_boxes):
        dx = anchors[:, None, 0] - gt_boxes[None, :, 0]
        dy = anchors[:, None, 1] - gt_boxes[None, :, 1]
        inside = (jnp.abs(dx) <= dist_norm) & (jnp.abs(dy) <= dist_norm)
        d2 = dx * dx + dy * dy
        dn = jnp.minimum(d2 / dist_norm, dist_norm)
        if with_rotation:
            dr = jnp.abs(jnp.sin(anchors[:, None, 6] - gt_boxes[None, :, 6]))
            sim = 1.0 - (1.0 - rot_alpha) * dn - rot_alpha * dr
        else:
            sim = 1.0 - dn
        return jnp.where(inside, sim, 0.0)

    return similarity


SIMILARITY_FNS = {
    "NearestIouSimilarity": nearest_iou_similarity,
    "RotateIou3dSimilarity": rotate_iou3d_similarity,
    "RotateIou2dSimilarity": rotate_iou2d_similarity,
    # registered-alternative (unused by the reference's configs); the
    # dist_norm default matches second.pytorch's pedestrian/cyclist recipe
    "DistanceSimilarity": make_distance_similarity(dist_norm=1.0),
}


def create_targets(anchors: jnp.ndarray,
                   gt_boxes: jnp.ndarray,
                   gt_valid: jnp.ndarray,
                   similarity_fn: Callable,
                   matched_threshold: float,
                   unmatched_threshold: float,
                   anchors_mask: Optional[jnp.ndarray] = None,
                   gt_classes: Optional[jnp.ndarray] = None,
                   encode_fn: Callable = box_ops.second_box_encode,
                   ) -> TargetAssignment:
    """Assign padded GTs to anchors (single sample; vmap over batch).

    Args:
      anchors: [A, 7].
      gt_boxes: [G, 7] zero-padded GT boxes.
      gt_valid: [G] bool validity of each GT slot.
      similarity_fn: ([A,7],[G,7]) -> [A,G] overlap matrix.
      anchors_mask: optional [A] bool; False anchors end up labeled -1.
      gt_classes: optional [G] int (1-based class ids); defaults to all-1.
    """
    a = anchors.shape[0]
    g = gt_boxes.shape[0]
    if gt_classes is None:
        gt_classes = jnp.ones((g,), dtype=jnp.int32)
    if anchors_mask is None:
        anchors_mask = jnp.ones((a,), dtype=bool)

    # Assignment is a non-differentiable decision (the reference's CUDA IoU
    # has no backward either); stop_gradient also keeps autodiff away from
    # the Pallas overlap kernel, which defines no VJP.
    overlap = jax.lax.stop_gradient(similarity_fn(anchors, gt_boxes))  # [A, G]
    pair_ok = anchors_mask[:, None] & gt_valid[None, :]
    overlap = jnp.where(pair_ok, overlap, -1.0)

    anchor_to_gt_argmax = jnp.argmax(overlap, axis=1)                # [A]
    anchor_to_gt_max = jnp.max(overlap, axis=1)                      # [A]

    # Per-GT best overlap; GTs whose best overlap is <= 0 never force-match
    # (target_ops.py:203-205 "must remove gt which doesn't match any anchor").
    gt_to_anchor_max = jnp.max(overlap, axis=0)                      # [G]
    gt_to_anchor_max = jnp.where(gt_to_anchor_max <= 0.0, -2.0, gt_to_anchor_max)
    force = pair_ok & (overlap == gt_to_anchor_max[None, :])
    force_anchor = jnp.any(force, axis=1)                            # [A]

    pos = anchor_to_gt_max >= matched_threshold
    neg = anchor_to_gt_max < unmatched_threshold
    fg = force_anchor | pos

    cls_at_argmax = gt_classes[anchor_to_gt_argmax].astype(jnp.int32)
    # precedence (target_ops.py:211-253): force-match > negative > positive>ignore
    labels = jnp.where(fg, cls_at_argmax, jnp.where(neg, 0, -1))
    labels = jnp.where(anchors_mask, labels, -1)
    fg = fg & anchors_mask

    targets = encode_fn(gt_boxes[anchor_to_gt_argmax], anchors)
    targets = jnp.where(fg[:, None], targets, 0.0)

    max_overlap = jnp.where(anchors_mask, jnp.maximum(anchor_to_gt_max, 0.0), 0.0)
    return TargetAssignment(labels, targets, max_overlap)
