"""Rotated BEV IoU, 3D IoU, and rotated NMS.

Replaces three native components of the reference with one vectorized
implementation:
  * the CUDA exact polygon-clip overlap (/root/reference/mmdet/ops/iou3d/src/
    iou3d_kernel.cu:108-221, used for PSWarp target assignment and final NMS)
  * the numba-CUDA rotated IoU stack (/root/reference/mmdet/core/
    post_processing/rotate_nms_gpu.py:317-627, used by the KITTI evaluator)
  * the bitmask NMS kernels (iou3d_kernel.cu:250+, rotate_nms_gpu.py:116,427)

Algorithm: Sutherland–Hodgman clipping of box A's 4 CCW corners against the
4 half-planes of box B, with a static 8-vertex buffer (a convex clip adds at
most one vertex per half-plane), then shoelace area.  Fully data-parallel over
box pairs, so it runs as pure vector code on the TPU VPU under jit — and the
same code doubles as the host-side (numpy) evaluator kernel, so there is no
separate "eval geometry" implementation to keep in sync.

BEV box layout here: [x, y, w, l, yaw] (center format; w = local-x extent).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

_MAXV = 8  # 4 corners + <=1 new vertex per half-plane clip


def _make_impl(xp, is_jax: bool):
    """Build the pairwise-overlap implementation for a given array backend.

    All functions operate on a flat pair dimension P (callers broadcast
    [N, M] -> P = N*M), which keeps the code identical for numpy and jnp.
    """

    def scatter_rows(buf, cols, vals, mask):
        """buf[p, cols[p, i]] = vals[p, i] where mask; col==_MAXV is a trash slot.

        The jax path is scatter-free: emitted-slot placement is a one-hot
        contraction (TPU scatters serialize; a [V, V+1] one-hot einsum is
        pure VPU/MXU work). Active columns are unique per row, so summing
        one-hot contributions equals the scatter."""
        cols = xp.where(mask, cols, _MAXV)
        if is_jax:
            onehot = (cols[..., None] ==
                      xp.arange(_MAXV + 1)[None, None, :])      # [P, V, V+1]
            vals = xp.where(mask[..., None], vals, 0.0)
            add = xp.einsum("pvk,pvd->pkd", onehot.astype(vals.dtype), vals)
            return buf + add
        P = buf.shape[0]
        rows = np.arange(P)[:, None]
        buf[rows, cols] = xp.where(mask[..., None], vals, buf[rows, cols])
        return buf

    def clip(verts, n, p1, p2):
        """Clip polygons by the half-plane left of directed edge p1 -> p2.

        verts: [P, _MAXV, 2], n: [P] vertex counts, p1/p2: [P, 2].
        """
        P = verts.shape[0]
        idx = xp.arange(_MAXV)[None, :]                       # [1, V]
        active = idx < n[:, None]
        jnxt = xp.where(idx + 1 >= n[:, None], 0, idx + 1)    # wrap to first
        vi = verts
        vj = xp.take_along_axis(verts, jnxt[..., None].repeat(2, axis=-1), axis=1) \
            if not is_jax else xp.take_along_axis(verts, xp.broadcast_to(jnxt[..., None], (P, _MAXV, 2)), axis=1)
        e = (p2 - p1)[:, None, :]                             # [P, 1, 2]
        di = e[..., 0] * (vi[..., 1] - p1[:, None, 1]) - e[..., 1] * (vi[..., 0] - p1[:, None, 0])
        dj = e[..., 0] * (vj[..., 1] - p1[:, None, 1]) - e[..., 1] * (vj[..., 0] - p1[:, None, 0])
        ins_i = di >= 0
        ins_j = dj >= 0
        emit_v = active & ins_i
        emit_x = active & (ins_i != ins_j)
        denom = di - dj
        t = di / xp.where(xp.abs(denom) > 1e-12, denom, 1.0)
        inter = vi + t[..., None] * (vj - vi)
        cnt = emit_v.astype(xp.int32) + emit_x.astype(xp.int32)
        start = xp.cumsum(cnt, axis=1) - cnt
        buf = xp.zeros((P, _MAXV + 1, 2), dtype=verts.dtype)
        buf = scatter_rows(buf, start, vi, emit_v)
        buf = scatter_rows(buf, start + emit_v.astype(xp.int32), inter, emit_x)
        return buf[:, :_MAXV], xp.sum(cnt, axis=1)

    def corners(boxes):
        """[P, 5] center boxes -> [P, 4, 2] CCW-wound corners.

        Clockwise-positive yaw (the KITTI-lidar / SECOND convention used by
        the reference's rotated-geometry stacks, rotate_nms_gpu.py:341-382).
        """
        x, y, w, l, r = (boxes[:, i] for i in range(5))
        sx = xp.stack([w, -w, -w, w], axis=-1) * 0.5
        sy = xp.stack([l, l, -l, -l], axis=-1) * 0.5
        c, s = xp.cos(r)[:, None], xp.sin(r)[:, None]
        cx = sx * c + sy * s + x[:, None]
        cy = -sx * s + sy * c + y[:, None]
        return xp.stack([cx, cy], axis=-1)

    def pair_intersection_area(boxes_a, boxes_b):
        """Intersection areas of paired rotated boxes: [P,5],[P,5] -> [P]."""
        P = boxes_a.shape[0]
        ca = corners(boxes_a)
        cb = corners(boxes_b)
        if is_jax:
            verts = xp.concatenate(
                [ca, xp.zeros((P, _MAXV - 4, 2), dtype=boxes_a.dtype)], axis=1)
        else:
            verts = xp.zeros((P, _MAXV, 2), dtype=boxes_a.dtype)
            verts[:, :4] = ca
        n = xp.full((P,), 4, dtype=xp.int32)
        for k in range(4):
            p1 = cb[:, k]
            p2 = cb[:, (k + 1) % 4]
            verts, n = clip(verts, n, p1, p2)
        # shoelace with wraparound over the first n vertices
        idx = xp.arange(_MAXV)[None, :]
        active = idx < n[:, None]
        jnxt = xp.where(idx + 1 >= n[:, None], 0, idx + 1)
        vj = xp.take_along_axis(verts, xp.broadcast_to(jnxt[..., None], (P, _MAXV, 2)), axis=1)
        cross = verts[..., 0] * vj[..., 1] - vj[..., 0] * verts[..., 1]
        area = 0.5 * xp.sum(xp.where(active, cross, 0.0), axis=1)
        return xp.where(n >= 3, xp.abs(area), 0.0)

    return pair_intersection_area


_pair_area_jnp = _make_impl(jnp, True)
_pair_area_np = _make_impl(np, False)


def _pairwise(fn, boxes1, boxes2, xp):
    n, m = boxes1.shape[0], boxes2.shape[0]
    a = xp.broadcast_to(boxes1[:, None, :], (n, m, boxes1.shape[-1])).reshape(n * m, -1)
    b = xp.broadcast_to(boxes2[None, :, :], (n, m, boxes2.shape[-1])).reshape(n * m, -1)
    return fn(a, b).reshape(n, m)


# ---------------------------------------------------------------------------
# public API (jnp)
# ---------------------------------------------------------------------------

def rotate_overlap_bev(boxes1, boxes2):
    """Pairwise rotated-BEV intersection areas. [N,5] x [M,5] -> [N,M].

    On TPU this dispatches to the Pallas kernel (ops/pallas/riou_kernel.py),
    which keeps the whole clip pipeline in VMEM; the XLA-composed fallback
    below serves CPU and remains the semantics oracle."""
    import jax as _jax
    if _jax.default_backend() != "cpu":
        from sassd_tpu.ops.pallas.riou_kernel import rotate_overlap_pallas
        return rotate_overlap_pallas(boxes1, boxes2, criterion=2)
    return _pairwise(_pair_area_jnp, boxes1, boxes2, jnp)


def rotate_iou_bev(boxes1, boxes2):
    """Pairwise rotated-BEV IoU. [N,5] x [M,5] -> [N,M]."""
    inter = rotate_overlap_bev(boxes1, boxes2)
    a1 = (boxes1[:, 2] * boxes1[:, 3])[:, None]
    a2 = (boxes2[:, 2] * boxes2[:, 3])[None, :]
    union = jnp.maximum(a1 + a2 - inter, 1e-7)
    return inter / union


def boxes3d_to_bev5(boxes3d):
    """[..., 7] 3D boxes -> [..., 5] center-format BEV boxes (x, y, w, l, yaw)."""
    return boxes3d[..., [0, 1, 3, 4, 6]]


def rotate_iou_3d(boxes1, boxes2):
    """Pairwise 3D IoU of [N,7] x [M,7] boxes (z = bottom).

    BEV polygon overlap x z-interval overlap / volume union; semantics of
    /root/reference/mmdet/ops/iou3d/iou3d_utils.py:79-111 (RotateIou3dSimilarity).
    """
    inter_bev = rotate_overlap_bev(boxes3d_to_bev5(boxes1), boxes3d_to_bev5(boxes2))
    amin = boxes1[:, 2][:, None]
    amax = (boxes1[:, 2] + boxes1[:, 5])[:, None]
    bmin = boxes2[:, 2][None, :]
    bmax = (boxes2[:, 2] + boxes2[:, 5])[None, :]
    inter_h = jnp.clip(jnp.minimum(amax, bmax) - jnp.maximum(amin, bmin), a_min=0.0)
    inter = inter_bev * inter_h
    vol1 = (boxes1[:, 3] * boxes1[:, 4] * boxes1[:, 5])[:, None]
    vol2 = (boxes2[:, 3] * boxes2[:, 4] * boxes2[:, 5])[None, :]
    return inter / jnp.maximum(vol1 + vol2 - inter, 1e-7)


def _fixpoint_keep(keep0, sup):
    """Exact greedy keep set via fixpoint iteration instead of an N-step
    serial loop: with boxes score-sorted, greedy keep is the unique fixpoint
    of  G(K)_i = valid_i and not exists j < i with K_j and iou(i, j) > thr.
    G is antitone over an acyclic (strictly ranked) suppression relation, so
    iterating G from all-kept converges to the greedy solution in at most
    the suppression-chain depth (a handful of rounds in practice). Each
    round is one [N, N] masked reduction — TPU-parallel — versus the
    reference's sequential bitmask sweep (iou3d.cpp:84-120)."""
    n = keep0.shape[0]

    def cond(carry):
        keep, prev, it = carry
        return (it < n) & jnp.any(keep != prev)

    def body(carry):
        keep, _, it = carry
        new = keep0 & ~jnp.any(sup & keep[None, :], axis=1)
        return new, keep, it + 1

    keep, _, _ = jax.lax.while_loop(
        cond, body, (keep0, jnp.zeros_like(keep0), 0))
    return keep


def rotate_nms(boxes_bev, scores, iou_threshold: float, valid=None,
               max_det: Optional[int] = None, block_size: int = 256):
    """Greedy rotated NMS with static shapes.

    Replaces the 64-bit-bitmask CUDA NMS (/root/reference/mmdet/ops/iou3d/src/
    iou3d_kernel.cu:250+ and core/post_processing/bbox_nms.py:4-27).

    Args:
      boxes_bev: [N, 5] center-format BEV boxes.
      scores:    [N] detection scores (invalid entries should be -inf).
      iou_threshold: suppress j if IoU(i, j) > thr for a kept higher-scored i.
      valid:     optional [N] bool; invalid boxes are never kept.
      max_det:   if given, NMS may stop once `max_det` boxes are kept; keep
        flags for the first max_det kept boxes are exact greedy, later boxes
        may report False. This enables the BLOCKED path: instead of one
        [N, N] rotated-IoU matrix (the polygon-clip kernel is the cost:
        O(N^2) with ~100 ns/pair), score-sorted blocks of `block_size` are
        tested against the running kept-buffer and themselves, with a
        while_loop that exits as soon as max_det boxes are kept or the
        remaining blocks hold no valid candidates — on realistic scans only
        1-2 blocks ever run.
    Returns:
      (order [N] int32: indices sorted by descending score,
       keep  [N] bool:  keep flags aligned with `order`)
    """
    n = boxes_bev.shape[0]
    if valid is not None:
        scores = jnp.where(valid, scores, -jnp.inf)
    order = jnp.argsort(-scores)
    boxes_sorted = boxes_bev[order]
    keep0 = jnp.isfinite(scores[order])

    if max_det is None or n <= block_size:
        iou = rotate_iou_bev(boxes_sorted, boxes_sorted)
        tri = jnp.tril(jnp.ones((n, n), bool), k=-1)          # j < i
        sup = tri & (iou > iou_threshold)                     # [i, j]
        return order, _fixpoint_keep(keep0, sup)

    # ---- blocked path ----------------------------------------------------
    pad = (-n) % block_size
    boxes_p = jnp.pad(boxes_sorted, ((0, pad), (0, 0)))
    keep0_p = jnp.pad(keep0, (0, pad))
    n_blocks = boxes_p.shape[0] // block_size
    blk_has = jnp.any(keep0_p.reshape(n_blocks, block_size), axis=1)

    kcap = max(-(-max_det // 128) * 128, 128)  # kept-buffer slots
    tri = jnp.tril(jnp.ones((block_size, block_size), bool), k=-1)

    def cond(carry):
        _kb, kcnt, _kf, bi = carry
        return (bi < n_blocks) & (kcnt < max_det) & blk_has[bi]

    def body(carry):
        kboxes, kcnt, keep_flags, bi = carry
        blk = jax.lax.dynamic_slice(
            boxes_p, (bi * block_size, 0), (block_size, 5))
        blk_keep0 = jax.lax.dynamic_slice(keep0_p, (bi * block_size,),
                                          (block_size,))
        # suppression by already-kept boxes (all strictly higher-scored)
        iou_prev = rotate_iou_bev(blk, kboxes)                # [B, kcap]
        kmask = jnp.arange(kcap) < kcnt
        sup_prev = jnp.any((iou_prev > iou_threshold) & kmask[None, :],
                           axis=1)
        base = blk_keep0 & ~sup_prev
        # in-block greedy fixpoint
        iou_in = rotate_iou_bev(blk, blk)
        sup_in = tri & (iou_in > iou_threshold)
        keep_blk = _fixpoint_keep(base, sup_in)
        # append kept boxes to the buffer (overflow beyond kcap dropped —
        # only reachable once kcnt >= max_det, where the loop exits anyway)
        pos = kcnt + jnp.cumsum(keep_blk.astype(jnp.int32)) - 1
        slot = jnp.where(keep_blk, pos, kcap)
        kboxes = kboxes.at[slot].set(blk, mode="drop")
        keep_flags = jax.lax.dynamic_update_slice(
            keep_flags, keep_blk, (bi * block_size,))
        return (kboxes, kcnt + jnp.sum(keep_blk.astype(jnp.int32)),
                keep_flags, bi + 1)

    kboxes0 = jnp.zeros((kcap, 5), boxes_p.dtype)
    keep_flags0 = jnp.zeros((boxes_p.shape[0],), bool)
    _, _, keep_flags, _ = jax.lax.while_loop(
        cond, body, (kboxes0, jnp.asarray(0, jnp.int32), keep_flags0,
                     jnp.asarray(0, jnp.int32)))
    return order, keep_flags[:n]


# ---------------------------------------------------------------------------
# host (numpy) evaluator kernels — replaces rotate_nms_gpu.py:498-627
# ---------------------------------------------------------------------------

def rotate_overlap_bev_np(boxes1, boxes2, use_native: bool = True):
    """Numpy pairwise rotated intersection areas ([N,5] x [M,5] -> [N,M]).

    Routes to the C++ host kernel when built (csrc/sassd_host.cpp)."""
    boxes1 = np.asarray(boxes1, np.float64)
    boxes2 = np.asarray(boxes2, np.float64)
    if use_native and boxes1.shape[0] and boxes2.shape[0]:
        from sassd_tpu.ops import native
        if native.available():
            return native.rotated_overlap_cpp(boxes1, boxes2, 2).astype(
                np.float64)
    return _pairwise(_pair_area_np, boxes1, boxes2, np)


def rotate_iou_eval_np(boxes1, boxes2, criterion: int = -1):
    """Numpy pairwise rotated IoU with eval 'criterion' variants.

    criterion=-1: IoU; 0: inter/area1 (IoF w.r.t. boxes1); 1: inter/area2;
    2 (or any other value): the raw intersection area, as used by
    RotateIou3dSimilarity (region_similarity.py:70-74).
    Mirrors /root/reference/mmdet/core/post_processing/rotate_nms_gpu.py:537-549.
    """
    boxes1 = np.asarray(boxes1, np.float64)
    boxes2 = np.asarray(boxes2, np.float64)
    if boxes1.shape[0] == 0 or boxes2.shape[0] == 0:
        return np.zeros((boxes1.shape[0], boxes2.shape[0]), np.float32)
    inter = rotate_overlap_bev_np(boxes1, boxes2)
    a1 = (boxes1[:, 2] * boxes1[:, 3])[:, None]
    a2 = (boxes2[:, 2] * boxes2[:, 3])[None, :]
    if criterion == -1:
        denom = np.maximum(a1 + a2 - inter, 1e-9)
    elif criterion == 0:
        denom = np.maximum(a1, 1e-9)
    elif criterion == 1:
        denom = np.maximum(a2, 1e-9)
    else:
        denom = np.ones_like(a1 + a2)
    return (inter / denom).astype(np.float32)
