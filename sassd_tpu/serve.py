"""Device-resident serving: one jitted inference graph that ingests RAW
padded point clouds.

The standard inference batch ships host-built artifacts to the device:
padded voxels + coords (~2.3 MB), the C++ sparse-conv rulebook plans
(~5.5 MB) and the anchors mask. On well-attached hosts that is the fast
path (the host work pipelines across loader cores and the transfer is
~1 ms of PCIe); on degraded interconnects (networked/tunneled
accelerators) the wire bytes dominate end-to-end latency. This module is
the framework's own rule applied to serving — "recompute on device what
you cannot afford to ship" (PERF.md) — as one XLA graph:

    raw points [B, P, F] (~1 MB)  --h2d-->
      voxelize_jax (key-sorted, first-come slots; ops/voxelize.py)
      anchors-mask integral image (static per-config corner indices)
      sparse-conv plans on device (ops/sparse.py index maps / sorted sets)
      forward_test (models/detector.py)

Reference behavior covered: the dataloader leg of tools/test.py
(/root/reference/tools/test.py:19-94 + mmdet/datasets/kitti.py:265-354 —
voxelize + anchors-mask happen in CPU workers there) fused into the
device program; detections are identical to the host-pipeline path up to
float reduction order (tests/test_serve.py).

Select with `TestConfig.device_input = "points"` (tools/test.py /
inference.run_inference honor it); `bench.py` measures both serving modes.
"""
from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sassd_tpu.config import SASSDConfig
from sassd_tpu.models import detector
from sassd_tpu.ops.voxelize import voxelize_jax


# ---------------------------------------------------------------------------
# anchors mask on device
# ---------------------------------------------------------------------------

def anchor_corner_indices(anchors_bv: np.ndarray, voxel_size, pc_range,
                          grid_size) -> np.ndarray:
    """Static per-config BEV corner cell indices [A, 4] int32 (x0, y0, x1, y1).

    Exactly the quantization of the host mask (data/augment.py::
    anchors_mask_from_coords; reference: geometry.py:684-710
    fused_get_anchors_area) — anchors are fixed per config, so the corner
    arithmetic leaves the per-scan graph entirely. Quantization runs in
    FLOAT32 like the C++ kernel and the reference's float32 numpy: anchor
    edges land exactly on voxel grid lines, where a float64 floor can
    land one cell lower.
    """
    w, h = int(grid_size[0]), int(grid_size[1])
    bv = anchors_bv.astype(np.float32)
    pcr = np.asarray(pc_range, np.float32)
    vs = np.asarray(voxel_size, np.float32)
    x0 = np.clip(np.floor((bv[:, 0] - pcr[0]) / vs[0]).astype(np.int32),
                 0, w - 1)
    y0 = np.clip(np.floor((bv[:, 1] - pcr[1]) / vs[1]).astype(np.int32),
                 0, h - 1)
    x1 = np.clip(np.floor((bv[:, 2] - pcr[0]) / vs[0]).astype(np.int32),
                 0, w - 1)
    y1 = np.clip(np.floor((bv[:, 3] - pcr[1]) / vs[1]).astype(np.int32),
                 0, h - 1)
    return np.stack([x0, y0, x1, y1], axis=1)


def separable_corners(anchors_bv: np.ndarray, cfg: SASSDConfig):
    """Factor the static corner table into per-(class, rotation) row/column
    index VECTORS when the anchor grid is separable (stride-placed grids
    always are: x corners depend only on the column, y only on the row).

    Why: the integral-image mask gathers 4 corners per anchor — ~280k
    single-row gathers for the car config's 70.4k anchors, ~17 ns/row on
    v5e = ~4.5 ms/scan, the 2nd-largest slice of the serving graph. On a
    separable grid the same values are two tiny row-gathers per corner
    combo (anchors_mask_jax_separable). Returns a list of dicts
    {y0, y1, x0, x1: [H]/[W] int32} in (class, rot) order, or None if any
    class's grid is not separable (caller falls back to the gather mask).
    """
    h, w = cfg.bev_map_size
    r = cfg.model.num_anchor_per_loc
    n_cls = len(cfg.anchors)
    corners = anchor_corner_indices(anchors_bv, cfg.voxel.voxel_size,
                                    cfg.voxel.point_cloud_range,
                                    cfg.voxel.grid_size)
    if corners.shape[0] != n_cls * h * w * r:
        return None
    g = corners.reshape(n_cls, h, w, r, 4)
    out = []
    for c in range(n_cls):
        for rot in range(r):
            x0, y0, x1, y1 = (g[c, :, :, rot, i] for i in range(4))
            if not (np.all(x0 == x0[:1, :]) and np.all(x1 == x1[:1, :])
                    and np.all(y0 == y0[:, :1]) and np.all(y1 == y1[:, :1])):
                return None
            out.append(dict(y0=y0[:, 0], y1=y1[:, 0], x0=x0[0], x1=x1[0]))
    return out


def _integral_image(coords_zyx: jnp.ndarray, grid_hw) -> jnp.ndarray:
    """Scatter voxel counts into the BEV grid + 2D inclusive cumsum."""
    h, w = grid_hw
    ok = coords_zyx[:, 0] >= 0
    y = jnp.where(ok, coords_zyx[:, 1], h)          # padding rows -> dropped
    x = jnp.where(ok, coords_zyx[:, 2], 0)
    dense = jnp.zeros((h, w), jnp.float32).at[y, x].add(1.0, mode="drop")
    return jnp.cumsum(jnp.cumsum(dense, axis=0), axis=1)


def anchors_mask_jax_separable(coords_zyx: jnp.ndarray, sep, num_rot: int,
                               grid_hw, threshold: float) -> jnp.ndarray:
    """anchors_mask_jax on a separable grid: per (class, rot) the 4-corner
    integral lookups become row-gathers of whole integral-image rows plus
    column-gathers of the tiny [H_a, W] result — no per-anchor gathers.
    Identical output to anchors_mask_jax (tests/test_serve.py).

    sep: separable_corners(...) output, (class, rot)-ordered; num_rot =
    rotations per class. Returns [A] bool in the class -> y -> x -> rot
    anchor order (core/anchors.py::_assemble)."""
    integral = _integral_image(coords_zyx, grid_hw)
    masks = []
    for s in sep:
        y0, y1 = jnp.asarray(s["y0"]), jnp.asarray(s["y1"])
        x0, x1 = jnp.asarray(s["x0"]), jnp.asarray(s["x1"])
        rows1 = integral[y1]                        # [H_a, W]
        rows0 = integral[y0]
        area = ((rows1[:, x1] - rows1[:, x0])       # [H_a, W_a]
                - (rows0[:, x1] - rows0[:, x0]))
        masks.append(area > threshold)
    per_class = []
    for c in range(0, len(masks), num_rot):
        m = jnp.stack(masks[c:c + num_rot], axis=-1)   # [H_a, W_a, R]
        per_class.append(m.reshape(-1))
    return jnp.concatenate(per_class)


def anchors_mask_jax(coords_zyx: jnp.ndarray, corners: jnp.ndarray,
                     grid_hw: Tuple[int, int], threshold: float
                     ) -> jnp.ndarray:
    """BEV occupancy prefilter on device: [V,3] zyx coords (-1 = padding) +
    [A,4] static corner indices -> [A] bool.

    Same integral-image semantics as the host mask (sparse_sum_for_
    anchors_mask + fused_get_anchors_area, geometry.py:675-710): scatter
    voxel counts into the BEV grid, 2D inclusive cumsum, 4-corner gather.
    """
    integral = _integral_image(coords_zyx, grid_hw)
    x0, y0, x1, y1 = corners[:, 0], corners[:, 1], corners[:, 2], corners[:, 3]
    area = (integral[y1, x1] - integral[y0, x1]
            - integral[y1, x0] + integral[y0, x0])
    return area > threshold


# ---------------------------------------------------------------------------
# host-side input prep (the ONLY per-scan host work in this mode)
# ---------------------------------------------------------------------------

def prepare_points(points: np.ndarray, cfg: SASSDConfig,
                   out: np.ndarray = None) -> Tuple[np.ndarray, np.int32]:
    """Range-crop + pad a raw scan to [caps.max_points_per_scan, F] f32.

    `out`: optional pre-allocated destination (pinned staging buffer —
    reuse keeps networked PJRT clients at their bandwidth floor, PERF.md).
    Points beyond the cap are dropped (the voxel budget saturates first:
    max_voxels * max_num_points < the default 65536-point cap).
    """
    pcr = cfg.voxel.point_cloud_range
    m = ((points[:, 0] >= pcr[0]) & (points[:, 0] < pcr[3])
         & (points[:, 1] >= pcr[1]) & (points[:, 1] < pcr[4])
         & (points[:, 2] >= pcr[2]) & (points[:, 2] < pcr[5]))
    pts = points[m]
    cap = cfg.caps.max_points_per_scan
    n = min(len(pts), cap)
    if out is None:
        out = np.zeros((cap, points.shape[1]), np.float32)
    else:
        out[n:] = 0.0
    out[:n] = pts[:n]
    return out, np.int32(n)


# ---------------------------------------------------------------------------
# the serving step
# ---------------------------------------------------------------------------

def batch_from_points(points: jnp.ndarray, n_points: jnp.ndarray,
                      corners: jnp.ndarray, cfg: SASSDConfig,
                      sep=None) -> Dict[str, jnp.ndarray]:
    """In-graph batch assembly: voxelize + anchors-mask from raw points.

    points [B, P, F] f32 (zero-padded), n_points [B] int32,
    corners [A, 4] int32 (anchor_corner_indices). sep: optional
    separable_corners(...) factorization — the mask then runs gather-free
    (identical output). Returns the standard test batch dict (no plan_*
    keys -> the backbone builds sparse-conv plans on device).
    """
    p = points.shape[1]
    valid = jnp.arange(p)[None, :] < n_points[:, None]
    if points.shape[0] == 1:
        # B=1 (the serving case): skip the batch vmap — B=1 vmaps of the
        # voxelizer's sort/scan lower measurably worse on v5e (same
        # finding as the backbone's de-vmapped downsample, PERF.md r5)
        voxels, coords, nums = (x[None] for x in voxelize_jax(
            points[0], valid[0], cfg.voxel))
    else:
        voxels, coords, nums = jax.vmap(
            lambda pt, va: voxelize_jax(pt, va, cfg.voxel))(points, valid)
    gh, gw = int(cfg.voxel.grid_size[1]), int(cfg.voxel.grid_size[0])
    if sep is not None:
        mask = jax.vmap(lambda c: anchors_mask_jax_separable(
            c, sep, cfg.model.num_anchor_per_loc, (gh, gw),
            cfg.data.anchor_area_threshold))(coords)
    else:
        mask = jax.vmap(lambda c: anchors_mask_jax(
            c, corners, (gh, gw), cfg.data.anchor_area_threshold))(coords)
    return dict(voxels=voxels, num_points=nums, coords=coords,
                anchors_mask=mask)


def init_plan_carry(cfg: SASSDConfig):
    """Persistent dense index maps for carry-style serving (see
    make_serving_step(persistent_plans=True)): one [D*H*W] int32 map per
    plan-building level plus the previous scan's active keys. Allocated
    ONCE; each step clears the previous keys' rows and scatters the new
    ones — ~50k scatter rows instead of ~410 MB of map fills per scan.
    """
    from sassd_tpu.ops import sparse as sp
    shapes = [cfg.sparse_shape]
    for _ in range(2):
        shapes.append(sp.out_shape_stride2(shapes[-1]))
    caps = cfg.caps.level_caps
    carry = {}
    for lvl, shp in enumerate(shapes):
        total = int(np.prod(shp))
        carry[f"map{lvl}"] = jnp.full((total,), -1, jnp.int32)
        carry[f"keys{lvl}"] = jnp.full((caps[lvl],), sp.INVALID_KEY,
                                       jnp.int32)
    return carry


def _plans_from_carry(coords0: jnp.ndarray, carry: Dict, cfg: SASSDConfig):
    """Build the full serving plan set (host_plans-format dict) from raw
    level-0 coords using PERSISTENT index maps.

    coords0 [cap0, 3] (single sample). Returns (plans dict with [1, ...]
    batch dims, new carry). Plans are identical to the per-scan path
    (tests/test_serve.py): the maps differ only in how the -1 background
    is produced (delta-clear vs full fill).
    """
    from sassd_tpu.ops import sparse as sp
    shapes = [cfg.sparse_shape]
    for _ in range(2):
        shapes.append(sp.out_shape_stride2(shapes[-1]))
    caps = cfg.caps.level_caps

    def update_map(m, prev_keys, keys):
        total = m.shape[0]
        pk = jnp.where(prev_keys != sp.INVALID_KEY, prev_keys, total)
        m = m.at[pk].set(-1, mode="drop")
        rows = jnp.arange(keys.shape[0], dtype=jnp.int32)
        nk = jnp.where(keys != sp.INVALID_KEY, keys, total)
        return m.at[nk].set(rows, mode="drop")

    def asplan(plan: sp.SubmPlan):
        return jnp.where(plan.found, plan.idx, -1).astype(jnp.int32)[None]

    plans, new_carry = {}, {}
    keys = sp.coords_to_keys(coords0, shapes[0])
    coords = coords0
    for lvl, shp in enumerate(shapes):
        m = update_map(carry[f"map{lvl}"], carry[f"keys{lvl}"], keys)
        new_carry[f"map{lvl}"] = m
        new_carry[f"keys{lvl}"] = keys
        plans[f"subm{lvl}"] = asplan(sp.build_subm_plan(
            keys, shp, index_map=m))
        out_keys = sp.downsample_keys(keys, shp, caps[lvl + 1])
        plans[f"stride{lvl + 1}"] = asplan(sp.build_stride_plan(
            keys, out_keys, shp, index_map=m))
        keys = out_keys
        coords = sp.keys_to_coords(keys, sp.out_shape_stride2(shp))
        plans[f"coords{lvl + 1}"] = coords[None]
    return plans, new_carry


def make_serving_step(cfg: SASSDConfig, anchors_np: np.ndarray,
                      anchors_bv_np: np.ndarray, packed_layout=None,
                      persistent_plans: bool = False):
    """Jitted step(params, state, batch) -> dets, where batch is
    dict(points [B,P,F] f32, n_points [B] int32) — or the pack_batch()-ed
    form of it when `packed_layout` is given (train.loop.batch_pack_layout;
    one h2d buffer per dtype for networked accelerators).

    The graph runs the device-plans sparse path regardless of
    cfg.model.host_plans (there is no loader to build plans here).

    persistent_plans (bs=1 only): plan index maps live ACROSS scans as a
    donated carry — each step delta-clears the previous scan's rows
    instead of refilling ~410 MB of dense maps. The step then has
    signature step(params, state, carry, batch) -> (dets, carry) with
    carry from init_plan_carry(cfg); detections are identical either way
    (tests/test_serve.py).
    """
    corners = jnp.asarray(anchor_corner_indices(
        anchors_bv_np, cfg.voxel.voxel_size, cfg.voxel.point_cloud_range,
        cfg.voxel.grid_size))
    sep = separable_corners(anchors_bv_np, cfg)
    anchors = jnp.asarray(anchors_np)

    def unpack(batch):
        if packed_layout is not None:
            from sassd_tpu.train.loop import unpack_batch
            batch = unpack_batch(batch, packed_layout)
        return batch

    if persistent_plans:
        @functools.partial(jax.jit, donate_argnums=(2,))
        def step_p(params, state, carry, batch):
            batch = unpack(batch)
            full = batch_from_points(batch["points"], batch["n_points"],
                                     corners, cfg, sep=sep)
            if full["coords"].shape[0] != 1:
                raise ValueError("persistent_plans serving is batch_size=1 "
                                 "only (one carry per scan stream)")
            plans, carry = _plans_from_carry(full["coords"][0], carry, cfg)
            full.update({f"plan_{k}": v for k, v in plans.items()})
            return detector.forward_test(params, state, full, anchors,
                                         cfg), carry

        return step_p

    @jax.jit
    def step(params, state, batch):
        batch = unpack(batch)
        full = batch_from_points(batch["points"], batch["n_points"],
                                 corners, cfg, sep=sep)
        return detector.forward_test(params, state, full, anchors, cfg)

    return step


class PointsView:
    """Dataset adapter for device-resident serving: wraps any dataset with a
    `load_points(idx) -> (points, meta)` method and yields
    dict(points [P,F] f32, n_points int32, meta) samples — the loader's
    whole per-scan job in this mode is a range crop + pad."""

    def __init__(self, dataset, cfg: SASSDConfig):
        self.dataset = dataset
        self.cfg = cfg

    def __len__(self):
        return len(self.dataset)

    def __getitem__(self, idx):
        points, meta = self.dataset.load_points(idx)
        pts, n = prepare_points(points, self.cfg)
        return dict(points=pts, n_points=np.asarray(n), meta=meta)
