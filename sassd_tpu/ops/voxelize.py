"""Point-cloud voxelization.

Two implementations with identical semantics:

  * :func:`voxelize_np` — host-side numpy (vectorized; replaces the numba JIT
    kernel /root/reference/mmdet/ops/points_op/points_ops.py:5-50 that runs in
    the reference's dataloader workers). Preserves the reference's
    deterministic first-come semantics: voxels appear in order of first point
    occurrence, each voxel keeps the first `max_points` points in scan order,
    and the first `max_voxels` voxels win.

  * :func:`voxelize_jax` — on-device, jit/vmap-compatible, static shapes.
    Sort-based instead of hash-based (TPU-native: no mutexes, no atomics —
    see the reference's own note that CUDA voxelization was avoided because
    "numba.cuda don't support mutex", points_ops.py:62-63). Voxels come out
    ordered by spatial key instead of first-occurrence order, which is exactly
    what the sparse backbone wants (it consumes key-sorted voxel sets); the
    per-voxel point truncation is still first-come in scan order.

Voxel layout: voxels [M, T, F] (zero-padded), coords [M, 3] zyx int32
(padded rows = -1), num_points [M].
"""
from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class VoxelConfig:
    """Voxel grid specification (mirrors core/point_cloud/voxel_generator.py)."""
    voxel_size: Tuple[float, float, float] = (0.05, 0.05, 0.1)
    point_cloud_range: Tuple[float, ...] = (0.0, -40.0, -3.0, 70.4, 40.0, 1.0)
    max_num_points: int = 5
    max_voxels: int = 20000

    @property
    def grid_size(self) -> np.ndarray:
        """[3] xyz voxel counts: round((max-min)/size) (voxel_generator.py:13-15)."""
        pcr = np.asarray(self.point_cloud_range, np.float64)
        vs = np.asarray(self.voxel_size, np.float64)
        return np.round((pcr[3:] - pcr[:3]) / vs).astype(np.int64)

    @property
    def sparse_shape(self) -> Tuple[int, int, int]:
        """(D, H, W) zyx grid shape for the sparse backbone."""
        gx, gy, gz = self.grid_size
        return int(gz), int(gy), int(gx)


def voxelize_np(points: np.ndarray, cfg: VoxelConfig,
                pad: bool = False, use_native: bool = True):
    """Host voxelization with reference-exact first-come semantics.

    Uses the C++ kernel (csrc/sassd_host.cpp) when built — the fast lane for
    dataloader workers — with this vectorized numpy path as fallback.

    Args:
      points: [N, F] with xyz in the first 3 columns.
      pad: if True, zero-pad outputs to [max_voxels, ...] static shapes.
    Returns:
      voxels [M, T, F] float32, coords [M, 3] int32 (zyx), num_points [M] int32.
      Rows are SORTED ascending by linearized zyx key (padding last) — the
      sparse engine's packed triple gather relies on x-consecutive active
      cells occupying adjacent rows. Per-voxel contents and the max_voxels
      truncation keep the reference's first-come semantics.
    """
    if use_native:
        from . import native
        if native.available():
            v, c, n, m = native.voxelize_cpp(
                points, np.asarray(cfg.point_cloud_range[:3], np.float32),
                np.asarray(cfg.voxel_size, np.float32),
                cfg.grid_size, cfg.max_num_points, cfg.max_voxels)
            v, c, n = _sort_rows_by_key(v, c, n, cfg.grid_size)
            if pad:
                return v, c, n
            return v[:m], c[:m], n[:m]
    pcr = np.asarray(cfg.point_cloud_range, np.float32)
    vs = np.asarray(cfg.voxel_size, np.float32)
    grid = cfg.grid_size
    T, Vmax = cfg.max_num_points, cfg.max_voxels

    c = np.floor((points[:, :3] - pcr[:3]) / vs).astype(np.int64)  # xyz
    ok = np.all((c >= 0) & (c < grid), axis=1)
    pidx = np.nonzero(ok)[0]
    c = c[pidx]
    keys = (c[:, 2] * grid[1] + c[:, 1]) * grid[0] + c[:, 0]       # z,y,x linear

    # first-occurrence voxel ordering (reference hash-assignment order)
    uniq, first_idx, inverse = np.unique(keys, return_index=True,
                                         return_inverse=True)
    order = np.argsort(first_idx, kind="stable")                   # voxel order
    rank_of_sorted = np.empty_like(order)
    rank_of_sorted[order] = np.arange(len(order))
    vox_id = rank_of_sorted[inverse]                               # per point

    # first-come slot within each voxel (stable sort by (vox, scan order))
    sort_key = np.argsort(vox_id, kind="stable")
    counts = np.bincount(vox_id, minlength=len(uniq))
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    slot_sorted = np.arange(len(vox_id)) - np.repeat(starts, counts)
    slot = np.empty_like(slot_sorted)
    slot[sort_key] = slot_sorted

    keep = (slot < T) & (vox_id < Vmax)
    m = min(len(uniq), Vmax)

    voxels = np.zeros((m, T, points.shape[1]), np.float32)
    voxels[vox_id[keep], slot[keep]] = points[pidx[keep]]
    num_points = np.minimum(counts[:m], T).astype(np.int32)
    coords = np.zeros((m, 3), np.int32)
    cc = c[first_idx[order[:m]]]
    coords[:, 0], coords[:, 1], coords[:, 2] = cc[:, 2], cc[:, 1], cc[:, 0]

    voxels, coords, num_points = _sort_rows_by_key(
        voxels, coords, num_points, grid)
    if pad and m < Vmax:
        voxels = np.concatenate(
            [voxels, np.zeros((Vmax - m, T, points.shape[1]), np.float32)])
        coords = np.concatenate(
            [coords, np.full((Vmax - m, 3), -1, np.int32)])
        num_points = np.concatenate(
            [num_points, np.zeros(Vmax - m, np.int32)])
    return voxels, coords, num_points


def _sort_rows_by_key(voxels, coords, nums, grid_xyz):
    """Reorder voxel rows ascending by (z*H + y)*W + x; -1 padding sinks last."""
    gx, gy = int(grid_xyz[0]), int(grid_xyz[1])
    z = coords[:, 0].astype(np.int64)
    key = (z * gy + coords[:, 1]) * gx + coords[:, 2]
    key = np.where(z >= 0, key, np.iinfo(np.int64).max)
    perm = np.argsort(key, kind="stable")
    return voxels[perm], coords[perm], nums[perm]


def voxelize_jax(points: jnp.ndarray, valid: jnp.ndarray, cfg: VoxelConfig):
    """On-device voxelization (jit/vmap-safe, static shapes).

    Args:
      points: [N, F] padded point cloud (xyz first).
      valid:  [N] bool point validity.
    Returns:
      voxels [max_voxels, T, F] (zero-padded),
      coords [max_voxels, 3] int32 zyx (-1 padded), sorted by spatial key,
      num_points [max_voxels] int32.
    """
    pcr = jnp.asarray(cfg.point_cloud_range[:3], points.dtype)
    vs = jnp.asarray(cfg.voxel_size, points.dtype)
    grid = cfg.grid_size
    T, Vmax = cfg.max_num_points, cfg.max_voxels
    n = points.shape[0]
    BIG = jnp.int32(np.iinfo(np.int32).max)

    c = jnp.floor((points[:, :3] - pcr) / vs).astype(jnp.int32)
    ok = valid & jnp.all((c >= 0) & (c < jnp.asarray(grid, jnp.int32)), axis=1)
    keys = (c[:, 2] * np.int32(grid[1]) + c[:, 1]) * np.int32(grid[0]) + c[:, 0]
    keys = jnp.where(ok, keys, BIG)

    # stable sort by key keeps scan order within a voxel -> first-come slots
    perm = jnp.argsort(keys, stable=True)
    ks = keys[perm]
    first = jnp.concatenate([jnp.array([True]), ks[1:] != ks[:-1]]) & (ks != BIG)
    vox_id = jnp.cumsum(first.astype(jnp.int32)) - 1                # per sorted pt
    # slot within voxel = distance from run start
    run_start = jnp.where(first, jnp.arange(n), 0)
    run_start = jax.lax.associative_scan(jnp.maximum, run_start)
    slot = jnp.arange(n) - run_start
    keep = (ks != BIG) & (slot < T) & (vox_id < Vmax)

    # all scatter index sequences below are nondecreasing — points are key-
    # sorted so vox_id ascends; rows dropped for slot overflow pin to the
    # IN-ORDER out-of-bounds index (vox_id, T) rather than a constant, and
    # the BIG-key tail (which sorts last) pins to Vmax. The sorted-scatter
    # TPU lowering is ~1.6x faster (PERF.md round 5).
    vrow = jnp.where((ks != BIG) & (vox_id < Vmax), vox_id, Vmax)
    voxels = jnp.zeros((Vmax, T, points.shape[1]), points.dtype)
    voxels = voxels.at[vrow, jnp.minimum(slot, T)].set(
        points[perm], mode="drop", indices_are_sorted=True)
    # per-voxel count: scatter-MAX of min(slot+1, T) — slot-overflow rows
    # contribute the same clipped value as the voxel's T-th point, so every
    # row scatters and the index sequence stays sorted
    num_points = jnp.zeros((Vmax,), jnp.int32).at[vrow].max(
        jnp.minimum(slot + 1, T), mode="drop", indices_are_sorted=True)

    cz = c[perm]
    coords = jnp.full((Vmax, 3), -1, jnp.int32)
    # every point of a voxel writes the voxel's (identical) cell coords —
    # not just the run's first point — so the index stays nondecreasing
    coords = coords.at[vrow, 0].set(cz[:, 2], mode="drop",
                                    indices_are_sorted=True)
    coords = coords.at[vrow, 1].set(cz[:, 1], mode="drop",
                                    indices_are_sorted=True)
    coords = coords.at[vrow, 2].set(cz[:, 0], mode="drop",
                                    indices_are_sorted=True)
    return voxels, coords, num_points


def bound_points_np(points: np.ndarray, pcr: Sequence[float]) -> np.ndarray:
    """Crop points to a range box (points_ops.py:167-182 semantics)."""
    m = ((points[:, 0] >= pcr[0]) & (points[:, 0] < pcr[3])
         & (points[:, 1] >= pcr[1]) & (points[:, 1] < pcr[4])
         & (points[:, 2] >= pcr[2]) & (points[:, 2] < pcr[5]))
    return points[m]


def points_to_bev_np(points: np.ndarray, cfg: VoxelConfig) -> np.ndarray:
    """Handcrafted BEV raster: per-z occupancy + max intensity + point density.

    Capability parity with points_to_bev_kernel (/root/reference/mmdet/ops/
    points_op/src/points_op.cpp:18-61; unused by the reference's active
    configs): returns [Z+2, H, W] where channels [0..Z) are per-z-bin
    occupancy, channel Z is the max reflectance and channel Z+1 the point
    count of each BEV cell.
    """
    gx, gy, gz = (int(g) for g in cfg.grid_size)
    pcr = np.asarray(cfg.point_cloud_range, np.float32)
    vs = np.asarray(cfg.voxel_size, np.float32)
    c = np.floor((points[:, :3] - pcr[:3]) / vs).astype(np.int64)
    ok = np.all((c >= 0) & (c < np.array([gx, gy, gz])), axis=1)
    x, y, z = c[ok, 0], c[ok, 1], c[ok, 2]
    bev = np.zeros((gz + 2, gy, gx), np.float32)
    bev[z, y, x] = 1.0
    np.maximum.at(bev[gz], (y, x), points[ok, 3])
    np.add.at(bev[gz + 1], (y, x), 1.0)
    return bev


def points_to_bev_jax(points: jnp.ndarray, valid: jnp.ndarray,
                      cfg: VoxelConfig) -> jnp.ndarray:
    """Jittable points_to_bev_np (fixed [N,4] input + valid mask)."""
    gx, gy, gz = (int(g) for g in cfg.grid_size)
    pcr = jnp.asarray(cfg.point_cloud_range, jnp.float32)
    vs = jnp.asarray(cfg.voxel_size, jnp.float32)
    c = jnp.floor((points[:, :3] - pcr[:3]) / vs).astype(jnp.int32)
    ok = valid & jnp.all((c >= 0) & (c < jnp.array([gx, gy, gz])), axis=1)
    x = jnp.where(ok, c[:, 0], 0)
    y = jnp.where(ok, c[:, 1], 0)
    z = jnp.where(ok, c[:, 2], 0)
    occ = jnp.zeros((gz, gy, gx), jnp.float32).at[z, y, x].max(
        ok.astype(jnp.float32))
    inten = jnp.zeros((gy, gx), jnp.float32).at[y, x].max(
        jnp.where(ok, points[:, 3], 0.0))
    dens = jnp.zeros((gy, gx), jnp.float32).at[y, x].add(
        ok.astype(jnp.float32))
    return jnp.concatenate([occ, inten[None], dens[None]], axis=0)
