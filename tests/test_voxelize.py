"""Voxelizer tests: numpy vs reference semantics, jax vs numpy."""
import numpy as np
import jax.numpy as jnp

from sassd_tpu.ops import voxelize as V


CFG = V.VoxelConfig(voxel_size=(0.05, 0.05, 0.1),
                    point_cloud_range=(0, -40.0, -3.0, 70.4, 40.0, 1.0),
                    max_num_points=5, max_voxels=20000)


def reference_voxelize(points, cfg):
    """Literal transcription of points_ops.py:5-50 (python loop oracle)."""
    grid = cfg.grid_size
    table = {}
    voxels, coords, nums = [], [], []
    for p in points:
        c = np.floor((p[:3] - np.asarray(cfg.point_cloud_range[:3]))
                     / np.asarray(cfg.voxel_size)).astype(int)
        if np.any(c < 0) or np.any(c >= grid):
            continue
        key = (c[2], c[1], c[0])  # zyx
        if key not in table:
            if len(voxels) >= cfg.max_voxels:
                continue
            table[key] = len(voxels)
            voxels.append(np.zeros((cfg.max_num_points, len(p)), np.float32))
            coords.append(key)
            nums.append(0)
        vid = table[key]
        if nums[vid] < cfg.max_num_points:
            voxels[vid][nums[vid]] = p
            nums[vid] += 1
    return (np.asarray(voxels, np.float32).reshape(-1, cfg.max_num_points,
                                                   points.shape[1]),
            np.asarray(coords, np.int32).reshape(-1, 3),
            np.asarray(nums, np.int32))


def random_points(seed, n=3000):
    rng = np.random.default_rng(seed)
    pts = np.zeros((n, 4), np.float32)
    pts[:, 0] = rng.uniform(-5, 75, n)       # includes out-of-range
    pts[:, 1] = rng.uniform(-45, 45, n)
    pts[:, 2] = rng.uniform(-4, 2, n)
    pts[:, 3] = rng.uniform(0, 1, n)
    # force collisions: duplicate some points with tiny jitter
    pts[n // 2:] = pts[: n - n // 2] + rng.normal(0, 0.01, (n - n // 2, 4)).astype(np.float32)
    return pts


def sort_like_engine(vox, coords, nums, cfg):
    """Reorder reference-loop output by zyx key (voxelize_np row order)."""
    g = cfg.grid_size
    key = (coords[:, 0].astype(np.int64) * g[1] + coords[:, 1]) * g[0] \
        + coords[:, 2]
    perm = np.argsort(key, kind="stable")
    return vox[perm], coords[perm], nums[perm]


def test_voxelize_np_matches_reference_loop():
    pts = random_points(0)
    vox, coords, nums = V.voxelize_np(pts, CFG)
    rvox, rcoords, rnums = sort_like_engine(*reference_voxelize(pts, CFG), CFG)
    np.testing.assert_array_equal(coords, rcoords)
    np.testing.assert_array_equal(nums, rnums)
    np.testing.assert_allclose(vox, rvox, atol=0)
    # rows must come out key-sorted (the packed gather contract)
    g = CFG.grid_size
    key = (coords[:, 0].astype(np.int64) * g[1] + coords[:, 1]) * g[0] \
        + coords[:, 2]
    assert np.all(np.diff(key) > 0)


def test_voxelize_np_max_voxels_cap():
    cfg = V.VoxelConfig(voxel_size=(0.05, 0.05, 0.1),
                        point_cloud_range=CFG.point_cloud_range,
                        max_num_points=2, max_voxels=50)
    pts = random_points(1)
    vox, coords, nums = V.voxelize_np(pts, cfg)
    rvox, rcoords, rnums = sort_like_engine(*reference_voxelize(pts, cfg), cfg)
    assert len(coords) == 50
    np.testing.assert_array_equal(coords, rcoords)
    np.testing.assert_allclose(vox, rvox, atol=0)


def test_voxelize_jax_matches_np_as_sets():
    pts = random_points(2, n=2000)
    vox_n, coords_n, nums_n = V.voxelize_np(pts, CFG)
    vox_j, coords_j, nums_j = V.voxelize_jax(
        jnp.asarray(pts), jnp.ones(len(pts), bool), CFG)
    vox_j, coords_j, nums_j = map(np.asarray, (vox_j, coords_j, nums_j))
    m = nums_j > 0
    assert m.sum() == len(coords_n)
    # same voxel set with identical contents (order differs: jax is key-sorted)
    def keyed(coords, vox, nums):
        d = {}
        for i in range(len(coords)):
            d[tuple(coords[i])] = (nums[i], np.sort(vox[i, :nums[i]], axis=0))
        return d
    dn = keyed(coords_n, vox_n, nums_n)
    dj = keyed(coords_j[m], vox_j[m], nums_j[m])
    assert dn.keys() == dj.keys()
    for k in dn:
        assert dn[k][0] == dj[k][0]
        np.testing.assert_allclose(dn[k][1], dj[k][1], atol=0)
    # key-sorted order
    keys = (coords_j[m][:, 0].astype(np.int64) * 1600 + coords_j[m][:, 1]) * 1408 \
        + coords_j[m][:, 2]
    assert np.all(np.diff(keys) > 0)


def test_voxelize_jax_first_come_truncation():
    """Points beyond max_num_points per voxel are dropped in scan order."""
    cfg = V.VoxelConfig(voxel_size=(1.0, 1.0, 1.0),
                        point_cloud_range=(0, 0, 0, 4, 4, 4),
                        max_num_points=2, max_voxels=8)
    pts = np.array([[0.5, 0.5, 0.5, 1.0],
                    [0.6, 0.6, 0.6, 2.0],
                    [0.7, 0.7, 0.7, 3.0],
                    [1.5, 0.5, 0.5, 4.0]], np.float32)
    vox, coords, nums = V.voxelize_jax(jnp.asarray(pts), jnp.ones(4, bool), cfg)
    vox, coords, nums = map(np.asarray, (vox, coords, nums))
    assert nums[0] == 2 and nums[1] == 1
    np.testing.assert_allclose(vox[0, :, 3], [1.0, 2.0])  # first two kept
    np.testing.assert_allclose(vox[1, 0, 3], 4.0)


def test_grid_size():
    np.testing.assert_array_equal(CFG.grid_size, [1408, 1600, 40])
    assert CFG.sparse_shape == (40, 1600, 1408)
