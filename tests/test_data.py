"""Data pipeline tests: synthetic KITTI layout -> dataset -> batches."""
import numpy as np
import pytest

from sassd_tpu.data import augment as aug
from sassd_tpu.data import create_data, loader, synthetic
from sassd_tpu.data.kitti import KittiDataset, build_anchors, collate
from tiny_config import tiny_config


@pytest.fixture(scope="module")
def kitti_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti")
    synthetic.write_synthetic_kitti(root, n_train=6, n_val=3, seed=0)
    return root


@pytest.fixture(scope="module")
def cfg():
    import dataclasses
    c = tiny_config()
    # widen the voxel range to the synthetic scene extent
    from sassd_tpu.ops.voxelize import VoxelConfig
    return dataclasses.replace(
        c,
        voxel=VoxelConfig(voxel_size=(0.4, 0.4, 0.5),
                          point_cloud_range=(0, -40.0, -3.0, 70.4, 40.0, 1.0),
                          max_num_points=5, max_voxels=4000),
        anchors={"Car": dataclasses.replace(
            c.anchors["Car"], strides=(3.2, 3.2, 1.0),
            offsets=(1.6, -38.4, -1.78))},
    )


def test_collision_test_oracle():
    rng = np.random.default_rng(0)
    centers = rng.uniform(-5, 5, (10, 2))
    dims = rng.uniform(1, 3, (10, 2))
    angles = rng.uniform(-np.pi, np.pi, 10)
    corners = aug.corners_2d(centers, dims, angles)
    got = aug.box_collision_test(corners, corners)
    # oracle via dense rasterization
    from sassd_tpu.core import riou
    boxes5 = np.concatenate([centers, dims, angles[:, None]], 1)
    inter = riou.rotate_overlap_bev_np(boxes5, boxes5)
    expect = inter > 1e-9
    # SAT counts touching as collision; tolerate boundary-only differences
    disagree = got != expect
    assert disagree.sum() <= 2, f"{disagree.sum()} disagreements"
    assert np.all(np.diag(got))


def test_points_in_rbbox_consistency():
    rng = np.random.default_rng(1)
    boxes = np.zeros((4, 7), np.float32)
    boxes[:, :2] = rng.uniform(-5, 5, (4, 2))
    boxes[:, 2] = -1.5
    boxes[:, 3:6] = [1.6, 3.9, 1.56]
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, 4)
    pts = synthetic.sample_box_points(boxes[2], 50, rng)
    inb = aug.points_in_rbbox_np(pts, boxes)
    assert inb[:, 2].mean() > 0.95  # surface points are inside their box


def test_dataset_shapes_and_gt(kitti_root, cfg):
    ds = KittiDataset(cfg, kitti_root / "training",
                      kitti_root / "ImageSets" / "train.txt")
    s = ds[0]
    v = cfg.voxel.max_voxels
    assert s["voxels"].shape == (v, 5, 4)
    assert s["coords"].shape == (v, 3)
    assert s["num_points"].shape == (v,)
    assert s["anchors_mask"].shape == (cfg.num_anchors,)
    assert s["gt_boxes"].shape == (cfg.caps.max_gt, 7)
    assert s["gt_valid"].sum() >= 1
    # GT boxes must lie in range and have car-like sizes
    gt = s["gt_boxes"][s["gt_valid"]]
    assert np.all(gt[:, 0] >= -1) and np.all(gt[:, 0] <= 71)
    assert np.all((gt[:, 3] > 1.0) & (gt[:, 3] < 2.5))
    # yaw limited to [-pi, pi)
    assert np.all(np.abs(gt[:, 6]) <= np.pi + 1e-3)


def test_dataset_gt_points_alignment(kitti_root, cfg):
    """Points sampled on synthetic cars must fall inside the loaded GT boxes
    (validates the camera->lidar label round trip end to end)."""
    import dataclasses
    cfg2 = dataclasses.replace(cfg, data=dataclasses.replace(
        cfg.data, gt_sampling=False, flip_ratio=0.0))
    ds = KittiDataset(cfg2, kitti_root / "training",
                      kitti_root / "ImageSets" / "train.txt")
    ds.augmentor = None
    s = ds.prepare_train(1)
    gt = s["gt_boxes"][s["gt_valid"]]
    # reconstruct points from voxels
    nums = s["num_points"]
    pts = s["voxels"][nums > 0].reshape(-1, 4)
    pts = pts[np.abs(pts).sum(1) > 0]
    enlarged = gt.copy()
    enlarged[:, 3:6] += 0.2
    inb = aug.points_in_rbbox_np(pts, enlarged)
    # each GT box should contain a decent number of points
    assert np.all(inb.sum(0) > 10), inb.sum(0)


def test_eval_split(kitti_root, cfg):
    ds = KittiDataset(cfg, kitti_root / "training",
                      kitti_root / "ImageSets" / "val.txt", test_mode=True)
    s = ds[0]
    assert not s["gt_valid"].any()
    assert s["meta"]["sample_idx"] == 6


def test_create_data_and_augmentor(kitti_root, cfg, tmp_path):
    create_data.create_kitti_info_file(kitti_root, splits=("train",))
    db = create_data.create_groundtruth_database(kitti_root, "train")
    assert "Car" in db and len(db["Car"]) > 0
    info = db["Car"][0]
    assert info["num_points_in_gt"] > 0

    augmentor = aug.PointAugmentor(
        root_path=str(kitti_root), info_path=None,
        sample_classes=["Car"], min_num_points=5, sample_max_num=10,
        removed_difficulties=[], rng=np.random.default_rng(0), db_infos=db)
    gt = np.array([[10.0, 0.0, -1.8, 1.6, 3.9, 1.56, 0.0]], np.float32)
    sb, st, spts = augmentor.sample_all(gt, ["Car"])
    assert len(sb) > 0 and len(spts) > 0
    # sampled boxes must not collide with the existing GT
    all_c = aug.corners_2d(np.concatenate([gt, sb])[:, :2],
                           np.concatenate([gt, sb])[:, 3:5],
                           np.concatenate([gt, sb])[:, 6])
    coll = aug.box_collision_test(all_c, all_c)
    np.fill_diagonal(coll, False)
    assert not coll.any()
    # sampled points must lie inside sampled boxes
    grown = sb.copy()
    grown[:, 3:6] += 0.2
    inb = aug.points_in_rbbox_np(spts, grown)
    assert inb.any(1).mean() > 0.95


def test_noise_per_object_moves_points_with_boxes(cfg):
    rng = np.random.default_rng(3)
    augmentor = aug.PointAugmentor(
        root_path="", info_path=None, sample_classes=[], min_num_points=1,
        sample_max_num=1, removed_difficulties=[], rng=rng, db_infos={})
    boxes = np.array([[10.0, 0.0, -1.8, 1.6, 3.9, 1.56, 0.2],
                      [30.0, 5.0, -1.8, 1.6, 3.9, 1.56, -0.5]], np.float32)
    pts = np.concatenate([
        synthetic.sample_box_points(boxes[0], 100, rng),
        synthetic.sample_box_points(boxes[1], 100, rng)])
    b2, p2 = augmentor.noise_per_object(boxes.copy(), pts.copy())
    grown = b2.copy()
    grown[:, 3:6] += 0.3
    inb = aug.points_in_rbbox_np(p2, grown)
    assert inb[:100, 0].mean() > 0.9   # points followed their boxes
    assert inb[100:, 1].mean() > 0.9


def test_noise_per_object_matches_allcandidate_oracle():
    """The chunked early-exit + AABB-prefilter fast path must select exactly
    the same jitter as testing every candidate at once (the semantics of the
    reference's sequential numba loop, point_augmentor.py:73-101)."""

    def oracle(boxes, pts, std, rot_range, seed, num_try=100):
        rng = np.random.default_rng(seed)
        n = boxes.shape[0]
        loc = rng.normal(scale=std, size=(n, num_try, 3))
        rot = rng.uniform(rot_range[0], rot_range[1], size=(n, num_try))
        corners = aug.corners_2d(boxes[:, :2], boxes[:, 3:5], boxes[:, 6])
        masks = aug.points_in_rbbox_np(pts, boxes)
        ch_loc = np.zeros((n, 3))
        ch_rot = np.zeros((n,))
        for i in range(n):
            local = corners[i] - boxes[i, :2]
            c, s = np.cos(rot[i])[:, None], np.sin(rot[i])[:, None]
            cand = np.stack([local[None, :, 0] * c + local[None, :, 1] * s,
                             -local[None, :, 0] * s + local[None, :, 1] * c],
                            axis=-1)
            cand += boxes[i, :2] + loc[i, :, :2][:, None, :]
            coll = aug.box_collision_test(cand, corners)
            coll[:, i] = False
            ok = ~coll.any(axis=1)
            hit = np.argmax(ok)
            if ok[hit]:
                ch_loc[i], ch_rot[i] = loc[i, hit], rot[i, hit]
                corners[i] = cand[hit]
        any_box = masks.any(axis=1)
        first = np.argmax(masks, axis=1)
        idx = np.nonzero(any_box)[0]
        if idx.size:
            b = first[idx]
            rel = pts[idx, :3] - boxes[b, :3]
            c, s = np.cos(ch_rot[b]), np.sin(ch_rot[b])
            rel = np.stack([rel[:, 0] * c + rel[:, 1] * s,
                            -rel[:, 0] * s + rel[:, 1] * c, rel[:, 2]], 1)
            pts[idx, :3] = rel + boxes[b, :3] + ch_loc[b]
        boxes[:, :3] += ch_loc
        boxes[:, 6] += ch_rot
        return boxes, pts

    rng0 = np.random.default_rng(11)
    for trial in range(6):
        n = int(rng0.integers(2, 25))
        boxes = np.zeros((n, 7))
        boxes[:, :2] = rng0.uniform(-25, 25, (n, 2))
        boxes[:, 2] = rng0.uniform(-2, 0, n)
        boxes[:, 3:6] = rng0.uniform(0.5, 4.0, (n, 3))
        boxes[:, 6] = rng0.uniform(-np.pi, np.pi, n)
        pts = np.zeros((500, 4))
        pts[:, :3] = rng0.uniform(-27, 27, (500, 3))
        a = aug.PointAugmentor.__new__(aug.PointAugmentor)
        a._center_noise_std = [1.0, 1.0, 0.5]
        a._gt_rot_range = (-0.785, 0.785)
        a._rng = np.random.default_rng(trial)
        b_new, p_new = a.noise_per_object(boxes.copy(), pts.copy())
        b_ref, p_ref = oracle(boxes.copy(), pts.copy(),
                              a._center_noise_std, a._gt_rot_range, trial)
        np.testing.assert_allclose(b_new, b_ref)
        np.testing.assert_allclose(p_new, p_ref)


def test_points_in_rbbox_matches_dense_oracle():
    """Bounding-circle prefilter path == dense all-pairs rotated test."""
    rng = np.random.default_rng(5)
    for _ in range(10):
        n, m = int(rng.integers(1, 1500)), int(rng.integers(0, 10))
        pts = rng.uniform(-40, 40, (n, 4))
        boxes = np.zeros((m, 7))
        if m:
            boxes[:, :2] = rng.uniform(-35, 35, (m, 2))
            boxes[:, 2] = rng.uniform(-3, 0, m)
            boxes[:, 3:6] = rng.uniform(0.3, 5, (m, 3))
            boxes[:, 6] = rng.uniform(-4, 4, m)
        got = aug.points_in_rbbox_np(pts, boxes)
        d = pts[:, None, :2] - boxes[None, :, :2]
        c, s = np.cos(boxes[:, 6]), np.sin(boxes[:, 6])
        lx = d[..., 0] * c - d[..., 1] * s
        ly = d[..., 0] * s + d[..., 1] * c
        in_z = (pts[:, 2:3] >= boxes[None, :, 2]) & (
            pts[:, 2:3] <= boxes[None, :, 2] + boxes[None, :, 5])
        want = ((np.abs(lx) <= boxes[None, :, 3] / 2)
                & (np.abs(ly) <= boxes[None, :, 4] / 2) & in_z)
        assert (got == want).all()


def test_loader_sharding(kitti_root, cfg):
    ds = KittiDataset(cfg, kitti_root / "training",
                      kitti_root / "ImageSets" / "train.txt", test_mode=True)
    seen = []
    for shard in range(2):
        for batch, metas in loader.iterate_batches(
                ds, 2, epoch=0, seed=1, num_shards=2, shard_id=shard,
                num_workers=0):
            assert batch["voxels"].shape[0] == 2
            seen += [m["sample_idx"] for m in metas]
    assert len(seen) == 8  # 6 samples padded (by wrap) to shards x batch = 8
    assert set(seen) == set(range(6))  # every sample covered
    # deterministic across calls
    again = []
    for batch, metas in loader.iterate_batches(
            ds, 2, epoch=0, seed=1, num_shards=2, shard_id=0, num_workers=2):
        again += [m["sample_idx"] for m in metas]
    assert again == seen[:len(again)]


def test_anchors_mask_cpp_matches_numpy():
    from sassd_tpu.ops import native
    if not native.available():
        import pytest
        pytest.skip("native lib not built")
    from sassd_tpu.ops.voxelize import VoxelConfig
    vcfg = VoxelConfig(voxel_size=(0.05, 0.05, 0.1),
                       point_cloud_range=(0, -40.0, -3.0, 70.4, 40.0, 1.0),
                       max_num_points=5, max_voxels=20000)
    rng = np.random.default_rng(11)
    coords = np.full((20000, 3), -1, np.int32)
    n = 15000
    coords[:n, 0] = rng.integers(0, 40, n)
    coords[:n, 1] = rng.integers(0, 1600, n)
    coords[:n, 2] = rng.integers(0, 1408, n)
    bv = np.zeros((500, 4), np.float32)
    bv[:, 0] = rng.uniform(-1, 69, 500)
    bv[:, 1] = rng.uniform(-41, 39, 500)
    bv[:, 2] = bv[:, 0] + rng.uniform(1, 5, 500)
    bv[:, 3] = bv[:, 1] + rng.uniform(1, 5, 500)
    pcr = np.asarray(vcfg.point_cloud_range)
    got = native.anchors_mask_cpp(coords, bv, vcfg.voxel_size, pcr,
                                  vcfg.grid_size, 1.0)
    # numpy reference path
    h, w = int(vcfg.grid_size[1]), int(vcfg.grid_size[0])
    ok = coords[:, 0] >= 0
    dense = np.zeros((h, w), np.float64)
    np.add.at(dense, (coords[ok, 1], coords[ok, 2]), 1.0)
    integral = dense.cumsum(0).cumsum(1)
    x0 = np.clip(np.floor((bv[:, 0] - pcr[0]) / vcfg.voxel_size[0]).astype(int), 0, w - 1)
    y0 = np.clip(np.floor((bv[:, 1] - pcr[1]) / vcfg.voxel_size[1]).astype(int), 0, h - 1)
    x1 = np.clip(np.floor((bv[:, 2] - pcr[0]) / vcfg.voxel_size[0]).astype(int), 0, w - 1)
    y1 = np.clip(np.floor((bv[:, 3] - pcr[1]) / vcfg.voxel_size[1]).astype(int), 0, h - 1)
    area = integral[y1, x1] - integral[y0, x1] - integral[y1, x0] + integral[y0, x0]
    np.testing.assert_array_equal(got, area > 1.0)


def test_create_reduced_point_cloud(kitti_root):
    """velodyne -> frustum-cropped velodyne_reduced (create_data.py:107-165)."""
    import shutil
    from sassd_tpu.data import calib as calib_lib
    tdir = kitti_root / "training"
    (tdir / "velodyne").mkdir(exist_ok=True)
    rng = np.random.default_rng(0)
    # full 360-degree scan: points behind the camera must be cropped
    pts = np.zeros((5000, 4), np.float32)
    pts[:, 0] = rng.uniform(-60, 60, 5000)
    pts[:, 1] = rng.uniform(-60, 60, 5000)
    pts[:, 2] = rng.uniform(-2, 1, 5000)
    sid = 0
    pts.tofile(tdir / "velodyne" / f"{sid:06d}.bin")
    out = tdir / "velodyne_reduced" / f"{sid:06d}.bin"
    backup = None
    if out.exists():
        backup = out.read_bytes()
    create_data.create_reduced_point_cloud(kitti_root, splits=("train",))
    reduced = np.fromfile(out, np.float32).reshape(-1, 4)
    assert 0 < len(reduced) < len(pts)
    assert np.all(reduced[:, 0] > 0)       # all in front of the camera
    cal = calib_lib.Calibration(tdir / "calib" / f"{sid:06d}.txt")
    uv = calib_lib.project_rect_to_image(
        calib_lib.project_velo_to_rect(reduced[:, :3], cal), cal)
    assert np.all((uv[:, 0] >= 0) & (uv[:, 0] < 1242))
    if backup is not None:
        out.write_bytes(backup)
    shutil.rmtree(tdir / "velodyne")


def test_points_to_bev_matches_reference_semantics():
    from sassd_tpu.ops.voxelize import (VoxelConfig, points_to_bev_np,
                                        points_to_bev_jax)
    cfg = VoxelConfig(voxel_size=(0.5, 0.5, 0.5),
                      point_cloud_range=(0, 0, 0, 4, 4, 2),
                      max_num_points=5, max_voxels=100)
    rng = np.random.default_rng(0)
    pts = rng.uniform(-0.5, 4.5, (200, 4)).astype(np.float32)
    pts[:, 2] = rng.uniform(-0.2, 2.2, 200)
    pts[:, 3] = rng.uniform(0, 1, 200)
    bev = points_to_bev_np(pts, cfg)
    gz, gy, gx = 4, 8, 8
    assert bev.shape == (gz + 2, gy, gx)
    # brute-force oracle
    occ = np.zeros((gz, gy, gx)); inten = np.zeros((gy, gx))
    dens = np.zeros((gy, gx))
    for p in pts:
        c = np.floor(p[:3] / 0.5).astype(int)
        if np.any(c < 0) or c[0] >= gx or c[1] >= gy or c[2] >= gz:
            continue
        occ[c[2], c[1], c[0]] = 1
        inten[c[1], c[0]] = max(inten[c[1], c[0]], p[3])
        dens[c[1], c[0]] += 1
    np.testing.assert_allclose(bev[:gz], occ)
    np.testing.assert_allclose(bev[gz], inten)
    np.testing.assert_allclose(bev[gz + 1], dens)
    import jax.numpy as jnp
    bev_j = np.asarray(points_to_bev_jax(
        jnp.asarray(pts), jnp.ones(200, bool), cfg))
    np.testing.assert_allclose(bev_j, bev, atol=1e-6)


def test_image_transform():
    from sassd_tpu.data.image import ImageTransform, imrescale, bbox_flip
    rng = np.random.default_rng(1)
    img = (rng.uniform(0, 255, (100, 140, 3))).astype(np.uint8)
    tf = ImageTransform(mean=(10, 20, 30), std=(2, 2, 2), to_rgb=True,
                        size_divisor=32)
    out, shape, pad_shape, f = tf(img, 0.5, flip=True)
    assert out.shape[0] == 3 and out.ndim == 3
    assert shape[:2] == (50, 70)
    assert pad_shape[0] % 32 == 0 and pad_shape[1] % 32 == 0
    # identity rescale returns the image unchanged
    same, f1 = imrescale(img, 1.0)
    assert f1 == 1.0
    np.testing.assert_allclose(same, img.astype(np.float32), atol=1e-4)
    # bbox flip round-trips
    b = np.array([[3.0, 5.0, 20.0, 30.0]])
    np.testing.assert_allclose(bbox_flip(bbox_flip(b, (50, 70)), (50, 70)), b)
