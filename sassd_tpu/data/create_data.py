"""Offline data preparation: info files, reduced clouds, GT database.

Equivalent of /root/reference/tools/create_data.py:
  * create_kitti_info_file (:50-104) — per-split pickle of image/calib/label
    metadata incl. num_points_in_gt
  * create_reduced_point_cloud (:107-165) — frustum-cropped velodyne scans
  * create_groundtruth_database (:168-270) — per-GT point crops + dbinfos
    pickle for GT-paste augmentation
"""
from __future__ import annotations

import pickle
from pathlib import Path
from typing import List, Optional

import numpy as np

from . import augment as aug
from . import calib as calib_lib
from .kitti import png_shape, _DEFAULT_IMAGE_SHAPE


def _difficulty(obj: calib_lib.Object3d) -> int:
    """KITTI easy/moderate/hard binning (kitti_common.py:476-519)."""
    height = obj.box2d[3] - obj.box2d[1]
    if height >= 40 and obj.occlusion <= 0 and obj.truncation <= 0.15:
        return 0
    if height >= 25 and obj.occlusion <= 1 and obj.truncation <= 0.3:
        return 1
    if height >= 25 and obj.occlusion <= 2 and obj.truncation <= 0.5:
        return 2
    return -1


def _load_split(root: Path, split: str) -> List[int]:
    with open(root / "ImageSets" / f"{split}.txt") as f:
        return [int(x) for x in f.read().split()]


def create_kitti_info_file(data_root: str, splits=("train", "val"),
                           use_reduced: bool = False):
    """Write kitti_infos_{split}.pkl with per-sample metadata."""
    root = Path(data_root)
    tdir = root / "training"
    for split in splits:
        infos = []
        for sid in _load_split(root, split):
            calib = calib_lib.Calibration(tdir / "calib" / f"{sid:06d}.txt")
            img = tdir / "image_2" / f"{sid:06d}.png"
            img_shape = png_shape(img) if img.exists() else _DEFAULT_IMAGE_SHAPE
            info = dict(sample_idx=sid, img_shape=img_shape,
                        calib=dict(P2=calib.P2, P3=calib.P3, R0=calib.R0,
                                   V2C=calib.V2C))
            label = tdir / "label_2" / f"{sid:06d}.txt"
            if label.exists():
                objs = calib_lib.read_label(label)
                lidar_dir = "velodyne_reduced" if use_reduced else "velodyne"
                pts_path = tdir / lidar_dir / f"{sid:06d}.bin"
                if not pts_path.exists():
                    pts_path = tdir / "velodyne_reduced" / f"{sid:06d}.bin"
                points = calib_lib.read_lidar(pts_path)
                boxes = [o.box3d for o in objs]
                names, nums, diffs = [], [], []
                if boxes:
                    lboxes = np.stack(boxes)
                    lboxes[:, :3] = calib_lib.project_rect_to_velo(
                        lboxes[:, :3], calib)
                    in_box = aug.points_in_rbbox_np(points, lboxes)
                    nums = in_box.sum(0).tolist()
                names = [o.type for o in objs]
                diffs = [_difficulty(o) for o in objs]
                info["annos"] = dict(name=names, num_points_in_gt=nums,
                                     difficulty=diffs)
            infos.append(info)
        out = root / f"kitti_infos_{split}.pkl"
        with open(out, "wb") as f:
            pickle.dump(infos, f)
        print(f"wrote {out} ({len(infos)} samples)")


def create_reduced_point_cloud(data_root: str, splits=("train", "val")):
    """Frustum-crop velodyne scans into velodyne_reduced/."""
    root = Path(data_root)
    tdir = root / "training"
    out_dir = tdir / "velodyne_reduced"
    out_dir.mkdir(exist_ok=True)
    for split in splits:
        for sid in _load_split(root, split):
            src = tdir / "velodyne" / f"{sid:06d}.bin"
            if not src.exists():
                continue
            points = calib_lib.read_lidar(src)
            calib = calib_lib.Calibration(tdir / "calib" / f"{sid:06d}.txt")
            img = tdir / "image_2" / f"{sid:06d}.png"
            shape = png_shape(img) if img.exists() else _DEFAULT_IMAGE_SHAPE
            reduced = calib_lib.remove_outside_points(points, calib, shape)
            reduced.tofile(out_dir / f"{sid:06d}.bin")


def create_groundtruth_database(data_root: str, split: str = "train",
                                classes: Optional[List[str]] = None):
    """Crop per-GT point clusters -> gt_database/*.bin + kitti_dbinfos pkl."""
    root = Path(data_root)
    tdir = root / "training"
    db_dir = root / "gt_database"
    db_dir.mkdir(exist_ok=True)
    db_infos: dict = {}
    for sid in _load_split(root, split):
        label = tdir / "label_2" / f"{sid:06d}.txt"
        if not label.exists():
            continue
        objs = [o for o in calib_lib.read_label(label) if o.type != "DontCare"]
        if not objs:
            continue
        calib = calib_lib.Calibration(tdir / "calib" / f"{sid:06d}.txt")
        lidar = tdir / "velodyne_reduced" / f"{sid:06d}.bin"
        if not lidar.exists():
            lidar = tdir / "velodyne" / f"{sid:06d}.bin"
        points = calib_lib.read_lidar(lidar)
        boxes = np.stack([o.box3d for o in objs])
        boxes[:, :3] = calib_lib.project_rect_to_velo(boxes[:, :3], calib)
        in_box = aug.points_in_rbbox_np(points, boxes)
        for i, obj in enumerate(objs):
            if classes is not None and obj.type not in classes:
                continue
            crop = points[in_box[:, i]].copy()
            crop[:, :3] -= boxes[i, :3]          # store box-relative points
            fname = f"{sid:06d}_{obj.type}_{i}.bin"
            crop.tofile(db_dir / fname)
            db_infos.setdefault(obj.type, []).append(dict(
                name=obj.type, path=f"gt_database/{fname}",
                box3d_lidar=boxes[i].astype(np.float32),
                num_points_in_gt=int(in_box[:, i].sum()),
                difficulty=_difficulty(obj), image_idx=sid, gt_idx=i))
    out = root / "kitti_dbinfos_train.pkl"
    with open(out, "wb") as f:
        pickle.dump(db_infos, f)
    counts = {k: len(v) for k, v in db_infos.items()}
    print(f"wrote {out}: {counts}")
    return db_infos
