"""KITTI dataset producing fixed-shape training/eval samples.

Host-side analog of KittiLiDAR (/root/reference/mmdet/datasets/kitti.py:18-354)
re-designed for a static-shape device pipeline: every sample is a dict of
constant-shape numpy arrays (padded + masked), so batches stack trivially and
the jitted step compiles exactly once. The reference's DataContainer /
mmcv-collate / merge_second_batch machinery has no equivalent here — batching
is a plain `np.stack`.
"""
from __future__ import annotations

import os
import struct
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

from sassd_tpu.config import SASSDConfig
from sassd_tpu.core import anchors as anchor_lib
from sassd_tpu.ops.voxelize import voxelize_np
from . import augment as aug
from . import calib as calib_lib


def png_shape(path) -> tuple:
    """(height, width) from a PNG header without an image library."""
    with open(path, "rb") as f:
        head = f.read(26)
    w, h = struct.unpack(">II", head[16:24])
    return (h, w)

_DEFAULT_IMAGE_SHAPE = (375, 1242)


def build_anchors(cfg: SASSDConfig):
    """Per-class anchor grids, flattened class-major to [A, 7] (+ nearest-BEV).

    Mirrors kitti.py:81-91: feature map = voxel grid // out_size_factor.
    """
    h, w = cfg.bev_map_size
    flats = []
    for name, ac in cfg.anchors.items():
        grid = anchor_lib.create_anchors_3d_stride(
            (1, h, w), ac.sizes, ac.strides, ac.offsets, ac.rotations)
        flats.append(grid.reshape(-1, 7).astype(np.float32))
    anchors = np.concatenate(flats, 0)
    anchors_bv = aug.nearest_bev_np(anchors)
    return anchors, anchors_bv


class KittiDataset:
    """KITTI 3D detection dataset (reads the standard directory layout)."""

    def __init__(self, cfg: SASSDConfig, root: str, split_file: str,
                 test_mode: bool = False, with_label: bool = True,
                 rng: Optional[np.random.Generator] = None,
                 augmentor: Optional[aug.PointAugmentor] = None):
        self.cfg = cfg
        self.root = Path(root)
        self.test_mode = test_mode
        self.with_label = with_label
        self.rng = rng or np.random.default_rng(cfg.train.seed)
        with open(split_file) as f:
            self.sample_ids = [int(x) for x in f.read().split()]
        self.anchors, self.anchors_bv = build_anchors(cfg)
        self.class_names = list(cfg.class_names)

        self.augmentor = augmentor
        if (augmentor is None and not test_mode and cfg.data.gt_sampling
                and cfg.data.db_info_path and os.path.exists(cfg.data.db_info_path)):
            d = cfg.data
            self.augmentor = aug.PointAugmentor(
                root_path=str(self.root.parent), info_path=d.db_info_path,
                sample_classes=d.sample_classes,
                min_num_points=list(d.min_num_points),
                sample_max_num=list(d.sample_max_num),
                removed_difficulties=list(d.removed_difficulties),
                gt_rot_range=d.gt_rot_range,
                global_rot_range=d.global_rot_range,
                center_noise_std=d.center_noise_std,
                scale_range=d.scale_range, rng=self.rng)

    def __len__(self):
        return len(self.sample_ids)

    # -- paths -------------------------------------------------------------
    def _lidar_path(self, sid):
        p = self.root / "velodyne_reduced" / f"{sid:06d}.bin"
        if not p.exists():
            p = self.root / "velodyne" / f"{sid:06d}.bin"
        return p

    def _image_shape(self, sid):
        p = self.root / "image_2" / f"{sid:06d}.png"
        return png_shape(p) if p.exists() else _DEFAULT_IMAGE_SHAPE

    # -- samples -----------------------------------------------------------
    # retry-on-empty budget: the reference loops unboundedly
    # (kitti.py:127-135) which livelocks if EVERY sample lacks in-range GTs
    # (e.g. a mismatched crop range); after this many retries we surface the
    # sample with an all-invalid GT set instead of spinning.
    MAX_EMPTY_RETRIES = 50

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        if self.test_mode:
            return self.prepare_test(idx)
        for _ in range(self.MAX_EMPTY_RETRIES):
            data = self.prepare_train(idx)
            if data is not None:
                return data
            idx = int(self.rng.integers(len(self)))  # retry (kitti.py:127-135)
        return self.prepare_train(idx, allow_empty=True)

    def load_raw(self, idx: int):
        sid = self.sample_ids[idx]
        points = calib_lib.read_lidar(self._lidar_path(sid))
        calib = calib_lib.Calibration(self.root / "calib" / f"{sid:06d}.txt")
        objects = []
        label_path = self.root / "label_2" / f"{sid:06d}.txt"
        if self.with_label and label_path.exists():
            objects = calib_lib.read_label(label_path)
        return sid, points, calib, objects

    def prepare_train(self, idx: int, allow_empty: bool = False
                      ) -> Optional[Dict[str, np.ndarray]]:
        sid, points, calib, objects = self.load_raw(idx)
        objects = [o for o in objects if o.type != "DontCare"]
        gt_boxes = (np.stack([o.box3d for o in objects])
                    if objects else np.zeros((0, 7), np.float32))
        gt_types = [o.type for o in objects]
        if len(gt_boxes):
            gt_boxes[:, :3] = calib_lib.project_rect_to_velo(
                gt_boxes[:, :3], calib)

        if self.augmentor is not None:
            s_boxes, s_types, s_points = self.augmentor.sample_all(
                gt_boxes, gt_types)
            gt_boxes = np.concatenate([gt_boxes, s_boxes])
            gt_types = gt_types + s_types
            # remove scene points occluded by pasted objects (kitti.py:189-191)
            masks = aug.points_in_rbbox_np(points, s_boxes)
            points = points[~masks.any(-1)]
            points = np.concatenate([s_points, points], 0)

        gt_types = ["Car" if t == "Van" else t for t in gt_types]
        sel = [i for i, t in enumerate(gt_types) if t in self.class_names]
        gt_boxes = gt_boxes[sel]
        gt_labels = np.array(
            [self.class_names.index(gt_types[i]) + 1 for i in sel], np.int64)

        if self.augmentor is not None:
            gt_boxes, points = self.augmentor.noise_per_object(gt_boxes, points)
            gt_boxes, points = self.augmentor.random_flip(
                gt_boxes, points, self.cfg.data.flip_ratio)
            gt_boxes, points = self.augmentor.global_rotation(gt_boxes, points)
            gt_boxes, points = self.augmentor.global_scaling(gt_boxes, points)

        pcr = np.asarray(self.cfg.voxel.point_cloud_range)
        mask = aug.filter_gt_box_outside_range(gt_boxes, pcr[[0, 1, 3, 4]])
        gt_boxes, gt_labels = gt_boxes[mask], gt_labels[mask]
        if len(gt_boxes) == 0 and not allow_empty:
            return None
        gt_boxes[:, 6] = (gt_boxes[:, 6]
                          - np.floor(gt_boxes[:, 6] / (2 * np.pi) + 0.5)
                          * 2 * np.pi)

        sample = self._voxelize_and_mask(points)
        g = self.cfg.caps.max_gt
        n = min(len(gt_boxes), g)
        gtb = np.zeros((g, 7), np.float32)
        gtb[:n] = gt_boxes[:n]
        gtc = np.zeros((g,), np.int32)
        gtc[:n] = gt_labels[:n]
        sample.update(
            gt_boxes=gtb, gt_classes=gtc,
            gt_valid=(np.arange(g) < n),
            meta=dict(sample_idx=sid, calib=calib,
                      img_shape=self._image_shape(sid)))
        return sample

    def load_points(self, idx: int):
        """(raw points, meta) — the device-resident serving input
        (serve.PointsView wraps this; voxelize/plans/mask run on device)."""
        sid, points, calib, _ = self.load_raw(idx)
        return points, dict(sample_idx=sid, calib=calib,
                            img_shape=self._image_shape(sid))

    def prepare_test(self, idx: int) -> Dict[str, np.ndarray]:
        sid, points, calib, _ = self.load_raw(idx)
        sample = self._voxelize_and_mask(points)
        g = self.cfg.caps.max_gt
        sample.update(
            gt_boxes=np.zeros((g, 7), np.float32),
            gt_classes=np.zeros((g,), np.int32),
            gt_valid=np.zeros((g,), bool),
            meta=dict(sample_idx=sid, calib=calib,
                      img_shape=self._image_shape(sid)))
        return sample

    def _voxelize_and_mask(self, points) -> Dict[str, np.ndarray]:
        voxels, coords, nums = voxelize_np(points, self.cfg.voxel, pad=True)
        mask = aug.anchors_mask_from_coords(
            coords, self.anchors_bv, self.cfg.voxel.voxel_size,
            np.asarray(self.cfg.voxel.point_cloud_range),
            self.cfg.voxel.grid_size, self.cfg.data.anchor_area_threshold)
        out = dict(voxels=voxels, num_points=nums, coords=coords,
                   anchors_mask=mask)
        out.update(build_host_plans(self.cfg, coords,
                                    train=not self.test_mode))
        return out


class ConcatDataset:
    """Concatenate datasets (the reference's multi-annfile path,
    datasets/utils.py:117-127 via ConcatDataset)."""

    def __init__(self, datasets):
        self.datasets = list(datasets)
        self._offsets = np.cumsum([0] + [len(d) for d in self.datasets])
        self.anchors = self.datasets[0].anchors
        self.anchors_bv = self.datasets[0].anchors_bv

    def __len__(self):
        return int(self._offsets[-1])

    def __getitem__(self, idx):
        k = int(np.searchsorted(self._offsets[1:], idx, side="right"))
        return self.datasets[k][idx - int(self._offsets[k])]

    def load_points(self, idx):
        k = int(np.searchsorted(self._offsets[1:], idx, side="right"))
        return self.datasets[k].load_points(idx - int(self._offsets[k]))


class RawScanDataset:
    """Inference over a directory of raw .bin scans (KittiVideo analog,
    kitti.py:356-403): no labels, one shared calibration."""

    def __init__(self, cfg: SASSDConfig, scan_dir: str,
                 calib_file: Optional[str] = None,
                 img_shape=_DEFAULT_IMAGE_SHAPE):
        self.cfg = cfg
        self.files = sorted(Path(scan_dir).glob("*.bin"))
        if calib_file is not None:
            self.calib = calib_lib.Calibration(calib_file)
        else:
            from .synthetic import default_calib
            self.calib = default_calib()
        self.img_shape = img_shape
        self.anchors, self.anchors_bv = build_anchors(cfg)

    def __len__(self):
        return len(self.files)

    def load_points(self, idx):
        points = calib_lib.read_lidar(self.files[idx])
        return points, dict(sample_idx=idx, calib=self.calib,
                            img_shape=self.img_shape)

    def __getitem__(self, idx):
        points = calib_lib.read_lidar(self.files[idx])
        ds = KittiDataset.__new__(KittiDataset)   # reuse the voxelize helper
        ds.cfg, ds.anchors_bv = self.cfg, self.anchors_bv
        sample = KittiDataset._voxelize_and_mask(ds, points)
        g = self.cfg.caps.max_gt
        sample.update(
            gt_boxes=np.zeros((g, 7), np.float32),
            gt_classes=np.zeros((g,), np.int32),
            gt_valid=np.zeros((g,), bool),
            meta=dict(sample_idx=idx, calib=self.calib,
                      img_shape=self.img_shape))
        return sample


def build_host_plans(cfg: SASSDConfig, coords: np.ndarray,
                     train: bool = True) -> Dict[str, np.ndarray]:
    """C++ host rulebook for the sparse backbone (empty dict if disabled).

    Runs in the data loader, pipelined with device compute — the TPU then
    does zero active-set/neighbor-resolution work (see backbone.vxnet_apply).
    train=False skips the aux/strideT plans (backward/aux-branch only).
    """
    if not cfg.model.host_plans:
        return {}
    from sassd_tpu.ops import native
    if not native.available():
        return {}
    caps = (cfg.voxel.max_voxels,) + tuple(cfg.caps.level_caps[1:])
    plans = native.build_plans_cpp(coords, cfg.sparse_shape, caps,
                                   train=train)
    out = {}
    for k, v in plans.items():
        if k == "n_active":
            continue
        # int16 transfer when row indices fit: halves host->device traffic
        # (and, under leaky transfer stacks, host staging retention)
        if max(caps) < np.iinfo(np.int16).max and k.startswith(
                ("subm", "stride", "aux")):
            v = v.astype(np.int16)
        out[f"plan_{k}"] = v
    return out


def collate(samples: List[Dict[str, np.ndarray]]):
    """Stack fixed-shape samples into a device batch + list of metas."""
    metas = [s["meta"] for s in samples]
    keys = [k for k in samples[0] if k != "meta"]
    batch = {k: np.stack([s[k] for s in samples]) for k in keys}
    return batch, metas
