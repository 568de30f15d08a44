"""A miniature SASSDConfig for fast CPU tests (same topology, tiny shapes)."""
import numpy as np

from sassd_tpu.config import (AnchorConfig, Caps, DataConfig, ModelConfig,
                              SASSDConfig, TestConfig, TrainConfig)
from sassd_tpu.core import anchors as anchor_lib
from sassd_tpu.ops.voxelize import VoxelConfig


def tiny_config() -> SASSDConfig:
    return SASSDConfig(
        model=ModelConfig(
            num_class=1, bev_channels=32, num_parts=28,
            grid_offsets=(0.0, 3.2), featmap_stride=0.8),
        voxel=VoxelConfig(
            voxel_size=(0.1, 0.1, 0.5),
            point_cloud_range=(0.0, -3.2, -2.5, 6.4, 3.2, 1.5),
            max_num_points=5, max_voxels=512),
        caps=Caps(max_points_per_scan=2048, max_gt=8,
                  level_caps=(512, 512, 384, 256),
                  guided_train=40, guided_test=32, max_det=16),
        anchors={"Car": AnchorConfig(
            sizes=(1.6, 3.9, 1.56),
            strides=(0.8, 0.8, 1.0),
            offsets=(0.4, -2.8, -1.0),
            rotations=(0.0, 1.57),
            matched_threshold=0.6, unmatched_threshold=0.45)},
        train=TrainConfig(batch_size=2),
        test=TestConfig(),
        data=DataConfig(out_size_factor=8),
    )


def tiny_anchors(cfg: SASSDConfig) -> np.ndarray:
    h, w = cfg.bev_map_size
    per_class = []
    for name, ac in cfg.anchors.items():
        grid = anchor_lib.create_anchors_3d_stride(
            (1, h, w), ac.sizes, ac.strides, ac.offsets, ac.rotations)
        per_class.append(grid.reshape(-1, 7))
    return np.concatenate(per_class, 0).astype(np.float32)


def random_batch(cfg: SASSDConfig, rng, batch_size=2, n_gt=3):
    """Synthetic batch in the detector's input layout."""
    from sassd_tpu.ops.voxelize import voxelize_np

    voxels, coords, nums, gts = [], [], [], []
    pcr = np.asarray(cfg.voxel.point_cloud_range)
    for _ in range(batch_size):
        n = 600
        pts = np.zeros((n, 4), np.float32)
        pts[:, 0] = rng.uniform(pcr[0], pcr[3], n)
        pts[:, 1] = rng.uniform(pcr[1], pcr[4], n)
        pts[:, 2] = rng.uniform(pcr[2], pcr[5], n)
        pts[:, 3] = rng.uniform(0, 1, n)
        v, c, np_ = voxelize_np(pts, cfg.voxel, pad=True)
        voxels.append(v)
        coords.append(c)
        nums.append(np_)
        g = np.zeros((cfg.caps.max_gt, 7), np.float32)
        g[:n_gt, 0] = rng.uniform(1, 5, n_gt)
        g[:n_gt, 1] = rng.uniform(-2, 2, n_gt)
        g[:n_gt, 2] = -1.5
        g[:n_gt, 3:6] = [1.6, 3.9, 1.56]
        g[:n_gt, 6] = rng.uniform(-np.pi, np.pi, n_gt)
        gts.append(g)
    a = cfg.num_anchors
    return {
        "voxels": np.stack(voxels),
        "num_points": np.stack(nums),
        "coords": np.stack(coords),
        "anchors_mask": np.ones((batch_size, a), bool),
        "gt_boxes": np.stack(gts),
        "gt_classes": np.where(np.arange(cfg.caps.max_gt) < n_gt, 1, 0
                               )[None].repeat(batch_size, 0).astype(np.int32),
        "gt_valid": (np.arange(cfg.caps.max_gt) < n_gt
                     )[None].repeat(batch_size, 0),
    }
