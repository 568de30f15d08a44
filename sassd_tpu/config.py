"""Configuration system.

Typed dataclasses (instead of the reference's free-form mmcv dicts,
/root/reference/configs/car_cfg.py) — every static shape cap that the jitted
pipeline needs is explicit and documented here. Python config files under
`configs/` build a :class:`SASSDConfig`; `load_config` executes such a file
and returns the object (the analog of mmcv.Config.fromfile, tools/train.py:48).
"""
from __future__ import annotations

import dataclasses
import importlib.util
import sys
from typing import Dict, Optional, Tuple

from sassd_tpu.ops.voxelize import VoxelConfig


@dataclasses.dataclass(frozen=True)
class AnchorConfig:
    """Per-class anchor grid (anchor3d_generator.py semantics)."""
    sizes: Tuple[float, float, float] = (1.6, 3.9, 1.56)
    strides: Tuple[float, float, float] = (0.4, 0.4, 1.0)
    offsets: Tuple[float, float, float] = (0.2, -39.8, -1.78)
    rotations: Tuple[float, ...] = (0.0, 1.57)
    # assigner thresholds (train_cfg.rpn.assigner in car_cfg.py:38-58)
    matched_threshold: float = 0.6
    unmatched_threshold: float = 0.45


@dataclasses.dataclass(frozen=True)
class Caps:
    """Static shape capacities for the jitted pipeline.

    The reference uses dynamic shapes everywhere; under XLA every
    data-dependent count becomes a fixed capacity + validity mask. Overflow
    beyond a cap is dropped (sorted spatially, not by importance) — caps
    below are sized with ample headroom over KITTI statistics.
    """
    max_points_per_scan: int = 65536   # raw points fed to device voxelizer
    max_gt: int = 64                   # GT boxes per sample
    level_caps: Tuple[int, int, int, int] = (20000, 18432, 14336, 10240)
    guided_train: int = 640            # guided anchors per sample at train.
                                       # The reference keeps ALL anchors
                                       # passing score>thr; overflow here is
                                       # counted by the guided_truncated
                                       # train metric and train_model warns
                                       # when it is sustained. 1280 measured
                                       # truncation-free at KITTI density
                                       # (VALIDATION.md round 4) at +9%
                                       # step time; 640 truncates only in
                                       # the densest early-training windows
    guided_test: int = 2048            # guided anchors per sample at test
                                       # (reference keeps ALL anchors passing
                                       # score>thr, ssd_rotate_head.py:307-372;
                                       # 2048 makes truncation provably
                                       # inactive — see VALIDATION.md table)
    max_det: int = 100                 # final detections (test_cfg max_per_img)


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    num_class: int = 1
    num_input_features: int = 4
    vfe_type: str = "mean"             # "mean" (SimpleVoxel) | "pointnet"
                                       # (VFELayer-style opt-in encoder)
    bev_channels: int = 256
    num_anchor_per_loc: int = 2        # rotations per class
    box_code_size: int = 7
    use_direction_classifier: bool = True
    encode_rad_error_by_sin: bool = True
    # PSWarpHead (car_cfg.py:26-33)
    grid_offsets: Tuple[float, float] = (0.0, 40.0)
    featmap_stride: float = 0.4
    num_parts: int = 28                # 4 x 7 sampling window
    window_size: Tuple[int, int] = (4, 7)
    compute_dtype: str = "float32"     # "bfloat16" for max MXU throughput
    dense_index: bool = True           # dense index maps + sort-free active
                                       # sets (TPU fast path) vs binary search
    host_plans: bool = True            # let the C++ host runtime build the
                                       # sparse-conv gather plans (rulebook)
                                       # in the data loader when available
    dense_tail: bool = True            # compute backbone levels 2-3 as
                                       # masked dense convs on the MXU
                                       # (exact subm semantics, much faster
                                       # than gathers at those resolutions)
    triple_gather: bool = True         # pack the 3 x-consecutive taps of
                                       # each kernel row into ONE wide
                                       # gathered row (3x fewer gather rows;
                                       # needs the key-sorted host plans)
    flat_batch: bool = True            # run every sparse conv over ONE
                                       # concatenated level array with
                                       # batch-offset plan indices (the
                                       # reference's merge_second_batch
                                       # adapted to sorted keys) instead of
                                       # vmapping per sample — identical
                                       # numerics, no batched gathers
    fold_head: bool = True             # run the head's three 1x1 convs
                                       # (cls/box/dir) as ONE conv over the
                                       # concatenated output channels —
                                       # identical numerics (conv is linear
                                       # per output channel), one MXU
                                       # dispatch instead of three
    packed_warp: bool = True           # PSWarp bilinear sampling fetches
                                       # each 2x2 corner neighborhood with
                                       # ONE width-4 gather (4x fewer
                                       # gather rows; exact same numerics —
                                       # ops/warp.py::
                                       # bilinear_sample_per_part_packed)
    sorted_device_levels: bool = True  # when building sparse-conv plans ON
                                       # DEVICE (no host rulebook): keep the
                                       # downsampled active sets KEY-SORTED
                                       # (sort+unique) instead of the
                                       # sort-free scatter-max dedup. Sorted
                                       # levels let the packed triple
                                       # gathers apply to device plans too
                                       # (adjacent sorted keys = adjacent
                                       # rows), tripling gather throughput
                                       # for the cost of one XLA sort per
                                       # downsample. Requires key-sorted
                                       # input voxels — both voxelizers
                                       # (ops/voxelize.py) guarantee it
    plan_lookup: str = "dense"         # on-device plan resolution backend:
                                       # "dense" = dense index maps (one
                                       # scatter + windowed slice-3
                                       # gathers) | "sorted" = windowed
                                       # binary search over the level's
                                       # sorted keys (lookup_sorted3 — no
                                       # [D*H*W] map materialized).
                                       # Identical plans either way
                                       # (tests/test_device_plans.py), but
                                       # "sorted" MEASURED 4x SLOWER on v5e
                                       # (searchsorted = ~15 serialized
                                       # gather rounds; plans 25.4 -> 100.9
                                       # ms, PERF.md round 5) — kept for
                                       # grids too large to materialize.
                                       # Ignored with host plans
    aux_interp: str = "ring"           # aux-branch 3-NN candidate source:
                                       # "ring" = 3x3x3 neighborhood of the
                                       # query's parent cell (the host
                                       # rulebook's aux plans, or
                                       # sparse.build_aux_plan on device;
                                       # >97% agreement with exact, ~5x
                                       # cheaper) | "exact" = brute-force
                                       # chunked-MXU 3-NN over the whole
                                       # level (the reference's
                                       # interpolate_gpu.cu semantics
                                       # exactly). A/B quantified in
                                       # VALIDATION.md (round 4).
    store_im2col: bool = False         # keep each conv's forward im2col as
                                       # a VJP residual so the backward dW
                                       # needs no recompute gather.
                                       # Measured NEUTRAL on the v5e chip
                                       # (58.9 vs 58.6 ms/step bs=1 — XLA
                                       # hides the recompute gather), so the
                                       # default avoids the extra HBM;
                                       # identical numerics either way
                                       # (tests/test_sparse.py)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    batch_size: int = 2
    total_epochs: int = 80
    lr: float = 0.003
    weight_decay: float = 0.01
    weight_decay_mode: str = "exclude_bn_bias"
                                       # "exclude_bn_bias": decay only conv/
                                       # linear kernels (the fastai recipe
                                       # the reference's optimizer stack is
                                       # built on, fastai_optim.py:13-24);
                                       # "all": decay every parameter (what
                                       # the reference's call site selects
                                       # via bn_wd=True,
                                       # optimization/__init__.py:29)
    grad_clip_norm: float = 10.0
    # one-cycle schedule (car_cfg.py:203-208)
    moms: Tuple[float, float] = (0.95, 0.85)
    div_factor: float = 10.0
    pct_start: float = 0.4
    # optional cosine warmup prefix for non-onecycle optimizers
    # (CosineWarmupLR, learning_schedules_fastai.py:78-87)
    warmup_iters: int = 0
    warmup_ratio: float = 0.1
    # rpn thresholds
    anchor_thr: float = 0.1            # guided-anchor score threshold (train)
    # extra (PSWarp) assigner (car_cfg.py:60-68)
    extra_pos_iou: float = 0.7
    extra_neg_iou: float = 0.7
    extra_similarity: str = "RotateIou3dSimilarity"
    rpn_similarity: str = "NearestIouSimilarity"
    max_inflight_steps: int = 2        # async train-step dispatch depth.
                                       # Bounds the device-side queue: an
                                       # unthrottled loop whose host leg
                                       # outruns the device grows the
                                       # in-flight queue without bound and
                                       # runtime per-dispatch cost grows
                                       # with depth. On single-core hosts
                                       # behind networked accelerators use
                                       # 1: concurrent transfer
                                       # serialization oversubscribes the
                                       # core and slows every leg 4-5x.
    checkpoint_interval: int = 2       # epochs
    checkpoint_every_steps: int = 0    # mid-epoch saves every N steps
                                       # (0 = off); resume fast-forwards
                                       # the loader past consumed batches
    max_ckpt_keep: int = 10
    log_interval: int = 20
    seed: int = 0


@dataclasses.dataclass(frozen=True)
class TestConfig:
    score_thr: float = 0.3
    nms_iou_thr: float = 0.1
    max_per_img: int = 100
    anchor_thr: float = 0.1
    nms_pre: int = 2000                # candidates kept before NMS
                                       # (test_cfg.extra.nms_pre,
                                       # car_cfg.py:74)
    serve_persistent_plans: bool = False
                                       # points-mode serving at batch_size=1:
                                       # carry the plan index maps ACROSS
                                       # scans (donated buffers; each step
                                       # delta-clears the previous scan's
                                       # rows instead of refilling ~410 MB
                                       # of dense maps). Identical
                                       # detections (tests/test_serve.py)
                                       # but MEASURED SLOWER on v5e (50.8
                                       # vs 36.8 ms/scan — the carry
                                       # round-trip costs more than the
                                       # fills it saves; PERF.md round-5
                                       # refutation ledger), so default off
    device_input: str = "voxels"       # "voxels": the loader voxelizes and
                                       # builds plans/mask on the host (fast
                                       # on well-attached multi-core hosts);
                                       # "points": device-resident serving —
                                       # ship ONLY raw padded points and
                                       # voxelize + plan + mask inside the
                                       # XLA graph (sassd_tpu/serve.py; the
                                       # fast path on degraded interconnects)


@dataclasses.dataclass(frozen=True)
class ParallelConfig:
    """Mesh-parallelism strategy (no reference analog — the reference is
    data-parallel only, SURVEY §2.7; this is the framework's TPU-native
    scaling axis).

    strategy:
      "data"    — pure DP: batch sharded over every device (default).
      "spatial" — DP x dense-BEV sharding: the BEV canvas is sharded along
                  H over a 'spatial' mesh axis; XLA inserts the conv halo
                  exchanges (parallel/spatial.py). The sparse ladder stays
                  replicated.
      "banded"  — DP x full spatial sharding INCLUDING the sparse stage:
                  level-0 active voxels are partitioned into y-bands with
                  halo recompute; banded loss == replicated loss exactly
                  (parallel/sparse_spatial.py).
    spatial: size of the mesh's 'spatial' axis (1 = off; total devices
      must be divisible by it). With "banded", also the number of y-bands.
    band_halo: level-0 y halo cells per side ("banded" only; the default
      covers the full ladder's receptive field — sparse_spatial.HALO).
    band_cap_margin: per-band cap safety factor over the covered grid
      fraction ("banded" only; undersizing is surfaced by the
      `band_overflow` train metric)."""
    strategy: str = "data"
    spatial: int = 1
    band_halo: int = 64
    band_cap_margin: float = 1.5


@dataclasses.dataclass(frozen=True)
class DataConfig:
    root: str = ""
    info_path: str = ""
    class_names: Tuple[str, ...] = ("Car",)
    anchor_area_threshold: float = 1.0
    out_size_factor: int = 8
    # augmentation (car_cfg.py:103-115)
    gt_sampling: bool = True
    db_info_path: str = ""
    sample_classes: Tuple[str, ...] = ("Car",)
    sample_max_num: Tuple[int, ...] = (15,)
    min_num_points: Tuple[int, ...] = (5,)
    removed_difficulties: Tuple[int, ...] = (-1,)
    global_rot_range: Tuple[float, float] = (-0.78539816, 0.78539816)
    gt_rot_range: Tuple[float, float] = (-0.78539816, 0.78539816)
    center_noise_std: Tuple[float, float, float] = (1.0, 1.0, 0.5)
    scale_range: Tuple[float, float] = (0.95, 1.05)
    flip_ratio: float = 0.5
    num_workers: int = 4


@dataclasses.dataclass(frozen=True)
class SASSDConfig:
    model: ModelConfig = ModelConfig()
    voxel: VoxelConfig = VoxelConfig()
    caps: Caps = Caps()
    anchors: Dict[str, AnchorConfig] = dataclasses.field(
        default_factory=lambda: {"Car": AnchorConfig()})
    train: TrainConfig = TrainConfig()
    test: TestConfig = TestConfig()
    data: DataConfig = DataConfig()
    parallel: ParallelConfig = ParallelConfig()
    work_dir: str = "./work_dir"
    resume_from: Optional[str] = None
    load_from: Optional[str] = None

    @property
    def class_names(self) -> Tuple[str, ...]:
        return tuple(self.anchors.keys())

    @property
    def sparse_shape(self) -> Tuple[int, int, int]:
        return self.voxel.sparse_shape

    @property
    def bev_map_size(self) -> Tuple[int, int]:
        """(H, W) of the BEV feature map (grid // out_size_factor)."""
        d, h, w = self.voxel.sparse_shape
        f = self.data.out_size_factor
        return h // f, w // f

    @property
    def num_anchors(self) -> int:
        h, w = self.bev_map_size
        return len(self.anchors) * h * w * self.model.num_anchor_per_loc


def car_config(**overrides) -> SASSDConfig:
    """The flagship single-class KITTI Car configuration
    (/root/reference/configs/car_cfg.py)."""
    return SASSDConfig(**overrides)


def multi_config(**overrides) -> SASSDConfig:
    """Three-class Car/Pedestrian/Cyclist configuration
    (/root/reference/configs/multi_cfg.py): shared anchor grid geometry,
    per-class sizes and assigner thresholds."""
    anchors = {
        "Car": AnchorConfig(sizes=(1.6, 3.9, 1.56),
                            matched_threshold=0.6, unmatched_threshold=0.45),
        "Pedestrian": AnchorConfig(sizes=(0.6, 0.8, 1.73),
                                   matched_threshold=0.5,
                                   unmatched_threshold=0.35),
        "Cyclist": AnchorConfig(sizes=(0.6, 1.76, 1.73),
                                matched_threshold=0.5,
                                unmatched_threshold=0.35),
    }
    base = dict(
        model=ModelConfig(num_class=3),
        anchors=anchors,
        data=DataConfig(class_names=("Car", "Pedestrian", "Cyclist"),
                        sample_classes=("Car", "Pedestrian", "Cyclist"),
                        sample_max_num=(15, 10, 10),
                        min_num_points=(5, 5, 5)),
    )
    base.update(overrides)
    return SASSDConfig(**base)


def long_range_config(**overrides) -> SASSDConfig:
    """Long-range stress configuration (BASELINE.json configs[4]): 0-100m
    range at the same voxel size (~2x grid, ~4x voxel budget)."""
    base = dict(
        voxel=VoxelConfig(voxel_size=(0.05, 0.05, 0.1),
                          point_cloud_range=(0.0, -40.0, -3.0, 102.4, 40.0, 1.0),
                          max_num_points=5, max_voxels=80000),
        caps=Caps(max_points_per_scan=262144, max_gt=64,
                  level_caps=(80000, 73728, 57344, 40960),
                  guided_train=640, guided_test=2048, max_det=100),
        anchors={"Car": AnchorConfig(
            sizes=(1.6, 3.9, 1.56), strides=(0.4, 0.4, 1.0),
            offsets=(0.2, -39.8, -1.78))},
    )
    base.update(overrides)
    return SASSDConfig(**base)


def tiny_config(**overrides) -> SASSDConfig:
    """A miniature config with the full topology at toy shapes — used by the
    test suite and the multi-chip dry run (compiles in seconds on CPU)."""
    base = dict(
        model=ModelConfig(num_class=1, bev_channels=32, num_parts=28,
                          grid_offsets=(0.0, 3.2), featmap_stride=0.8),
        voxel=VoxelConfig(voxel_size=(0.1, 0.1, 0.5),
                          point_cloud_range=(0.0, -3.2, -2.5, 6.4, 3.2, 1.5),
                          max_num_points=5, max_voxels=512),
        caps=Caps(max_points_per_scan=2048, max_gt=8,
                  level_caps=(512, 512, 384, 256),
                  guided_train=40, guided_test=32, max_det=16),
        anchors={"Car": AnchorConfig(
            sizes=(1.6, 3.9, 1.56), strides=(0.8, 0.8, 1.0),
            offsets=(0.4, -2.8, -1.0))},
    )
    base.update(overrides)
    return SASSDConfig(**base)


def load_config(path: str) -> SASSDConfig:
    """Execute a python config file that defines `config: SASSDConfig`."""
    spec = importlib.util.spec_from_file_location("_sassd_user_config", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["_sassd_user_config"] = mod
    spec.loader.exec_module(mod)
    cfg = getattr(mod, "config")
    if not isinstance(cfg, SASSDConfig):
        raise TypeError(f"{path} must define `config: SASSDConfig`")
    return cfg
