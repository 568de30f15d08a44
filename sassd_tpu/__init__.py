"""sassd_tpu — a TPU-native (JAX/XLA/Pallas) single-stage LiDAR 3D detection
framework with the capabilities of SA-SSD (structure-aware single-stage detector).

Design stance (not a port of the CUDA/torch reference):
  * one pure-functional, statically-shaped, jit-compiled pipeline
  * sparse 3D convolution as sorted-key gather-GEMM-scatter on the MXU
  * all per-step compute (target assignment, rotated IoU, NMS, aux targets)
    stays on device — no host round-trips inside the step
  * scale-out via jax.sharding Mesh + NamedSharding (data parallel by default,
    optional BEV spatial sharding for long-range configs)

Subpackages:
  core      box geometry, coders, anchors, targets, losses, rotated IoU/NMS
  ops       voxelization, sparse conv engine, interpolation, warping (+ Pallas)
  models    VFE / sparse backbone / BEV net / SSD head / PSWarp head / detector
  data      KITTI pipeline, augmentation, static-shape batching, synthetic data
  eval      KITTI AP@11/AP@40 + AOS evaluation protocol
  train     optimizer (one-cycle Adam), schedules, checkpointing, train loop
  parallel  device mesh construction and sharding strategies
"""

__version__ = "0.1.0"

from sassd_tpu.config import (SASSDConfig, car_config, load_config,  # noqa: F401,E402
                              long_range_config, multi_config, tiny_config)


def __getattr__(name):
    """Lazy top-level API (keeps `import sassd_tpu` light)."""
    import importlib
    if name == "detector":
        return importlib.import_module("sassd_tpu.models.detector")
    if name in ("models", "inference", "core", "ops", "data", "eval",
                "train", "parallel", "utils"):
        return importlib.import_module(f"sassd_tpu.{name}")
    raise AttributeError(name)
