"""Test shims: tiny config + random batch come from the library itself."""
import numpy as np

from sassd_tpu.config import SASSDConfig, tiny_config  # noqa: F401
from sassd_tpu.data.kitti import build_anchors
from sassd_tpu.data.synthetic import make_random_batch


def tiny_anchors(cfg: SASSDConfig) -> np.ndarray:
    return build_anchors(cfg)[0]


def random_batch(cfg: SASSDConfig, rng, batch_size=2, n_gt=3):
    return make_random_batch(cfg, rng, batch_size=batch_size, n_gt=n_gt)
