"""Batched inference + dataset evaluation runner.

Equivalent of tools/test.py's single_test loop (/root/reference/tools/
test.py:19-94): jitted forward over the eval split, detections converted to
KITTI annos on the host, official AP computed against the label files.
"""
from __future__ import annotations

import logging
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from sassd_tpu.config import SASSDConfig
from sassd_tpu.data.loader import iterate_batches
from sassd_tpu.eval import kitti_eval
from sassd_tpu.eval.results import detections_to_kitti_anno
from sassd_tpu.models import detector


def make_test_step(cfg: SASSDConfig, anchors):
    def step(params, state, batch):
        return detector.forward_test(params, state, batch, anchors, cfg)
    return jax.jit(step)


def run_inference(cfg: SASSDConfig, dataset, params, state,
                  batch_size: int = 1, logger: Optional[logging.Logger] = None
                  ) -> Tuple[List[Dict], List[int]]:
    """Run the detector over a dataset; returns (annos, sample_ids)."""
    logger = logger or logging.getLogger("sassd")
    anchors = jnp.asarray(dataset.anchors)
    step = make_test_step(cfg, anchors)
    class_names = list(cfg.class_names)
    annos, ids = [], []
    for batch, metas in iterate_batches(
            dataset, batch_size, shuffle=False, num_workers=2):
        dets = jax.device_get(step(params, state, batch))
        for i, meta in enumerate(metas):
            annos.append(detections_to_kitti_anno(
                dets["boxes"][i], dets["scores"][i], dets["labels"][i],
                dets["valid"][i], meta, class_names))
            ids.append(meta["sample_idx"])
    return annos, ids


def evaluate(cfg: SASSDConfig, dataset, params, state, label_dir,
             batch_size: int = 1, logger=None):
    """Full eval: inference + official KITTI AP. Returns (results, text)."""
    dt_annos, ids = run_inference(cfg, dataset, params, state, batch_size,
                                  logger)
    gt_annos = kitti_eval.get_label_annos(label_dir, ids)
    return kitti_eval.get_official_eval_result(
        gt_annos, dt_annos, list(cfg.class_names))
