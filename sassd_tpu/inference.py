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
from sassd_tpu.data.loader import collate, iterate_batches
from sassd_tpu.eval import kitti_eval
from sassd_tpu.eval.results import detections_to_kitti_anno
from sassd_tpu.models import detector


def make_test_step(cfg: SASSDConfig, anchors, packed_layout=None):
    """packed_layout: optional train.loop.batch_pack_layout(...) — the step
    then takes a pack_batch()-ed dict (one h2d buffer per dtype; on
    networked accelerators per-array transfer RPCs dominate otherwise)."""
    from sassd_tpu.train.loop import unpack_batch

    def step(params, state, batch):
        if packed_layout is not None:
            batch = unpack_batch(batch, packed_layout)
        return detector.forward_test(params, state, batch, anchors, cfg)
    return jax.jit(step)


def run_inference(cfg: SASSDConfig, dataset, params, state,
                  batch_size: int = 1, logger: Optional[logging.Logger] = None,
                  num_shards: int = 1, shard_id: int = 0
                  ) -> Tuple[List[Dict], List[int]]:
    """Run the detector over a dataset; returns (annos, sample_ids).

    num_shards/shard_id stride the sample set across hosts (the reference's
    rank-strided DistEvalHook, eval_hooks.py:23-108); padding duplicates are
    deduplicated by sample id at merge time.
    """
    from sassd_tpu.train.loop import HostStager, batch_pack_layout
    logger = logger or logging.getLogger("sassd")
    anchors = jnp.asarray(dataset.anchors)
    src = dataset
    carry = None
    if cfg.test.device_input == "points":
        # device-resident serving: ship only raw padded points; voxelize,
        # sparse-conv plans and the anchors mask run inside the XLA graph
        from sassd_tpu import serve
        src = serve.PointsView(dataset, cfg)
        layout = batch_pack_layout(collate([src[0]] * batch_size)[0])
        persistent = cfg.test.serve_persistent_plans and batch_size == 1
        base_step = serve.make_serving_step(cfg, dataset.anchors,
                                            dataset.anchors_bv,
                                            packed_layout=layout,
                                            persistent_plans=persistent)
        if persistent:
            carry = serve.init_plan_carry(cfg)

            def step(params, state, batch, _s=base_step):
                nonlocal carry
                dets, carry = _s(params, state, carry, batch)
                return dets
        else:
            step = base_step
    elif cfg.parallel.strategy != "data" and cfg.parallel.spatial > 1:
        # spatially sharded inference (ParallelConfig): dense-BEV H-sharding
        # or full banded sparse-stage sharding over a data x spatial mesh
        from sassd_tpu.parallel import mesh as mesh_lib
        mesh = mesh_lib.make_mesh(spatial=cfg.parallel.spatial)
        layout = batch_pack_layout(collate([dataset[0]] * batch_size)[0])
        if cfg.parallel.strategy == "banded":
            from sassd_tpu.parallel import sparse_spatial as ss
            spec = ss.make_band_spec(cfg, s=cfg.parallel.spatial,
                                     cap_margin=cfg.parallel.band_cap_margin,
                                     halo=cfg.parallel.band_halo)
            step = ss.make_banded_test_step(cfg, anchors, mesh, spec,
                                            packed_layout=layout)
        else:
            from sassd_tpu.parallel.spatial import make_spatial_test_step
            step = make_spatial_test_step(cfg, anchors, mesh,
                                          packed_layout=layout)
        params = mesh_lib.replicate(mesh, params)
        state = mesh_lib.replicate(mesh, state)
    else:
        layout = batch_pack_layout(collate([dataset[0]] * batch_size)[0])
        step = make_test_step(cfg, anchors, packed_layout=layout)
    class_names = list(cfg.class_names)
    stager = HostStager()
    annos, ids = [], []
    for batch, metas in iterate_batches(
            src, batch_size, shuffle=False, num_workers=2,
            num_shards=num_shards, shard_id=shard_id):
        dets = jax.device_get(step(params, state, stager.pack(batch, layout)))
        for i, meta in enumerate(metas):
            annos.append(detections_to_kitti_anno(
                dets["boxes"][i], dets["scores"][i], dets["labels"][i],
                dets["valid"][i], meta, class_names))
            ids.append(meta["sample_idx"])
    return annos, ids


def _dedup_by_id(annos: List[Dict], ids: List[int]):
    seen, out_a, out_i = set(), [], []
    for a, sid in zip(annos, ids):
        if sid not in seen:
            seen.add(sid)
            out_a.append(a)
            out_i.append(sid)
    order = sorted(range(len(out_i)), key=lambda k: out_i[k])
    return [out_a[k] for k in order], [out_i[k] for k in order]


def evaluate(cfg: SASSDConfig, dataset, params, state, label_dir,
             batch_size: int = 1, logger=None,
             exchange_dir: Optional[str] = None,
             precomputed=None):
    """Full eval: inference + official KITTI AP. Returns (results, text).

    Under a multi-process job the sample set is rank-strided; per-host annos
    are gathered to the primary (which alone computes AP and returns it;
    other processes return (None, "")).

    `precomputed`: optional (dt_annos, ids) from an earlier run_inference
    over this rank's shard — callers that already ran inference (e.g.
    tools/test.py --out writing KITTI result files) reuse it instead of
    paying a second device pass over the val split.
    """
    from sassd_tpu.parallel import dist
    n, pid = dist.process_count(), dist.process_index()
    dt_annos, ids = (precomputed if precomputed is not None else
                     run_inference(cfg, dataset, params, state, batch_size,
                                   logger, num_shards=n, shard_id=pid))
    if n > 1:
        parts = dist.gather_objects(
            (dt_annos, ids), exchange_dir or cfg.work_dir, tag="eval")
        if pid != 0:
            return None, ""
        dt_annos = [a for p in parts for a in p[0]]
        ids = [i for p in parts for i in p[1]]
    dt_annos, ids = _dedup_by_id(dt_annos, ids)
    gt_annos = kitti_eval.get_label_annos(label_dir, ids)
    return kitti_eval.get_official_eval_result(
        gt_annos, dt_annos, list(cfg.class_names))
