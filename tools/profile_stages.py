#!/usr/bin/env python
"""Stage-by-stage timing of the inference graph on the current device."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from sassd_tpu.config import car_config
from sassd_tpu.data.kitti import build_anchors
from sassd_tpu.data.synthetic import make_scene
from sassd_tpu.models import backbone, bev, detector, pswarp, ssd_head
from sassd_tpu.ops import sparse as sp
from sassd_tpu.ops.voxelize import voxelize_np
from sassd_tpu.utils.timer import timeit


def main():
    cfg = car_config()
    rng = np.random.default_rng(0)
    pts, _, _ = make_scene(rng, n_cars=(6, 12), n_ground=60000)
    v, c, n = voxelize_np(pts, cfg.voxel, pad=True)
    batch = {
        "voxels": jnp.asarray(v[None]),
        "num_points": jnp.asarray(n[None]),
        "coords": jnp.asarray(c[None]),
        "anchors_mask": jnp.ones((1, cfg.num_anchors), bool),
        "gt_boxes": jnp.zeros((1, cfg.caps.max_gt, 7)),
        "gt_classes": jnp.zeros((1, cfg.caps.max_gt), jnp.int32),
        "gt_valid": jnp.zeros((1, cfg.caps.max_gt), bool),
    }
    print("occupied voxels:", int((n > 0).sum()))
    params, state = detector.detector_init(jax.random.PRNGKey(0), cfg)
    anchors = jnp.asarray(build_anchors(cfg)[0])

    @jax.jit
    def spine_fn(params, state, batch):
        return detector.forward_spine(params, state, batch, cfg,
                                      train=False).bev_map

    @jax.jit
    def full_fn(params, state, batch):
        return detector.forward_test(params, state, batch, anchors, cfg)

    # spine pieces
    vfe = backbone.vfe_mean(batch["voxels"], batch["num_points"])
    keys = jax.vmap(lambda cc: sp.coords_to_keys(cc, cfg.sparse_shape))(
        batch["coords"])
    perm = jnp.argsort(keys, axis=1)
    keys = jnp.take_along_axis(keys, perm, axis=1)
    vfe = jnp.take_along_axis(vfe, perm[..., None], axis=1)

    @jax.jit
    def plan0_fn(keys):
        return jax.vmap(lambda k: sp.build_subm_plan(k, cfg.sparse_shape))(keys)

    @jax.jit
    def vxnet_fn(params, state, keys, vfe):
        return backbone.vxnet_apply(
            params["vxnet"], state["vxnet"], keys, vfe,
            sparse_shape=cfg.sparse_shape, level_caps=cfg.caps.level_caps,
            train=False)[1]

    out = backbone.vxnet_apply(
        params["vxnet"], state["vxnet"], keys, vfe,
        sparse_shape=cfg.sparse_shape, level_caps=cfg.caps.level_caps,
        train=False)
    okeys, ofeats, oshape = out[0], out[1], out[2]

    @jax.jit
    def bev_fn(params, state, okeys, ofeats):
        bev_in = backbone.densify_bev(okeys, ofeats, oshape)
        return bev.bevnet_apply(params["bevnet"], state["bevnet"], bev_in,
                                train=False)[0]

    bev_map = bev_fn(params, state, okeys, ofeats)

    @jax.jit
    def head_fn(params, bev_map, mask):
        outs = ssd_head.head_apply(params["head"], bev_map, 1)
        return ssd_head.get_guided_anchors(outs, anchors, mask, num_class=1,
                                           thr=0.1, cap=cfg.caps.guided_test)

    ga = head_fn(params, bev_map, batch["anchors_mask"])

    conv6 = bev.bevnet_apply(params["bevnet"], state["bevnet"],
                             backbone.densify_bev(okeys, ofeats, oshape),
                             train=False)[1]

    @jax.jit
    def warp_fn(params, state, conv6, ga):
        scores, _ = pswarp.pswarp_apply(
            params["pswarp"], state["pswarp"], conv6, ga.boxes, ga.valid,
            grid_offsets=cfg.model.grid_offsets,
            featmap_stride=cfg.model.featmap_stride)
        return pswarp.rescore_and_nms(ga.boxes, scores, ga.labels, ga.valid,
                                      max_det=cfg.caps.max_det)

    @jax.jit
    def nms_only_fn(ga, scores):
        return pswarp.rescore_and_nms(ga.boxes, scores, ga.labels, ga.valid,
                                      max_det=cfg.caps.max_det)

    scores, _ = pswarp.pswarp_apply(
        params["pswarp"], state["pswarp"], conv6, ga.boxes, ga.valid,
        grid_offsets=cfg.model.grid_offsets,
        featmap_stride=cfg.model.featmap_stride)

    for name, fn, args in [
        ("plan0 (searchsorted level0)", plan0_fn, (keys,)),
        ("vxnet (sparse backbone)", vxnet_fn, (params, state, keys, vfe)),
        ("densify+bevnet", bev_fn, (params, state, okeys, ofeats)),
        ("head+guided_anchors", head_fn, (params, bev_map, batch["anchors_mask"])),
        ("pswarp+nms", warp_fn, (params, state, conv6, ga)),
        ("nms only", nms_only_fn, (ga, scores)),
        ("spine (all pre-head)", spine_fn, (params, state, batch)),
        ("FULL inference", full_fn, (params, state, batch)),
    ]:
        t = timeit(fn, *args, warmup=2, iters=6)
        print(f"{name:<32} {t * 1e3:8.2f} ms")


if __name__ == "__main__":
    main()
