#!/usr/bin/env python
"""Stage timing of the inference graph on the current device (unbuffered).

MEASUREMENT CAVEAT (see PERF.md "Measurement methodology"): on tunneled
accelerator runtimes, isolated small-graph timings are unreliable — XLA
fuses stages into their sync consumer, and repeated-identical-argument
dispatch loops can be served from opaque runtime caches. Treat the
per-stage numbers here as indicative only; the trustworthy figures are the
FULL graph over ROTATING inputs (the `full` mode below, same protocol as
bench.py) and full-graph ablation diffs."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/sassd_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from sassd_tpu.config import car_config
from sassd_tpu.data.kitti import build_anchors
from sassd_tpu.data.synthetic import make_scene
from sassd_tpu.models import backbone, detector
from sassd_tpu.ops import sparse as sp
from sassd_tpu.ops.voxelize import voxelize_np


def timeit(fn, *args, warmup=2, iters=6):
    # axon (networked TPU): amortize the host round trip — dispatch `iters`
    # executions back to back, force completion once via a host transfer
    import time
    import jax, jax.numpy as jnp

    def sync(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        if leaf.dtype == jnp.bool_:
            leaf = leaf.astype(jnp.int32)
        return float(jnp.sum(leaf.astype(jnp.float32)))

    for _ in range(warmup):
        sync(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters



def log(*a):
    print(*a, flush=True)


def main():
    which = sys.argv[1:] or ["plans", "vxnet", "full"]
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
    from sassd_tpu.data.kitti import build_host_plans
    for k, arr in build_host_plans(cfg, c).items():
        batch[k] = jnp.asarray(arr[None])
    log("occupied voxels:", int((n > 0).sum()))
    params, state = detector.detector_init(jax.random.PRNGKey(0), cfg)
    anchors = jnp.asarray(build_anchors(cfg)[0])

    keys = jax.vmap(lambda cc: sp.coords_to_keys(cc, cfg.sparse_shape))(
        batch["coords"])
    keys = jnp.sort(keys, axis=1)
    vfe = backbone.vfe_mean(batch["voxels"], batch["num_points"])

    if "plans" in which:
        @jax.jit
        def plan_search(keys):
            return jax.vmap(lambda k: sp.build_subm_plan(
                k, cfg.sparse_shape))(keys).idx

        @jax.jit
        def plan_dense(keys):
            def one(k):
                im = sp.build_index_map(k, cfg.sparse_shape)
                return sp.build_subm_plan(k, cfg.sparse_shape,
                                          index_map=im).idx
            return jax.vmap(one)(keys)

        log("plan0 searchsorted:", timeit(plan_search, keys, warmup=1,
                                          iters=5) * 1e3, "ms")
        log("plan0 dense-map   :", timeit(plan_dense, keys, warmup=1,
                                          iters=5) * 1e3, "ms")

    if "vxparts" in which:
        @jax.jit
        def imaps_fn(keys):
            return jax.vmap(lambda k: sp.build_index_map(
                k, cfg.sparse_shape))(keys)
        log("imap level0:", timeit(imaps_fn, keys) * 1e3, "ms")

        imap0 = imaps_fn(keys)

        @jax.jit
        def plan_fn(keys, imap0):
            return jax.vmap(lambda k, im: sp.build_subm_plan(
                k, cfg.sparse_shape, index_map=im))(keys, imap0).idx
        log("plan0 given imap:", timeit(plan_fn, keys, imap0) * 1e3, "ms")

        @jax.jit
        def down_fn(keys):
            return jax.vmap(lambda k: sp.downsample_keys_dense(
                k, cfg.sparse_shape, cfg.caps.level_caps[1]))(keys)
        log("downsample0 dense:", timeit(down_fn, keys) * 1e3, "ms")

        plan0 = plan_fn(keys, imap0)
        from sassd_tpu.ops.sparse import SubmPlan
        w16 = jnp.asarray(np.random.default_rng(0).normal(
            size=(27, 16, 16)).astype(np.float32))
        f16 = jnp.asarray(np.random.default_rng(1).normal(
            size=(1, keys.shape[1], 16)).astype(np.float32))
        found = jnp.ones_like(plan0, dtype=bool)

        @jax.jit
        def conv_fn(f16, plan0):
            pl_ = SubmPlan(plan0, found)
            return jax.vmap(lambda f, i, fo: sp.subm_conv(
                f, w16, SubmPlan(i, fo)))(f16, plan0, found)
        log("one subm conv16 L0:", timeit(conv_fn, f16, plan0) * 1e3, "ms")

    if "vxnet" in which:
        hp = {k[len("plan_"):]: v for k, v in batch.items()
              if k.startswith("plan_")}

        @jax.jit
        def vx_host(params, state, keys, vfe, hp):
            return backbone.vxnet_apply(
                params["vxnet"], state["vxnet"], keys, vfe,
                sparse_shape=cfg.sparse_shape,
                level_caps=cfg.caps.level_caps,
                train=False, host_plans=hp)[1]
        log("vxnet host plans:",
            timeit(vx_host, params, state, keys, vfe, hp, warmup=1, iters=5) * 1e3,
            "ms")
        for dense in (True,):
            @jax.jit
            def vx(params, state, keys, vfe, dense=dense):
                return backbone.vxnet_apply(
                    params["vxnet"], state["vxnet"], keys, vfe,
                    sparse_shape=cfg.sparse_shape,
                    level_caps=cfg.caps.level_caps,
                    train=False, dense_index=dense)[1]
            log(f"vxnet dense_index={dense}:",
                timeit(vx, params, state, keys, vfe, warmup=1, iters=5) * 1e3,
                "ms")

    if "tail" in which:
        from sassd_tpu.models import bev as bev_mod
        from sassd_tpu.models import pswarp, ssd_head

        out = backbone.vxnet_apply(
            params["vxnet"], state["vxnet"], keys, vfe,
            sparse_shape=cfg.sparse_shape, level_caps=cfg.caps.level_caps,
            train=False)
        okeys, ofeats, oshape = out[0], out[1], out[2]

        @jax.jit
        def bev_fn(params, state, okeys, ofeats):
            bev_in = backbone.densify_bev(okeys, ofeats, oshape)
            return bev_mod.bevnet_apply(params["bevnet"], state["bevnet"],
                                        bev_in, train=False)[0]
        log("densify+bevnet:",
            timeit(bev_fn, params, state, okeys, ofeats) * 1e3, "ms")

        bev_map = bev_fn(params, state, okeys, ofeats)
        conv6 = bev_mod.bevnet_apply(
            params["bevnet"], state["bevnet"],
            backbone.densify_bev(okeys, ofeats, oshape), train=False)[1]

        @jax.jit
        def head_fn(params, bev_map, mask):
            outs = ssd_head.head_apply(params["head"], bev_map, 1)
            return ssd_head.get_guided_anchors(
                outs, anchors, mask, num_class=1, thr=0.1,
                cap=cfg.caps.guided_test)
        log("head+guided_anchors:",
            timeit(head_fn, params, bev_map, batch["anchors_mask"]) * 1e3,
            "ms")

        ga = head_fn(params, bev_map, batch["anchors_mask"])

        @jax.jit
        def warp_only(params, state, conv6, ga):
            return pswarp.pswarp_apply(
                params["pswarp"], state["pswarp"], conv6, ga.boxes, ga.valid,
                grid_offsets=cfg.model.grid_offsets,
                featmap_stride=cfg.model.featmap_stride)[0]
        log("pswarp score:",
            timeit(warp_only, params, state, conv6, ga) * 1e3, "ms")

        scores = warp_only(params, state, conv6, ga)

        @jax.jit
        def nms_fn(ga, scores):
            return pswarp.rescore_and_nms(
                ga.boxes, scores, ga.labels, ga.valid,
                max_det=cfg.caps.max_det)[0]
        log("rescore+nms:", timeit(nms_fn, ga, scores) * 1e3, "ms")

    if "full" in which:
        # trustworthy protocol: rotate distinct scans across dispatches
        import time

        @jax.jit
        def full_fn(params, state, batch):
            return detector.forward_test(params, state, batch, anchors, cfg)

        rots = [batch]
        for i in range(3):
            pts_i, _, _ = make_scene(rng, n_cars=(6, 12), n_ground=60000)
            v_i, c_i, n_i = voxelize_np(pts_i, cfg.voxel, pad=True)
            b = dict(batch)
            b["voxels"] = jnp.asarray(v_i[None])
            b["num_points"] = jnp.asarray(n_i[None])
            b["coords"] = jnp.asarray(c_i[None])
            for k, arr in build_host_plans(cfg, c_i).items():
                b[k] = jnp.asarray(arr[None])
            rots.append(b)
        for b in rots:
            jax.block_until_ready(full_fn(params, state, b))
        iters = 24
        t0 = time.perf_counter()
        out = None
        for i in range(iters):
            out = full_fn(params, state, rots[i % len(rots)])
        jax.block_until_ready(out)
        log("FULL inference (rotating inputs):",
            (time.perf_counter() - t0) / iters * 1e3, "ms")


if __name__ == "__main__":
    main()
