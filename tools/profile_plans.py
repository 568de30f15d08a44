#!/usr/bin/env python
"""Per-piece decomposition of on-device sparse-plan building (car config).

Times each constituent of the device-plans path per level: index-map build,
windowed subm plan, stride plan, downsample variants — to rank where the
~25 ms of in-graph plan building (tools/profile_serve.py) actually goes.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(fn, args_list, iters=20, warm=2):
    import jax
    outs = [fn(*a) for a in args_list[:warm]]
    jax.block_until_ready(outs[-1])
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(*args_list[i % len(args_list)])
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1000


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from sassd_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from sassd_tpu import serve
    from sassd_tpu.config import car_config
    from sassd_tpu.data.kitti import build_anchors
    from sassd_tpu.data.synthetic import make_scene
    from sassd_tpu.ops import sparse as sp
    from sassd_tpu.ops.voxelize import voxelize_jax

    cfg = car_config()
    _, anchors_bv = build_anchors(cfg)
    corners = jnp.asarray(serve.anchor_corner_indices(
        anchors_bv, cfg.voxel.voxel_size, cfg.voxel.point_cloud_range,
        cfg.voxel.grid_size))
    rng = np.random.default_rng(0)

    scans = []
    for _ in range(4):
        pts, _, _ = make_scene(rng, n_cars=(6, 10), n_ground=48000)
        p, n = serve.prepare_points(pts, cfg)
        scans.append((jnp.asarray(p[None]), jnp.asarray(np.array([n]))))

    # per-level key sets (sorted) on device
    shape0 = cfg.sparse_shape
    caps = cfg.caps.level_caps

    @jax.jit
    def level_keys(p, n):
        b = serve.batch_from_points(p, n, corners, cfg)
        k0 = sp.coords_to_keys(b["coords"][0], shape0)
        ks, shapes = [k0], [shape0]
        k, shp = k0, shape0
        for lvl in range(3):
            k = sp.downsample_keys(k, shp, caps[lvl + 1])
            shp = sp.out_shape_stride2(shp)
            ks.append(k)
            shapes.append(shp)
        return ks

    shapes = [shape0]
    for _ in range(3):
        shapes.append(sp.out_shape_stride2(shapes[-1]))
    keysets = [jax.device_put(level_keys(p, n)) for p, n in scans]

    for lvl in range(3):
        shp = shapes[lvl]
        total = int(np.prod(shp))
        # index map build
        im_j = jax.jit(lambda k, _s=shp: sp.build_index_map(k, _s))
        t_im = timeit(lambda ks: im_j(ks[lvl]), [(k,) for k in keysets],
                      args.iters)
        # subm plan given prebuilt index map
        imaps = [jax.device_put(im_j(k[lvl])) for k in keysets]
        sub_j = jax.jit(lambda k, im, _s=shp: sp.build_subm_plan(
            k, _s, index_map=im).idx.sum())
        t_sub = timeit(lambda ks, im: sub_j(ks[lvl], im),
                       list(zip(keysets, imaps)), args.iters)
        # stride plan given prebuilt index map
        str_j = jax.jit(lambda ki, ko, im, _s=shp: sp.build_stride_plan(
            ki, ko, _s, index_map=im).idx.sum())
        t_str = timeit(lambda ks, im: str_j(ks[lvl], ks[lvl + 1], im),
                       list(zip(keysets, imaps)), args.iters)
        # downsample: sorted vs dense
        ds_j = jax.jit(lambda k, _s=shp, _c=caps[lvl + 1]:
                       sp.downsample_keys(k, _s, _c).sum())
        t_ds = timeit(lambda ks: ds_j(ks[lvl]), [(k,) for k in keysets],
                      args.iters)
        dsd_j = jax.jit(lambda k, _s=shp, _c=caps[lvl + 1]:
                        sp.downsample_keys_dense(k, _s, _c).sum())
        t_dsd = timeit(lambda ks: dsd_j(ks[lvl]), [(k,) for k in keysets],
                       args.iters)
        print(f"L{lvl} grid={total / 1e6:6.1f}M cap={caps[lvl]:6d} | "
              f"imap {t_im:6.2f}  subm {t_sub:6.2f}  stride {t_str:6.2f}  "
              f"ds_sort {t_ds:6.2f}  ds_dense {t_dsd:6.2f}", flush=True)


if __name__ == "__main__":
    main()
