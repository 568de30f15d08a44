#!/usr/bin/env python
"""Decompose the device-resident serving graph cost (car config, bs=1).

Times (bench protocol: rotating pre-staged inputs, N async dispatches, one
final block): full serving step, batch assembly alone (voxelize + mask),
plan building alone, forward on a prebuilt device batch, and the host-plans
forward as the reference point.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(fn, args_list, iters=30, warm=3):
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
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from sassd_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from sassd_tpu import serve
    from sassd_tpu.config import car_config
    from sassd_tpu.data.kitti import build_anchors
    from sassd_tpu.data.synthetic import make_scene
    from sassd_tpu.models import detector
    from sassd_tpu.ops import sparse as sp

    cfg = car_config()
    anchors_np, anchors_bv = build_anchors(cfg)
    rng = np.random.default_rng(0)

    # realistic scans
    scans = []
    for _ in range(4):
        pts, _, _ = make_scene(rng, n_cars=(6, 10), n_ground=48000)
        p, n = serve.prepare_points(pts, cfg)
        scans.append((jnp.asarray(p[None]), jnp.asarray(np.array([n]))))
    params, state = detector.detector_init(jax.random.PRNGKey(0), cfg)
    params = jax.device_put(params)
    state = jax.device_put(state)

    corners = jnp.asarray(serve.anchor_corner_indices(
        anchors_bv, cfg.voxel.voxel_size, cfg.voxel.point_cloud_range,
        cfg.voxel.grid_size))
    anchors = jnp.asarray(anchors_np)

    # (1) full serving step
    step = serve.make_serving_step(cfg, anchors_np, anchors_bv)
    batches = [dict(points=p, n_points=n) for p, n in scans]
    t_full = timeit(lambda b: step(params, state, b), [(b,) for b in batches],
                    args.iters)
    print(f"full serving step:        {t_full:7.2f} ms", flush=True)

    # (2) batch assembly (voxelize + anchors-mask)
    assemble = jax.jit(lambda p, n: serve.batch_from_points(p, n, corners, cfg))
    t_asm = timeit(assemble, scans, args.iters)
    print(f"batch assembly:           {t_asm:7.2f} ms", flush=True)

    # (2a) voxelize only
    from sassd_tpu.ops.voxelize import voxelize_jax
    vox_only = jax.jit(lambda p, n: jax.vmap(
        lambda pt, va: voxelize_jax(pt, va, cfg.voxel))(
            p, jnp.arange(p.shape[1])[None, :] < n[:, None]))
    t_vox = timeit(vox_only, scans, args.iters)
    print(f"  voxelize only:          {t_vox:7.2f} ms", flush=True)

    # (3) plan building alone (index maps + subm plans + downsample + stride)
    shape0 = cfg.sparse_shape
    caps = cfg.caps.level_caps

    def plans_only(coords):
        keys0 = jax.vmap(lambda c: sp.coords_to_keys(c, shape0))(coords)
        outs = []
        keys, shape = keys0, shape0
        for lvl in range(3):
            imap = jax.vmap(lambda k: sp.build_index_map(
                k, shape, keys_sorted=True))(keys)
            plan = jax.vmap(lambda k, im: sp.build_subm_plan(
                k, shape, index_map=im))(keys, imap)
            outs.append(plan.idx.sum() + plan.found.sum())
            nk = jax.vmap(lambda k: sp.downsample_keys(
                k, shape, caps[lvl + 1]))(keys)
            splan = jax.vmap(lambda ik, ok, im: sp.build_stride_plan(
                ik, ok, shape, index_map=im))(keys, nk, imap)
            outs.append(splan.idx.sum() + splan.found.sum())
            keys, shape = nk, sp.out_shape_stride2(shape)
        return sum(outs)

    dev_batches = [jax.device_put(dict(jax.jit(
        lambda p, n: serve.batch_from_points(p, n, corners, cfg))(p, n)))
        for p, n in scans]
    plans_j = jax.jit(plans_only)
    t_plans = timeit(lambda b: plans_j(b["coords"]),
                     [(b,) for b in dev_batches], args.iters)
    print(f"plan building only:       {t_plans:7.2f} ms", flush=True)

    # (3a) downsample (sorted) only
    def ds_only(coords):
        keys0 = jax.vmap(lambda c: sp.coords_to_keys(c, shape0))(coords)
        keys, shape, acc = keys0, shape0, []
        for lvl in range(3):
            keys = jax.vmap(lambda k: sp.downsample_keys(
                k, shape, caps[lvl + 1]))(keys)
            shape = sp.out_shape_stride2(shape)
            acc.append(keys.sum())
        return sum(acc)
    ds_j = jax.jit(ds_only)
    t_ds = timeit(lambda b: ds_j(b["coords"]), [(b,) for b in dev_batches],
                  args.iters)
    print(f"  downsample (sorted):    {t_ds:7.2f} ms", flush=True)

    # (4) forward_test on prebuilt device batches (device plans in-graph)
    fwd = jax.jit(lambda b: detector.forward_test(params, state, b, anchors,
                                                  cfg))
    t_fwd = timeit(fwd, [(b,) for b in dev_batches], args.iters)
    print(f"forward (device plans):   {t_fwd:7.2f} ms", flush=True)

    print(f"\nfull={t_full:.1f}  assembly={t_asm:.1f} (vox {t_vox:.1f}) "
          f"plans={t_plans:.1f} (ds {t_ds:.1f})  fwd_dev={t_fwd:.1f}",
          flush=True)


if __name__ == "__main__":
    main()
# NOTE: run with env SASSD_WINDOW_PLANS=0 to ablate the windowed plan lookups.
