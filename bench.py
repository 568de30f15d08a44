#!/usr/bin/env python
"""Headline benchmark: e2e KITTI Car inference throughput on one chip.

Prints ONE JSON line:
  {"metric": "scans_per_sec_e2e_car_inference", "value": N, "unit":
   "scans/sec/chip", "vs_baseline": N/25.0}

Baseline: the reference claims 25 FPS end-to-end on a ~GTX-1080Ti-class GPU
(/root/reference/readme.md:2). The measured graph is the COMPLETE test-time
pipeline on realistic synthetic scans (~16k occupied voxels): mean-VFE,
sparse VxNet over [40,1600,1408], densify, BEVNet, SSD head, guided-anchor
top-k, PSWarp rescoring, rotated NMS — one jitted XLA program per scan.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    from sassd_tpu.config import car_config
    from sassd_tpu.data.kitti import build_anchors
    from sassd_tpu.data.synthetic import make_scene
    from sassd_tpu.models import detector
    from sassd_tpu.ops.voxelize import voxelize_np

    cfg = car_config()
    rng = np.random.default_rng(0)

    from sassd_tpu.data.kitti import build_host_plans

    # realistic scans: KITTI velodyne_reduced has ~17-20k points in range,
    # giving ~14-17k occupied voxels at the 5cm grid
    batches = []
    for i in range(8):
        pts, _boxes, _ = make_scene(rng, n_cars=(6, 12), n_ground=18000)
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
        for k, arr in build_host_plans(cfg, c).items():
            batch[k] = jnp.asarray(arr[None])
        batches.append(batch)

    params, state = detector.detector_init(jax.random.PRNGKey(0), cfg)
    anchors = jnp.asarray(build_anchors(cfg)[0])

    @jax.jit
    def step(params, state, batch):
        return detector.forward_test(params, state, batch, anchors, cfg)

    # compile + warmup
    out = step(params, state, batches[0])
    jax.block_until_ready(out)
    for b in batches[:3]:
        jax.block_until_ready(step(params, state, b))

    iters = 30
    t0 = time.perf_counter()
    for i in range(iters):
        out = step(params, state, batches[i % len(batches)])
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    scans_per_sec = iters / dt
    print(json.dumps({
        "metric": "scans_per_sec_e2e_car_inference",
        "value": round(scans_per_sec, 3),
        "unit": "scans/sec/chip",
        "vs_baseline": round(scans_per_sec / 25.0, 4),
    }))


if __name__ == "__main__":
    main()
