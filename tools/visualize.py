#!/usr/bin/env python
"""BEV visualization of scans, GT boxes and detections (matplotlib).

Replacement for the reference's mayavi hooks (kitti_utils.py:309-375) that
works headless: writes a PNG per sample.

    python tools/visualize.py configs/car.py --scan x.bin --ckpt model.msgpack
    python tools/visualize.py configs/car.py --synthetic --out viz/
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def draw_bev(ax, points, boxes=None, dets=None, pcr=(0, -40, 70.4, 40)):
    from sassd_tpu.data.augment import corners_2d
    ax.scatter(points[:, 0], points[:, 1], s=0.05, c="#888888", linewidths=0)

    def draw(bset, color):
        if bset is None or len(bset) == 0:
            return
        cs = corners_2d(bset[:, :2], bset[:, 3:5], bset[:, 6])
        for c in cs:
            xs = list(c[:, 0]) + [c[0, 0]]
            ys = list(c[:, 1]) + [c[0, 1]]
            ax.plot(xs, ys, color=color, linewidth=0.8)

    draw(boxes, "#2a9d2a")
    draw(dets, "#d62728")
    ax.set_xlim(pcr[0], pcr[2])
    ax.set_ylim(pcr[1], pcr[3])
    ax.set_aspect("equal")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("--scan", default=None, help="velodyne .bin file")
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--out", default="viz")
    args = ap.parse_args()

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    from sassd_tpu.config import load_config
    from sassd_tpu.data import synthetic

    cfg = load_config(args.config)
    os.makedirs(args.out, exist_ok=True)

    if args.synthetic or args.scan is None:
        rng = np.random.default_rng(0)
        points, boxes, _ = synthetic.make_scene(rng)
    else:
        from sassd_tpu.data.calib import read_lidar
        points, boxes = read_lidar(args.scan), None

    dets = None
    if args.ckpt:
        import jax
        import jax.numpy as jnp
        from sassd_tpu.data.kitti import build_anchors, build_host_plans
        from sassd_tpu.models import detector
        from sassd_tpu.ops.voxelize import voxelize_np
        from sassd_tpu.train import checkpoint as ckpt_lib

        params, state = detector.detector_init(jax.random.PRNGKey(0), cfg)
        params = ckpt_lib.load_params_only(args.ckpt, params)
        v, c, n = voxelize_np(points, cfg.voxel, pad=True)
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
        anchors = jnp.asarray(build_anchors(cfg)[0])
        out = detector.forward_test(params, state, batch, anchors, cfg)
        keep = np.asarray(out["valid"])[0]
        dets = np.asarray(out["boxes"])[0][keep]

    fig, ax = plt.subplots(figsize=(14, 16), dpi=120)
    pcr = cfg.voxel.point_cloud_range
    draw_bev(ax, points, boxes, dets, (pcr[0], pcr[1], pcr[3], pcr[4]))
    path = os.path.join(args.out, "bev.png")
    fig.savefig(path, bbox_inches="tight")
    print("wrote", path)


if __name__ == "__main__":
    main()
