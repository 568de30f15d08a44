"""Full-graph ablation harness: attribute inference-graph time by variant.

Per-op / per-stage timing is UNRELIABLE on this stack (see PERF.md
"Measurement methodology"): small jitted programs fuse into their
consumers, and identical-argument timing loops mis-report by orders of
magnitude. The only trusted instrument is the FULL jitted graph over
ROTATING pre-staged device-resident inputs, 30+ async dispatches, one
final block — and attribution is done by ablating the graph itself and
comparing full-graph numbers. This tool packages that protocol.

Variants (select with --variants, comma-separated; default all):
  full          current default car config (baseline)
  warp_unpacked model.packed_warp=False (4 corner gathers per sample point)
  caps_small    nms_pre=256 / guided_test=512 (round-1 truncating budgets)
  pswarp_off    PSWarp convs+sampling replaced by a box-hash score
  nms_off       rotate_nms replaced by score-ordered top-k passthrough
  nms_pre_2048  nms_pre >= candidate cap (skips the pre-NMS top_k sort)
  ga_notopk     guided-anchor top_k(cap of A) replaced by cumsum compaction
                (index-order, measurement only — quantifies the sort cost)
  head_unfold   model.fold_head=False (three separate 1x1 head convs —
                quantifies the fused-head dispatch saving)
  bf16          model.compute_dtype="bfloat16" (respects --batch_size: at
                bs>1 the flat-batch BEVNet may turn MXU-bound where bs=1
                measured bf16 as latency-neutral)
  bs4           default graph at batch_size=4 (batch-scaling diagnosis)

--batch_size N runs EVERY selected variant at batch size N (scans are
concatenated into [N, ...] batches), so the bs>1 cliff can be decomposed
stage by stage: e.g. --variants full,nms_off,pswarp_off,ga_notopk
--batch_size 4.

The pswarp_off/nms_off/ga_notopk variants monkeypatch module functions to
carve a stage out of the graph while keeping shapes and downstream
workload comparable; they are measurement instruments, not modes.
"""
import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_inputs(cfg, n_scans=8):
    from sassd_tpu.data import augment as aug
    from sassd_tpu.data.kitti import build_anchors, build_host_plans
    from sassd_tpu.data.synthetic import make_scene
    from sassd_tpu.ops.voxelize import voxelize_np
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    anchors_np, anchors_bv = build_anchors(cfg)[:2]
    pcr = np.asarray(cfg.voxel.point_cloud_range)
    staged = []
    for _ in range(n_scans):
        pts = make_scene(rng, n_cars=(6, 12), n_ground=18000)[0]
        v, coords, n = voxelize_np(pts, cfg.voxel, pad=True)
        mask = aug.anchors_mask_from_coords(
            coords, anchors_bv, cfg.voxel.voxel_size, pcr,
            cfg.voxel.grid_size, cfg.data.anchor_area_threshold)
        g = cfg.caps.max_gt
        b = {"voxels": v[None], "num_points": n[None], "coords": coords[None],
             "anchors_mask": mask[None],
             "gt_boxes": np.zeros((1, g, 7), np.float32),
             "gt_classes": np.zeros((1, g), np.int32),
             "gt_valid": np.zeros((1, g), bool)}
        for k, arr in build_host_plans(cfg, coords, train=False).items():
            b[k] = arr[None]
        staged.append({k: jnp.asarray(x) for k, x in b.items()})
    return staged, jnp.asarray(anchors_np)


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--variants", default="all")
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--batch_size", type=int, default=1,
                    help="run every variant at this batch size")
    ap.add_argument("--flat_batch", type=int, default=1,
                    help="0: per-sample vmap sparse convs (pre-round-3 mode)")
    args = ap.parse_args()
    want = None if args.variants == "all" else set(args.variants.split(","))

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/sassd_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    from sassd_tpu.config import car_config
    from sassd_tpu.core import riou
    from sassd_tpu.models import detector, pswarp

    print(jax.devices(), flush=True)
    cfg = car_config()
    if not args.flat_batch:
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, flat_batch=False))
    staged, anchors = build_inputs(cfg)
    params, state = detector.detector_init(jax.random.PRNGKey(0), cfg)

    if args.batch_size > 1:
        n = args.batch_size
        staged = [{k: jnp.concatenate([staged[j][k] for j in
                                       range(i, i + n)], 0)
                   for k in staged[0]}
                  for i in range(0, len(staged) - n + 1, n)]
        args.iters = max(8, args.iters // n)

    def measure(tag, c, batches, iters=None):
        if want is not None and tag not in want:
            return

        @jax.jit
        def step(p, s, b):
            return detector.forward_test(p, s, b, anchors, c)

        iters = iters or args.iters
        out = step(params, state, batches[0])
        jax.block_until_ready(out)
        for b in batches[:3]:
            jax.block_until_ready(step(params, state, b))
        t0 = time.perf_counter()
        for i in range(iters):
            out = step(params, state, batches[i % len(batches)])
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        bsz = batches[0]["voxels"].shape[0]
        print(f"{tag}: {dt * 1000:.2f} ms/dispatch ({bsz / dt:.1f} scans/s)",
              flush=True)

    measure("full", cfg, staged)

    measure("warp_unpacked", dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, packed_warp=False)), staged)

    measure("caps_small", dataclasses.replace(
        cfg, caps=dataclasses.replace(cfg.caps, guided_test=512),
        test=dataclasses.replace(cfg.test, nms_pre=256)), staged)

    # pswarp_off: cheap box-hash score keeps NMS workload realistic
    orig_psw = pswarp.pswarp_apply

    def psw_stub(p, s, conv6, boxes, valid, **kw):
        sc = jnp.sum(boxes * jnp.asarray([.3, .7, .1, .2, .5, .4, .9]),
                     axis=-1) * 0.05 + 0.0 * jnp.sum(conv6[..., 0])
        return jnp.where(valid, sc, 0.0), {"bn0": s["bn0"]}

    pswarp.pswarp_apply = psw_stub
    measure("pswarp_off", cfg, staged)
    pswarp.pswarp_apply = orig_psw

    # nms_off: keep the argsort, drop the suppression loop + IoU matrices
    orig_nms = riou.rotate_nms

    def nms_stub(bev5, scores, iou_thr, valid=None, max_det=100):
        order = jnp.argsort(-jnp.where(valid, scores, -jnp.inf))
        keep = valid[order] & (jnp.arange(scores.shape[0]) < max_det)
        return order, keep

    riou.rotate_nms = nms_stub
    measure("nms_off", cfg, staged)
    riou.rotate_nms = orig_nms

    measure("nms_pre_2048", dataclasses.replace(
        cfg, test=dataclasses.replace(cfg.test, nms_pre=2048)), staged)

    measure("head_unfold", dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, fold_head=False)), staged)

    measure("bf16", dataclasses.replace(
        cfg, model=dataclasses.replace(
            cfg.model, compute_dtype="bfloat16")), staged)

    # ga_notopk: cumsum compaction in place of the guided-anchor top_k
    orig_topk = jax.lax.top_k

    def compact_topk(ranked, k):
        if ranked.ndim == 2 and ranked.shape[-1] > 8 * k:   # the GA call
            def one(r):
                sel = jnp.isfinite(r)
                rank = jnp.cumsum(sel.astype(jnp.int32)) - 1
                slot = jnp.where(sel, rank, k)
                vals = jnp.full((k + 1,), -jnp.inf, r.dtype).at[slot].set(
                    r, mode="drop")[:k]
                idx = jnp.zeros((k + 1,), jnp.int32).at[slot].set(
                    jnp.arange(r.shape[0], dtype=jnp.int32), mode="drop")[:k]
                return vals, idx
            return jax.vmap(one)(ranked)
        return orig_topk(ranked, k)

    jax.lax.top_k = compact_topk
    measure("ga_notopk", cfg, staged)
    jax.lax.top_k = orig_topk

    if (want is None or "bs4" in want) and args.batch_size == 1:
        b4 = [{k: jnp.concatenate([staged[j][k] for j in range(i, i + 4)], 0)
               for k in staged[0]} for i in range(0, 8, 4)]
        measure("bs4", cfg, b4, iters=16)
    print("done", flush=True)


if __name__ == "__main__":
    main()
