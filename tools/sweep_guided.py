"""guided_train cap sweep: measure PSWarp positive-pool truncation.

The reference keeps ALL anchors over the score threshold plus appended GTs
as PSWarp train candidates (ssd_rotate_head.py:307-372); this repo caps
them at `caps.guided_train` via top-k-by-score. This probe measures, on
GT-pasted TRAIN scenes with a real checkpoint's scores, how many
candidates pass the threshold and whether any IoU>=0.7 positive falls
outside the top-k at each candidate cap.

    python tools/sweep_guided.py cfg.py ckpt.msgpack --caps 640,1280,2560

Round-3 result on the epoch-9 multi-class checkpoint (VALIDATION.md):
cap=640 truncates 9/16 dense scenes but positive-pool recall is 1.000 at
every cap — positives rank high by score once the RPN has trained.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("config")
    ap.add_argument("checkpoint")
    ap.add_argument("--caps", default="640,1280,2560")
    ap.add_argument("--scenes", type=int, default=16)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (leave accelerators alone)")
    args = ap.parse_args()
    caps = [int(c) for c in args.caps.split(",")]

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/sassd_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    import jax.numpy as jnp
    import numpy as np
    import flax.serialization as ser

    from sassd_tpu.config import load_config
    from sassd_tpu.core import boxes as box_ops, riou
    from sassd_tpu.data.kitti import KittiDataset, build_anchors
    from sassd_tpu.data.loader import collate
    from sassd_tpu.models import detector, ssd_head

    cfg = load_config(args.config)
    ds = KittiDataset(cfg, os.path.join(cfg.data.root, "training"),
                      os.path.join(cfg.data.root, "ImageSets", "train.txt"))
    anchors = jnp.asarray(build_anchors(cfg)[0])
    params, state = detector.detector_init(jax.random.PRNGKey(0), cfg)
    with open(args.checkpoint, "rb") as f:
        payload = ser.msgpack_restore(f.read())
    params = ser.from_state_dict(params, payload["params"])
    state = ser.from_state_dict(state, payload["state"])

    @jax.jit
    def head_outs(params, state, batch):
        spine = detector.forward_spine(params, state, batch, cfg,
                                       train=False)
        outs = ssd_head.head_apply(
            params["head"], spine.bev_map, cfg.model.num_class,
            cfg.model.box_code_size, cfg.model.num_anchor_per_loc)
        scores = jax.nn.sigmoid(outs.cls_preds)
        decoded = box_ops.second_box_decode(outs.box_preds, anchors[None])
        return jnp.max(scores, axis=-1), decoded

    thr = cfg.train.anchor_thr
    rows = []
    t0 = time.time()
    for i in range(args.scenes):
        batch, _metas = collate([ds[i]])
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        ts, dec = head_outs(params, state, jb)
        ts, dec = np.asarray(ts)[0], np.asarray(dec)[0]
        mask = np.asarray(batch["anchors_mask"][0])
        gtb = np.asarray(batch["gt_boxes"][0])
        gtv = np.asarray(batch["gt_valid"][0])
        g = int(gtv.sum())
        sel = (ts > thr) & mask
        idx = np.nonzero(sel)[0]
        pos = np.zeros(len(idx), bool)
        if len(idx) and g:
            iou = np.asarray(riou.rotate_iou_3d(jnp.asarray(dec[idx]),
                                                jnp.asarray(gtb[gtv])))
            pos = iou.max(1) >= cfg.train.extra_pos_iou
        order = np.argsort(-ts[idx])
        r = dict(i=i, G=g, n_pass=len(idx), n_pos=int(pos.sum()))
        for cap in caps:
            k = cap - gtb.shape[0]
            r[f"kept_pos_{cap}"] = int(pos[order[:k]].sum())
            r[f"trunc_{cap}"] = max(0, len(idx) - k)
        rows.append(r)
        print(r, flush=True)

    n = len(rows)
    tot = sum(r["n_pos"] for r in rows)
    print(f"elapsed {time.time() - t0:.1f}s over {n} scenes; "
          f"mean candidates {np.mean([r['n_pass'] for r in rows]):.1f} "
          f"(max {max(r['n_pass'] for r in rows)}), "
          f"mean GTs {np.mean([r['G'] for r in rows]):.1f}")
    for cap in caps:
        kept = sum(r[f"kept_pos_{cap}"] for r in rows)
        trunc = sum(1 for r in rows if r[f"trunc_{cap}"] > 0)
        print(f"cap={cap}: scenes truncated {trunc}/{n}, positive-pool "
              f"recall {kept}/{tot} = {kept / max(tot, 1):.3f} "
              "(appended GTs always kept)")


if __name__ == "__main__":
    main()
