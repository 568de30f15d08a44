#!/usr/bin/env python
"""Evaluation CLI.

Equivalent of /root/reference/tools/test.py: run inference on the val split
and report official KITTI AP (R11 + R40, bbox/bev/3d/AOS).

    python tools/test.py configs/car.py work_dir/checkpoint_epoch_79.msgpack
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description="Evaluate a SA-SSD TPU detector")
    ap.add_argument("config")
    ap.add_argument("checkpoint")
    ap.add_argument("--split", default=None, help="val split file")
    ap.add_argument("--batch_size", type=int, default=1)
    ap.add_argument("--out", default=None, help="write result files here")
    args = ap.parse_args()

    import jax
    from sassd_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from sassd_tpu.config import load_config
    from sassd_tpu.data.kitti import KittiDataset
    from sassd_tpu.inference import evaluate, run_inference
    from sassd_tpu.models import detector
    from sassd_tpu.train import checkpoint as ckpt
    from sassd_tpu.utils.logging_utils import get_root_logger

    cfg = load_config(args.config)
    logger = get_root_logger()
    data_root = os.path.join(cfg.data.root, "training")
    split = args.split or os.path.join(cfg.data.root, "ImageSets", "val.txt")
    dataset = KittiDataset(cfg, data_root, split, test_mode=True)

    params, state = detector.detector_init(jax.random.PRNGKey(0), cfg)
    params = ckpt.load_params_only(args.checkpoint, params)
    # state (BN running stats) rides in the same file
    import flax.serialization as ser
    with open(args.checkpoint, "rb") as f:
        payload = ser.msgpack_restore(f.read())
    state = ser.from_state_dict(state, payload["state"])

    precomputed = None
    if args.out:
        # ONE inference pass: write KITTI result files from this rank's
        # shard, then hand the same annos to evaluate() for the AP tables
        from sassd_tpu.eval.results import anno_to_result_lines
        from sassd_tpu.parallel import dist
        annos, ids = run_inference(cfg, dataset, params, state,
                                   args.batch_size, logger,
                                   num_shards=dist.process_count(),
                                   shard_id=dist.process_index())
        os.makedirs(args.out, exist_ok=True)
        for anno, sid in zip(annos, ids):
            with open(os.path.join(args.out, f"{sid:06d}.txt"), "w") as f:
                f.write("\n".join(anno_to_result_lines(anno)) + "\n")
        logger.info("wrote %d result files to %s", len(ids), args.out)
        precomputed = (annos, ids)

    results, text = evaluate(cfg, dataset, params, state,
                             os.path.join(data_root, "label_2"),
                             args.batch_size, logger,
                             precomputed=precomputed)
    print(text)


if __name__ == "__main__":
    main()
