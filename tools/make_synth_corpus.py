#!/usr/bin/env python
"""Generate the synthetic multi-class convergence corpus + GT database.

Round-2/4 protocol (VALIDATION.md): 1600 train / 200 val scenes, 3
classes, GT-paste database built from the train split. Usage:

    python tools/make_synth_corpus.py runs/multi_corpus \
        --n_train 1600 --n_val 200 --classes Car Pedestrian Cyclist
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("root")
    ap.add_argument("--n_train", type=int, default=1600)
    ap.add_argument("--n_val", type=int, default=200)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--classes", nargs="*",
                    default=["Car", "Pedestrian", "Cyclist"])
    args = ap.parse_args()

    from sassd_tpu.config import multi_config
    from sassd_tpu.data import create_data as cd
    from sassd_tpu.data.synthetic import write_synthetic_kitti

    cfg = multi_config()
    t0 = time.time()
    write_synthetic_kitti(args.root, n_train=args.n_train, n_val=args.n_val,
                          seed=args.seed, classes=tuple(args.classes),
                          point_cloud_range=cfg.voxel.point_cloud_range)
    print(f"scenes written in {time.time() - t0:.0f}s", flush=True)
    cd.create_kitti_info_file(args.root)
    print(f"infos done at {time.time() - t0:.0f}s", flush=True)
    cd.create_groundtruth_database(args.root, "train", list(args.classes))
    print(f"gt_db done at {time.time() - t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
