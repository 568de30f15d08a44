#!/usr/bin/env python
"""Offline KITTI data preparation CLI.

Equivalent of /root/reference/tools/create_data.py:

    python tools/create_data.py /path/to/KITTI --all
    python tools/create_data.py /path/to/KITTI --infos --reduced --gt_db
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("data_root", help="KITTI root (contains training/, ImageSets/)")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--infos", action="store_true")
    ap.add_argument("--reduced", action="store_true")
    ap.add_argument("--gt_db", action="store_true")
    ap.add_argument("--classes", nargs="*", default=None)
    args = ap.parse_args()

    from sassd_tpu.data import create_data as cd

    if args.all or args.reduced:
        cd.create_reduced_point_cloud(args.data_root)
    if args.all or args.infos:
        cd.create_kitti_info_file(args.data_root)
    if args.all or args.gt_db:
        cd.create_groundtruth_database(args.data_root, "train", args.classes)


if __name__ == "__main__":
    main()
