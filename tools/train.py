#!/usr/bin/env python
"""Training CLI.

Equivalent of /root/reference/tools/train.py: load a config, build the
dataset + detector, train with one-cycle Adam under a data-parallel mesh.

    python tools/train.py configs/car.py --work_dir ./runs/car
    python tools/train.py configs/car.py --synthetic   # hermetic smoke run
"""
import argparse
import dataclasses
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description="Train a SA-SSD TPU detector")
    ap.add_argument("config", help="python config file defining `config`")
    ap.add_argument("--work_dir", default=None)
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--resume_from", default=None)
    ap.add_argument("--load_from", default=None)
    ap.add_argument("--seed", type=int, default=None)
    ap.add_argument("--synthetic", action="store_true",
                    help="train on generated synthetic scenes (no KITTI)")
    ap.add_argument("--eval_interval", type=int, default=None,
                    help="run val evaluation every N epochs")
    ap.add_argument("--epochs_per_run", type=int, default=None,
                    help="bound THIS process to N epochs (schedule stays "
                         "pinned to --epochs); exits 75 if more epochs "
                         "remain so an outer loop can relaunch + resume — "
                         "for preemptible or leak-prone hosts")
    ap.add_argument("--dist", action="store_true",
                    help="multi-host: jax.distributed.initialize() with "
                         "cluster auto-detection (TPU pod metadata)")
    ap.add_argument("--coordinator", default=None,
                    help="multi-host: coordinator host:port (overrides "
                         "auto-detection; requires --num_processes/"
                         "--process_id)")
    ap.add_argument("--num_processes", type=int, default=None)
    ap.add_argument("--process_id", type=int, default=None)
    args = ap.parse_args()

    import jax
    from sassd_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    if args.dist or args.coordinator:
        from sassd_tpu.parallel import dist
        dist.initialize(args.coordinator, args.num_processes,
                        args.process_id)
    from sassd_tpu.config import load_config
    from sassd_tpu.data.kitti import KittiDataset
    from sassd_tpu.data.synthetic import write_synthetic_kitti
    from sassd_tpu.parallel import mesh as mesh_lib
    from sassd_tpu.train.loop import train_model
    from sassd_tpu.utils.logging_utils import get_root_logger

    cfg = load_config(args.config)
    updates = {}
    if args.work_dir:
        updates["work_dir"] = args.work_dir
    if args.resume_from:
        updates["resume_from"] = args.resume_from
    if args.load_from:
        updates["load_from"] = args.load_from
    if args.seed is not None:
        updates["train"] = dataclasses.replace(cfg.train, seed=args.seed)
    if updates:
        cfg = dataclasses.replace(cfg, **updates)

    logger = get_root_logger(cfg.work_dir)
    logger.info("devices: %s", jax.devices())

    if args.synthetic:
        root = tempfile.mkdtemp(prefix="sassd_synth_")
        write_synthetic_kitti(root, n_train=16, n_val=4,
                              seed=cfg.train.seed,
                              classes=cfg.class_names,
                              point_cloud_range=cfg.voxel.point_cloud_range)
        data_root = os.path.join(root, "training")
        split = os.path.join(root, "ImageSets", "train.txt")
    else:
        data_root = os.path.join(cfg.data.root, "training")
        split = cfg.data.info_path or os.path.join(
            cfg.data.root, "ImageSets", "train.txt")

    dataset = KittiDataset(cfg, data_root, split)
    spatial = cfg.parallel.spatial if cfg.parallel.strategy != "data" else 1
    mesh = (mesh_lib.make_mesh(spatial=spatial)
            if len(jax.devices()) > 1 or spatial > 1 else None)

    epoch_callback = None
    if args.eval_interval:
        from sassd_tpu.inference import evaluate
        val_split = os.path.join(os.path.dirname(split), "val.txt")
        val_ds = KittiDataset(cfg, data_root, val_split, test_mode=True)

        def epoch_callback(epoch, params, state):
            _res, text = evaluate(cfg, val_ds, params, state,
                                  os.path.join(data_root, "label_2"))
            logger.info("eval after epoch %d:\n%s", epoch, text)

    _p, _s, step = train_model(cfg, dataset, work_dir=cfg.work_dir,
                               total_epochs=args.epochs, mesh=mesh,
                               logger=logger, epoch_callback=epoch_callback,
                               eval_interval=args.eval_interval,
                               epochs_per_run=args.epochs_per_run)
    if args.epochs_per_run is not None:
        total = args.epochs or cfg.train.total_epochs
        spe = max(-(-len(dataset) // cfg.train.batch_size), 1)
        if step < spe * total:
            sys.exit(75)        # more epochs remain; relaunch to continue


if __name__ == "__main__":
    main()
