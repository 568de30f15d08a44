"""Multi-class convergence-run config: full-size multi config, bs=1,
12-epoch one-cycle schedule, mid-epoch saves (leak-prone tunneled host).

This is the exact configuration of the round-3 VALIDATION.md run (200
scenes x 12 epochs; the 12-epoch schedule was previously applied via a
--epochs CLI override and is now committed here). The round-4 full-scale
protocol lives in configs/multi_convergence_r4.py.
"""
import dataclasses
from sassd_tpu.config import multi_config, TrainConfig, DataConfig

_base = multi_config()
_model = dataclasses.replace(_base.model, host_plans=False)
config = dataclasses.replace(
    _base,
    model=_model,
    train=dataclasses.replace(_base.train, batch_size=1, total_epochs=12,
                              # the round-3 run predated the
                              # exclude_bn_bias default; keep its recipe
                              weight_decay_mode="all",
                              checkpoint_every_steps=400,
                              checkpoint_interval=2, max_inflight_steps=1),
    data=dataclasses.replace(_base.data, num_workers=0,
                             root="/root/repo/runs/multi_corpus",
                             info_path="/root/repo/runs/multi_corpus/ImageSets/train200.txt",
                             db_info_path="/root/repo/runs/multi_corpus/kitti_dbinfos_train.pkl"),
    work_dir="/root/repo/runs/run_multi",
)
