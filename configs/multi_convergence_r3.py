"""Multi-class convergence-run config: full-size multi config, bs=1,
25-epoch one-cycle schedule, mid-epoch saves (leak-prone tunneled host)."""
import dataclasses
from sassd_tpu.config import multi_config, TrainConfig, DataConfig

_base = multi_config()
_model = dataclasses.replace(_base.model, host_plans=False)
config = dataclasses.replace(
    _base,
    model=_model,
    train=dataclasses.replace(_base.train, batch_size=1, total_epochs=25,
                              checkpoint_every_steps=400,
                              checkpoint_interval=2, max_inflight_steps=1),
    data=dataclasses.replace(_base.data, num_workers=0,
                             root="/root/repo/runs/multi_corpus",
                             info_path="/root/repo/runs/multi_corpus/ImageSets/train200.txt",
                             db_info_path="/root/repo/runs/multi_corpus/kitti_dbinfos_train.pkl"),
    work_dir="/root/repo/runs/run_multi",
)
