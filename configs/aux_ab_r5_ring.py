"""Round-5 ring-vs-exact aux 3-NN A/B — RING arm (VERDICT r4 item 3).

Controlled pair: identical corpus (first 400 scenes of the round-4
1600-scene corpus, same 200-scene held-out val), identical seed, schedule
(12-epoch one-cycle, bs=1), recipe (device plans, weight-decay masking) —
the ONLY difference between the two arms is ModelConfig.aux_interp.
Ring = the 3x3x3 parent-neighborhood candidate source the host rulebook,
the banded path, and every convergence run so far used; exact = the
reference's brute-force 3-NN (interpolate_gpu.cu:9-56 semantics). The aux
branch only shapes training gradients (inference is aux-free), so the AP
delta isolates the approximation's effect on learning. Results:
VALIDATION.md round 5.
"""
import dataclasses
from sassd_tpu.config import multi_config

_base = multi_config()
config = dataclasses.replace(
    _base,
    model=dataclasses.replace(_base.model, host_plans=False,
                              aux_interp="ring"),
    train=dataclasses.replace(_base.train, batch_size=1, total_epochs=12,
                              checkpoint_every_steps=600,
                              checkpoint_interval=3, max_inflight_steps=1),
    data=dataclasses.replace(
        _base.data, num_workers=0,
        root="/root/repo/runs/multi_corpus",
        info_path="/root/repo/runs/multi_corpus/ImageSets/train400.txt",
        db_info_path="/root/repo/runs/multi_corpus/kitti_dbinfos_train.pkl"),
    work_dir="/root/repo/runs/aux_ab_r5_ring",
)
