"""Worker process for the 2-process multi-host integration test.

Launched by tests/test_multihost.py as a subprocess:

    python tests/_mh_worker.py <proc_id> <nprocs> <port> <kitti_root> <out_dir>

Runs the REAL train_model loop (loader sharding, checkpointing, LogBuffer)
on a CPU mesh spanning all processes, then dumps the final params so the
parent can assert cross-process equality and single-process parity.
"""
import dataclasses
import os
import sys


def mh_config(out_dir: str):
    """Widened tiny config matching the synthetic KITTI scene extent."""
    from sassd_tpu.config import tiny_config
    from sassd_tpu.ops.voxelize import VoxelConfig

    c = tiny_config()
    return dataclasses.replace(
        c,
        work_dir=str(out_dir),
        voxel=VoxelConfig(voxel_size=(0.4, 0.4, 0.5),
                          point_cloud_range=(0, -40.0, -3.0, 70.4, 40.0, 1.0),
                          max_num_points=5, max_voxels=4000),
        anchors={"Car": dataclasses.replace(
            c.anchors["Car"], strides=(3.2, 3.2, 1.0),
            offsets=(1.6, -38.4, -1.78))},
        train=dataclasses.replace(c.train, batch_size=2, seed=7,
                                  log_interval=1, checkpoint_interval=1),
    )


def run_training(cfg, kitti_root, mesh, total_epochs=2):
    import os.path as osp

    from sassd_tpu.data.kitti import KittiDataset
    from sassd_tpu.train.loop import train_model

    dataset = KittiDataset(cfg, osp.join(kitti_root, "training"),
                           osp.join(kitti_root, "ImageSets", "train.txt"))
    return train_model(cfg, dataset, work_dir=cfg.work_dir,
                       total_epochs=total_epochs, mesh=mesh, resume=False)


def main():
    proc_id, nprocs, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    kitti_root, out_dir = sys.argv[4], sys.argv[5]

    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")   # beat the axon TPU plugin
    jax.config.update("jax_num_cpu_devices", 1)
    jax.config.update("jax_default_matmul_precision", "highest")
    jax.config.update("jax_compilation_cache_dir", "/tmp/sassd_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    from sassd_tpu.parallel import dist
    from sassd_tpu.parallel import mesh as mesh_lib

    dist.initialize(f"localhost:{port}", nprocs, proc_id)
    assert jax.process_count() == nprocs, jax.process_count()
    assert len(jax.devices()) == nprocs, jax.devices()

    import numpy as np

    os.makedirs(out_dir, exist_ok=True)
    cfg = mh_config(out_dir)
    mesh = mesh_lib.make_mesh()
    params, _state, step = run_training(cfg, kitti_root, mesh)
    leaves = jax.tree_util.tree_leaves(jax.device_get(params))
    np.savez(os.path.join(out_dir, f"final_{proc_id}.npz"),
             **{f"p{i}": np.asarray(x) for i, x in enumerate(leaves)},
             step=np.int64(step))
    print(f"worker {proc_id}: done after step {step}", flush=True)


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    main()
