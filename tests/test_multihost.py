"""Multi-process (multi-host) data-parallel integration tests.

The TPU analog of the reference's DDP path (/root/reference/tools/env.py:
12-30 + tools/dist_train.sh): two REAL processes connect via
jax.distributed, train the same model on disjoint data shards through the
full train_model loop (loader sharding, checkpointing, LogBuffer), and must
end with identical parameters — which also match a single-process run over
the same global batches.
"""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from sassd_tpu.data.loader import epoch_indices

TESTS_DIR = os.path.dirname(os.path.abspath(__file__))


def test_epoch_indices_shards_are_disjoint_and_complete():
    """DistributedGroupSampler semantics (sampler.py:51-132): the per-host
    strided slices partition the (padded) epoch permutation."""
    for n, shards, bs in [(10, 2, 2), (7, 2, 2), (16, 4, 1), (5, 3, 2)]:
        parts = [epoch_indices(n, epoch=3, seed=0, shuffle=True,
                               num_shards=shards, shard_id=h, batch_size=bs)
                 for h in range(shards)]
        lens = {len(p) for p in parts}
        assert len(lens) == 1          # same step count on every host
        allidx = np.concatenate(parts)
        # padding wraps, so each index appears ceil-evenly; the union must
        # cover the dataset and no index more than ceil(total/n) times
        assert set(allidx.tolist()) == set(range(n))
        total = len(allidx)
        counts = np.bincount(allidx, minlength=n)
        assert counts.max() - counts.min() <= 1
        assert total % (shards * bs) == 0
        # exact partition when nothing padded
        if n % (shards * bs) == 0:
            assert total == n


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def mh_run(tmp_path_factory):
    """Launch the 2-process training job once; several tests assert on it."""
    from sassd_tpu.data import synthetic

    root = tmp_path_factory.mktemp("mh_kitti")
    synthetic.write_synthetic_kitti(root, n_train=4, n_val=2, seed=0)

    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["JAX_PLATFORMS"] = "cpu"
    worker = os.path.join(TESTS_DIR, "_mh_worker.py")

    # Gloo's cross-process context handshake has a fixed 30 s key-exchange
    # deadline baked into jaxlib; on a loaded single-core machine the two
    # workers can be scheduled >30 s apart and the rendezvous times out.
    # That is starvation, not a product bug — retry with a fresh port.
    for attempt in range(3):
        out = tmp_path_factory.mktemp(f"mh_out{attempt}")
        port = _free_port()
        procs = [subprocess.Popen(
            [sys.executable, worker, str(pid), "2", str(port),
             str(root), str(out / f"w{pid}")],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
            for pid in range(2)]
        outs = []
        for p in procs:
            try:
                stdout, _ = p.communicate(timeout=900)
            except subprocess.TimeoutExpired:
                p.kill()
                stdout, _ = p.communicate()
                pytest.fail(f"worker timed out:\n{stdout[-4000:]}")
            outs.append(stdout)
        if all(p.returncode == 0 for p in procs):
            return root, out, outs
        starved = any("DEADLINE_EXCEEDED" in o or
                      "Gloo context initialization failed" in o
                      for o in outs)
        if not starved or attempt == 2:
            bad = next(o for p, o in zip(procs, outs) if p.returncode != 0)
            assert False, f"worker failed:\n{bad[-4000:]}"
    return root, out, outs


def test_two_process_training_params_identical(mh_run):
    _root, out, _outs = mh_run
    f0 = np.load(out / "w0" / "final_0.npz")
    f1 = np.load(out / "w1" / "final_1.npz")
    assert set(f0.files) == set(f1.files)
    assert int(f0["step"]) == int(f1["step"]) and int(f0["step"]) > 0
    for k in f0.files:
        np.testing.assert_array_equal(f0[k], f1[k], err_msg=k)


def test_two_process_matches_single_process(mh_run):
    """Same seed, same global batches: the 2-process run must reproduce a
    single-process mesh run (psum-synced grads == local grads over the full
    batch), modulo cross-process reduction order."""
    import jax

    sys.path.insert(0, TESTS_DIR)
    from _mh_worker import mh_config, run_training
    from sassd_tpu.parallel import mesh as mesh_lib

    root, out, _outs = mh_run
    cfg = mh_config(str(out / "single"))
    mesh = mesh_lib.make_mesh(2)
    # match the workers' matmul precision (they pin "highest"); remaining
    # divergence is cross-process psum reduction order plus conv-kernel
    # tiling differences between the workers' B=1 graphs and this B=2
    # graph (e.g. the fused fold_head conv reassociates differently per
    # batch shape), amplified through Adam's per-step normalization over
    # the 4 steps — tolerance below covers that rounding, not an
    # algorithmic gap (worker0 == worker1 stays exactly equal above).
    with jax.default_matmul_precision("highest"):
        params, _state, step = run_training(cfg, str(root), mesh)
    leaves = jax.tree_util.tree_leaves(jax.device_get(params))
    f0 = np.load(out / "w0" / "final_0.npz")
    assert int(f0["step"]) == step
    assert len(leaves) == len(f0.files) - 1
    for i, leaf in enumerate(leaves):
        np.testing.assert_allclose(
            np.asarray(leaf), f0[f"p{i}"], rtol=1e-2, atol=1.5e-3,
            err_msg=f"leaf {i}")


def test_primary_only_checkpoints(mh_run):
    """Checkpoints are written by process 0 only (replicated params)."""
    _root, out, _outs = mh_run
    w0 = list((out / "w0").glob("checkpoint_epoch_*.msgpack"))
    w1 = list((out / "w1").glob("checkpoint_epoch_*.msgpack"))
    assert len(w0) > 0
    assert len(w1) == 0
