"""Training runtime tests: schedules, checkpointing, train step, DP mesh."""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from sassd_tpu.models import detector
from sassd_tpu.train import checkpoint as ckpt
from sassd_tpu.train import loop, optim
from tiny_config import random_batch, tiny_anchors, tiny_config


def test_one_cycle_schedules():
    lr = optim.one_cycle_lr(0.003, 10.0, 0.4, 1000)
    assert abs(float(lr(0)) - 0.0003) < 1e-6
    assert abs(float(lr(400)) - 0.003) < 1e-5       # peak at pct_start
    assert float(lr(1000)) < 1e-6                   # anneal to low/1e4
    mom = optim.one_cycle_momentum((0.95, 0.85), 0.4, 1000)
    assert abs(float(mom(0)) - 0.95) < 1e-6
    assert abs(float(mom(400)) - 0.85) < 1e-4
    assert abs(float(mom(1000)) - 0.95) < 1e-4
    # monotone segments
    xs = np.array([float(lr(i)) for i in range(0, 400, 40)])
    assert np.all(np.diff(xs) > 0)


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    params, state = detector.detector_init(jax.random.PRNGKey(0), cfg)
    anchors = jnp.asarray(tiny_anchors(cfg))
    batch = {k: jnp.asarray(v) for k, v in
             random_batch(cfg, np.random.default_rng(1)).items()}
    return cfg, params, state, anchors, batch


def _copy(tree):
    import jax, jax.numpy as jnp
    return jax.tree_util.tree_map(jnp.copy, tree)


def test_train_step_reduces_loss(setup):
    cfg, params, state, anchors, batch = setup
    params, state = _copy(params), _copy(state)
    tx = optim.make_optimizer(cfg.train, total_steps=100)
    opt_state = tx.init(params)
    step = loop.make_train_step(cfg, anchors, tx)
    losses = []
    p, s, o = params, state, opt_state
    for i in range(12):
        p, s, o, metrics = step(p, s, o, batch)
        losses.append(float(metrics["loss"]))
    assert np.all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses
    assert float(metrics["grad_norm"]) > 0


def test_checkpoint_roundtrip(tmp_path, setup):
    cfg, params, state, anchors, batch = setup
    params, state = _copy(params), _copy(state)
    tx = optim.make_optimizer(cfg.train, total_steps=100)
    opt_state = tx.init(params)
    step = loop.make_train_step(cfg, anchors, tx)
    p, s, o = params, state, opt_state
    for _ in range(3):
        p, s, o, _m = step(p, s, o, batch)
    path = ckpt.save(tmp_path, epoch=1, step=3, params=jax.device_get(p),
                     state=jax.device_get(s), opt_state=jax.device_get(o))
    # restore into freshly initialized trees
    p2, s2 = detector.detector_init(jax.random.PRNGKey(42), cfg)
    o2 = tx.init(p2)
    rp, rs, ro, epoch, stepno, bidx = ckpt.restore(path, p2, s2, o2)
    assert bidx == -1
    assert (epoch, stepno) == (1, 3)
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(p)),
                    jax.tree_util.tree_leaves(rp)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # optimizer step count restored -> schedule continues
    cnt = ro[1].count if hasattr(ro[1], "count") else None
    # run one more step from the restored state — must be identical to
    # continuing the original run
    p_a, s_a, o_a, m_a = step(p, s, o, batch)
    p_b, s_b, o_b, m_b = step(rp, rs, ro, batch)
    np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]),
                               rtol=1e-6)


def test_checkpoint_rolling_window(tmp_path, setup):
    cfg, params, state, _anchors, _batch = setup
    params, state = _copy(params), _copy(state)
    tx = optax.sgd(1e-3)
    o = tx.init(params)
    for e in range(6):
        ckpt.save(tmp_path, e, e * 10, jax.device_get(params),
                  jax.device_get(state), jax.device_get(o), max_keep=3)
    kept = sorted(e for e, _ in ckpt.list_checkpoints(tmp_path))
    assert kept == [3, 4, 5]
    assert ckpt.latest_checkpoint(tmp_path).endswith("checkpoint_epoch_5.msgpack")


def test_checkpoint_prunes_step_saves_before_epoch_saves(tmp_path, setup):
    """Mid-epoch saves are crash-resilience artifacts: once a later
    checkpoint exists they are superseded and must be pruned FIRST, so the
    rolling window keeps end-of-epoch snapshots (the AP-curve series)."""
    cfg, params, state, _anchors, _batch = setup
    params, state = _copy(params), _copy(state)
    tx = optax.sgd(1e-3)
    o = tx.init(params)
    p, s, oh = jax.device_get(params), jax.device_get(state), jax.device_get(o)
    for e in range(4):
        for b in (200, 400):          # mid-epoch step saves
            ckpt.save(tmp_path, e, e * 10 + b // 100, p, s, oh,
                      max_keep=6, batch_idx=b)
        ckpt.save(tmp_path, e, e * 10 + 9, p, s, oh, max_keep=6)
    names = sorted(x[1].split("/")[-1] for x in ckpt.list_checkpoints(tmp_path))
    # all four epoch saves survive; no step files remain (each epoch is
    # complete, so its step saves were superseded)
    assert names == [f"checkpoint_epoch_{e}.msgpack" for e in range(4)]
    # an in-progress epoch's LATEST step save is kept for resume
    ckpt.save(tmp_path, 4, 48, p, s, oh, max_keep=6, batch_idx=200)
    ckpt.save(tmp_path, 4, 50, p, s, oh, max_keep=6, batch_idx=400)
    names = sorted(x[1].split("/")[-1] for x in ckpt.list_checkpoints(tmp_path))
    assert "checkpoint_epoch_4_step_400.msgpack" in names
    assert "checkpoint_epoch_4_step_200.msgpack" not in names
    assert ckpt.latest_checkpoint(tmp_path).endswith(
        "checkpoint_epoch_4_step_400.msgpack")


def test_dp_mesh_train_step(setup):
    """8-device CPU mesh: DP step runs, loss finite, params stay replicated."""
    from sassd_tpu.parallel import mesh as mesh_lib
    cfg, params, state, anchors, _ = setup
    params, state = _copy(params), _copy(state)
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = mesh_lib.make_mesh(8)
    batch = {k: jnp.asarray(np.concatenate([v] * 4))
             for k, v in random_batch(cfg, np.random.default_rng(2)).items()}
    assert batch["voxels"].shape[0] == 8
    tx = optim.make_optimizer(cfg.train, total_steps=100)
    opt_state = tx.init(params)
    params_r = mesh_lib.replicate(mesh, params)
    state_r = mesh_lib.replicate(mesh, state)
    opt_r = mesh_lib.replicate(mesh, opt_state)
    step = loop.make_train_step(cfg, anchors, tx, mesh=mesh)
    db = mesh_lib.shard_batch(mesh, batch)
    p, s, o, metrics = step(params_r, state_r, opt_r, db)
    assert np.isfinite(float(metrics["loss"]))
    # two identical shards -> same loss as single-shard run on the same data
    assert float(metrics["grad_norm"]) > 0


def test_epochs_per_run_resumes_schedule(tmp_path):
    """Bounded-session training: two 1-epoch processes must reproduce one
    2-epoch run exactly (checkpoint resume keeps the OneCycle schedule
    pinned to total_epochs; the leak/preemption workaround must not change
    the math)."""
    import dataclasses

    from sassd_tpu.data import synthetic
    from sassd_tpu.data.kitti import KittiDataset
    from sassd_tpu.ops.voxelize import VoxelConfig

    root = tmp_path / "kitti"
    synthetic.write_synthetic_kitti(root, n_train=4, n_val=2, seed=0)
    c = tiny_config()
    cfg = dataclasses.replace(
        c,
        voxel=VoxelConfig(voxel_size=(0.4, 0.4, 0.5),
                          point_cloud_range=(0, -40.0, -3.0, 70.4, 40.0, 1.0),
                          max_num_points=5, max_voxels=4000),
        anchors={"Car": dataclasses.replace(
            c.anchors["Car"], strides=(3.2, 3.2, 1.0),
            offsets=(1.6, -38.4, -1.78))},
        train=dataclasses.replace(c.train, batch_size=2, seed=3,
                                  checkpoint_interval=1, log_interval=100),
    )
    ds = KittiDataset(cfg, root / "training", root / "ImageSets" / "train.txt")

    # one continuous 2-epoch run
    p_ref, _s, step_ref = loop.train_model(
        cfg, ds, work_dir=str(tmp_path / "cont"), total_epochs=2,
        resume=False)
    # two bounded 1-epoch sessions sharing a work_dir
    p1, _s, step1 = loop.train_model(
        cfg, ds, work_dir=str(tmp_path / "chunk"), total_epochs=2,
        epochs_per_run=1, resume=True)
    assert step1 == step_ref // 2
    p2, _s, step2 = loop.train_model(
        cfg, ds, work_dir=str(tmp_path / "chunk"), total_epochs=2,
        epochs_per_run=1, resume=True)
    assert step2 == step_ref
    ref = jax.tree_util.tree_leaves(jax.device_get(p_ref))
    got = jax.tree_util.tree_leaves(jax.device_get(p2))
    for a, b in zip(ref, got):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_step_interval_checkpoint_resumes_mid_epoch(tmp_path):
    """checkpoint_every_steps: a session killed mid-epoch resumes from the
    step save, fast-forwards the loader past consumed batches, and ends
    identical to a continuous run."""
    import dataclasses

    from sassd_tpu.data import synthetic
    from sassd_tpu.data.kitti import KittiDataset
    from sassd_tpu.ops.voxelize import VoxelConfig
    from sassd_tpu.train import checkpoint as ckpt_lib

    root = tmp_path / "kitti"
    synthetic.write_synthetic_kitti(root, n_train=8, n_val=2, seed=0)
    c = tiny_config()
    base = dataclasses.replace(
        c,
        voxel=VoxelConfig(voxel_size=(0.4, 0.4, 0.5),
                          point_cloud_range=(0, -40.0, -3.0, 70.4, 40.0, 1.0),
                          max_num_points=5, max_voxels=4000),
        anchors={"Car": dataclasses.replace(
            c.anchors["Car"], strides=(3.2, 3.2, 1.0),
            offsets=(1.6, -38.4, -1.78))},
        train=dataclasses.replace(c.train, batch_size=2, seed=5,
                                  checkpoint_interval=1, log_interval=100),
    )
    ds = KittiDataset(base, root / "training",
                      root / "ImageSets" / "train.txt")

    p_ref, _s, step_ref = loop.train_model(
        base, ds, work_dir=str(tmp_path / "cont"), total_epochs=1,
        resume=False)
    assert step_ref == 4                 # 8 scans / bs 2

    # saving every 3 steps -> a mid-epoch checkpoint at batch 3
    cfg_step = dataclasses.replace(
        base, train=dataclasses.replace(base.train,
                                        checkpoint_every_steps=3))
    loop.train_model(cfg_step, ds, work_dir=str(tmp_path / "chunk"),
                     total_epochs=1, resume=False)
    mids = [p for _e, p in ckpt_lib.list_checkpoints(str(tmp_path / "chunk"))
            if "_step_" in p]
    assert mids, "no mid-epoch checkpoint written"
    # simulate a crash right after the step save: delete the end-of-epoch
    # file and resume — must replay only batch 4 and match the reference
    import os
    for _e, p in ckpt_lib.list_checkpoints(str(tmp_path / "chunk")):
        if "_step_" not in p:
            os.remove(p)
    p2, _s2, step2 = loop.train_model(
        cfg_step, ds, work_dir=str(tmp_path / "chunk"), total_epochs=1,
        resume=True)
    assert step2 == step_ref
    ref = jax.tree_util.tree_leaves(jax.device_get(p_ref))
    got = jax.tree_util.tree_leaves(jax.device_get(p2))
    for a, b in zip(ref, got):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_nonfinite_update_skipped(setup):
    """A batch that explodes the forward must not change params/opt state
    (the skip guard), and the skip must be visible in metrics."""
    cfg, params, state, anchors, batch = setup
    params, state = _copy(params), _copy(state)
    tx = optim.make_optimizer(cfg.train, total_steps=100)
    opt_state = tx.init(params)
    step = loop.make_train_step(cfg, anchors, tx)
    bad = dict(batch)
    bad["voxels"] = batch["voxels"].at[..., :].set(1e30)
    # the step donates its inputs — snapshot to host before calling
    params_before = jax.device_get(params)
    opt_before = jax.device_get(opt_state)
    p2, s2, o2, m = step(params, state, opt_state, bad)
    assert float(m["nonfinite_skips"]) == 1.0
    for a, b in zip(jax.tree_util.tree_leaves(params_before),
                    jax.tree_util.tree_leaves(jax.device_get(p2))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(opt_before),
                    jax.tree_util.tree_leaves(jax.device_get(o2))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and a good batch afterwards still updates
    p3, _s3, _o3, m3 = step(p2, s2, o2, batch)
    assert float(m3["nonfinite_skips"]) == 0.0
    changed = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(params_before),
                        jax.tree_util.tree_leaves(jax.device_get(p3))))
    assert changed


def test_host_stager_pack_matches_pack_batch():
    """HostStager reuses pinned buffers but must produce byte-identical
    packs, rotate depth slots, and fall back cleanly on partial batches."""
    rng = np.random.default_rng(3)

    def mk(bs):
        return {"a": rng.standard_normal((bs, 5, 3)).astype(np.float32),
                "b": rng.integers(0, 100, (bs, 7)).astype(np.int32)}

    layout = loop.batch_pack_layout(mk(2))
    st = loop.HostStager(depth=2)
    outs = []
    for i in range(5):
        b = mk(2)
        ref = loop.pack_batch(b, layout)
        got = st.pack(b, layout)
        assert set(ref) == set(got)
        for g in ref:
            assert np.array_equal(ref[g], got[g])
        outs.append(got)
    g = next(iter(outs[1]))
    assert outs[1][g] is not outs[2][g]     # adjacent calls: distinct sets
    assert outs[1][g] is outs[3][g]         # depth-2 rotation reuses
    partial = mk(1)                          # last partial batch of an epoch
    ref = loop.pack_batch(partial, layout)
    got = st.pack(partial, layout)
    for g in ref:
        assert np.array_equal(ref[g], got[g])


def test_guided_truncation_warning_logged(tmp_path, caplog):
    """A config whose guided_train cap truncates on dense scenes must
    surface a WARNING in the training log (the reference keeps all passing
    anchors, so sustained truncation is a parity divergence)."""
    import dataclasses
    import logging

    from sassd_tpu.data import synthetic
    from sassd_tpu.data.kitti import KittiDataset

    root = tmp_path / "kitti"
    synthetic.write_synthetic_kitti(root, n_train=2, n_val=1, seed=0)
    c = tiny_config()
    cfg = dataclasses.replace(
        c,
        caps=dataclasses.replace(c.caps, guided_train=16),  # force drops
        train=dataclasses.replace(c.train, batch_size=2, log_interval=1,
                                  checkpoint_interval=10),
    )
    ds = KittiDataset(cfg, root / "training", root / "ImageSets" / "train.txt")
    logger = logging.getLogger("sassd_trunc_test")
    with caplog.at_level(logging.WARNING, logger="sassd_trunc_test"):
        loop.train_model(cfg, ds, work_dir=str(tmp_path / "w"),
                         total_epochs=1, resume=False, logger=logger)
    warnings = [r for r in caplog.records
                if "guided-anchor truncation" in r.getMessage()]
    assert len(warnings) == 1          # once per epoch, not per window
