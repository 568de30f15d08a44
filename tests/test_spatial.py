"""Spatial BEV sharding: sharded inference must equal unsharded."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sassd_tpu.data.kitti import build_anchors
from sassd_tpu.data.synthetic import make_random_batch
from sassd_tpu.models import detector
from sassd_tpu.parallel import mesh as mesh_lib
from sassd_tpu.parallel import spatial
from tiny_config import tiny_config


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_spatial_sharded_inference_matches():
    cfg = tiny_config()
    mesh = mesh_lib.make_mesh(8, spatial=4)      # 2 data x 4 spatial
    params, state = detector.detector_init(jax.random.PRNGKey(0), cfg)
    anchors = jnp.asarray(build_anchors(cfg)[0])
    batch = {k: jnp.asarray(v) for k, v in make_random_batch(
        cfg, np.random.default_rng(0), batch_size=2).items()}

    ref = detector.forward_test(params, state, batch, anchors, cfg)

    step = spatial.make_spatial_test_step(cfg, anchors, mesh)
    params_r = mesh_lib.replicate(mesh, params)
    state_r = mesh_lib.replicate(mesh, state)
    batch_r = mesh_lib.replicate(mesh, batch)
    got = step(params_r, state_r, batch_r)

    np.testing.assert_allclose(np.asarray(got["boxes"]),
                               np.asarray(ref["boxes"]), atol=2e-3)
    np.testing.assert_array_equal(np.asarray(got["valid"]),
                                  np.asarray(ref["valid"]))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_spatial_train_step_runs():
    from sassd_tpu.train import optim
    cfg = tiny_config()
    mesh = mesh_lib.make_mesh(8, spatial=4)
    params, state = detector.detector_init(jax.random.PRNGKey(0), cfg)
    anchors = jnp.asarray(build_anchors(cfg)[0])
    tx = optim.make_optimizer(cfg.train, 100)
    opt_state = tx.init(params)
    batch = {k: jnp.asarray(v) for k, v in make_random_batch(
        cfg, np.random.default_rng(1), batch_size=2).items()}
    step = spatial.make_spatial_train_step(cfg, anchors, tx, mesh)
    p, s, o = (mesh_lib.replicate(mesh, t) for t in (params, state, opt_state))
    db = mesh_lib.shard_batch(mesh, batch)
    p, s, o, metrics = step(p, s, o, db)
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["nonfinite_skips"]) == 0.0


def _tall_config():
    """Tiny config stretched in y (H=256) so S=2 bands with halo=64 carry a
    real proper subset of the grid (band covers 128+128 = 256 one-sided, but
    each band's [lo, hi) window spans only 192 of the 256 y cells)."""
    import dataclasses
    from sassd_tpu.config import VoxelConfig
    cfg = tiny_config()
    return dataclasses.replace(
        cfg,
        voxel=VoxelConfig(voxel_size=(0.1, 0.1, 0.5),
                          point_cloud_range=(0.0, -12.8, -2.5, 6.4, 12.8, 1.5),
                          max_num_points=5, max_voxels=1024),
        # caps sized so NEITHER path truncates (a truncating global run
        # legitimately differs from per-band caps — bands truncate later).
        # NOTE: isolated random points EXPAND under the stride-2 downsample
        # (up to 8 parent cells each), so the downstream caps must be ~4x
        # the voxel count here, unlike surface-structured real scans.
        caps=dataclasses.replace(cfg.caps,
                                 level_caps=(1024, 4096, 4096, 4096)),
    )


def test_banded_sparse_loss_equals_replicated():
    """Sparse-stage banded sharding (parallel/sparse_spatial.py): the banded
    forward's losses must equal the replicated forward's — owned-masked BN,
    halo recompute, sharded canvas assembly and per-band aux included."""
    from sassd_tpu.parallel import sparse_spatial as ss
    cfg = _tall_config()
    params, state = detector.detector_init(jax.random.PRNGKey(0), cfg)
    anchors = jnp.asarray(build_anchors(cfg)[0])
    batch = {k: jnp.asarray(v) for k, v in make_random_batch(
        cfg, np.random.default_rng(3), batch_size=2, n_points=900).items()
        if not k.startswith("plan_")}

    ref_losses, ref_state = detector.forward_train(
        params, state, batch, anchors, cfg)

    spec = ss.make_band_spec(cfg, s=2)
    assert spec.band_h == 128 and spec.halo == 64
    got_losses, got_state = ss.forward_train_banded(
        params, state, batch, anchors, cfg, spec)

    assert float(got_losses.pop("band_overflow")) == 0.0
    assert set(got_losses) == set(ref_losses)
    for k in ref_losses:
        np.testing.assert_allclose(float(got_losses[k]),
                                   float(ref_losses[k]), rtol=2e-4,
                                   err_msg=k)
    # BN batch statistics must match too (halo cells counted once)
    def cmp(a, bb):
        np.testing.assert_allclose(np.asarray(bb), np.asarray(a),
                                   rtol=2e-3, atol=1e-5)
    jax.tree_util.tree_map(cmp, ref_state["vxnet"], got_state["vxnet"])


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_banded_train_step_runs_on_mesh():
    """make_banded_train_step executes under a data x spatial mesh with the
    non-finite guard metrics present."""
    from sassd_tpu.parallel import sparse_spatial as ss
    from sassd_tpu.train import optim
    cfg = _tall_config()
    mesh = mesh_lib.make_mesh(8, spatial=2)      # 4 data x 2 spatial
    spec = ss.make_band_spec(cfg, s=2)
    params, state = detector.detector_init(jax.random.PRNGKey(0), cfg)
    anchors = jnp.asarray(build_anchors(cfg)[0])
    tx = optim.make_optimizer(cfg.train, 100)
    opt_state = tx.init(params)
    batch = {k: jnp.asarray(v) for k, v in make_random_batch(
        cfg, np.random.default_rng(4), batch_size=4, n_points=600).items()
        if not k.startswith("plan_")}
    step = ss.make_banded_train_step(cfg, anchors, tx, mesh, spec)
    p, s, o = (mesh_lib.replicate(mesh, t) for t in (params, state, opt_state))
    db = mesh_lib.shard_batch(mesh, batch)
    p, s, o, metrics = step(p, s, o, db)
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["nonfinite_skips"]) == 0.0


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_spatial_train_step_guards_nonfinite():
    """The non-finite-update guard must fire under the spatial mesh too
    (VERDICT r3 item 7: the spatial step previously applied updates
    unconditionally)."""
    from sassd_tpu.train import optim
    cfg = tiny_config()
    mesh = mesh_lib.make_mesh(8, spatial=4)
    params, state = detector.detector_init(jax.random.PRNGKey(0), cfg)
    anchors = jnp.asarray(build_anchors(cfg)[0])
    tx = optim.make_optimizer(cfg.train, 100)
    opt_state = tx.init(params)
    batch = {k: jnp.asarray(v) for k, v in make_random_batch(
        cfg, np.random.default_rng(2), batch_size=2).items()}
    # poison one voxel feature -> non-finite loss/grads
    bad = np.array(batch["voxels"])
    bad[0, 0, 0, 3] = np.nan
    batch["voxels"] = jnp.asarray(bad)
    step = spatial.make_spatial_train_step(cfg, anchors, tx, mesh)
    p0 = jax.tree_util.tree_map(np.asarray, params)
    p, s, o = (mesh_lib.replicate(mesh, t) for t in (params, state, opt_state))
    db = mesh_lib.shard_batch(mesh, batch)
    p, s, o, metrics = step(p, s, o, db)
    assert float(metrics["nonfinite_skips"]) == 1.0
    # params unchanged: the update was skipped wholesale
    for a, b in zip(jax.tree_util.tree_leaves(p0),
                    jax.tree_util.tree_leaves(jax.device_get(p))):
        np.testing.assert_array_equal(a, b)


def test_banded_inference_matches_replicated():
    """forward_test_banded (round 5): banded detections == replicated
    detections — the spine is banded, the heads are identical."""
    from sassd_tpu.parallel import sparse_spatial as ss
    cfg = _tall_config()
    params, state = detector.detector_init(jax.random.PRNGKey(0), cfg)
    anchors = jnp.asarray(build_anchors(cfg)[0])
    batch = {k: jnp.asarray(v) for k, v in make_random_batch(
        cfg, np.random.default_rng(5), batch_size=2, n_points=900).items()
        if not k.startswith("plan_")}

    ref = detector.forward_test(params, state, batch, anchors, cfg)
    spec = ss.make_band_spec(cfg, s=2)
    got = ss.forward_test_banded(params, state, batch, anchors, cfg, spec)

    np.testing.assert_array_equal(np.asarray(got["valid"]),
                                  np.asarray(ref["valid"]))
    v = np.asarray(ref["valid"])
    np.testing.assert_allclose(np.asarray(got["boxes"])[v],
                               np.asarray(ref["boxes"])[v], atol=2e-3)
    np.testing.assert_allclose(np.asarray(got["scores"])[v],
                               np.asarray(ref["scores"])[v], atol=2e-3)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_banded_test_step_on_mesh_matches_replicated():
    """The jitted banded test step on a data x spatial mesh == replicated."""
    from sassd_tpu.parallel import sparse_spatial as ss
    cfg = _tall_config()
    mesh = mesh_lib.make_mesh(8, spatial=2)
    spec = ss.make_band_spec(cfg, s=2)
    params, state = detector.detector_init(jax.random.PRNGKey(0), cfg)
    anchors = jnp.asarray(build_anchors(cfg)[0])
    batch = {k: jnp.asarray(v) for k, v in make_random_batch(
        cfg, np.random.default_rng(6), batch_size=2, n_points=900).items()
        if not k.startswith("plan_")}
    ref = detector.forward_test(params, state, batch, anchors, cfg)
    step = ss.make_banded_test_step(cfg, anchors, mesh, spec)
    p, s, b = (mesh_lib.replicate(mesh, t) for t in (params, state, batch))
    got = step(p, s, b)
    np.testing.assert_array_equal(np.asarray(got["valid"]),
                                  np.asarray(ref["valid"]))
    v = np.asarray(ref["valid"])
    np.testing.assert_allclose(np.asarray(got["boxes"])[v],
                               np.asarray(ref["boxes"])[v], atol=2e-3)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_strategy_dispatch_selects_banded_step():
    """ParallelConfig.strategy='banded' reaches the banded step through the
    generic train-loop dispatcher (the user-facing config path)."""
    import dataclasses
    from sassd_tpu.config import ParallelConfig
    from sassd_tpu.train import optim
    from sassd_tpu.train.loop import make_strategy_train_step
    cfg = dataclasses.replace(
        _tall_config(), parallel=ParallelConfig(strategy="banded", spatial=2))
    mesh = mesh_lib.make_mesh(8, spatial=2)
    params, state = detector.detector_init(jax.random.PRNGKey(0), cfg)
    anchors = jnp.asarray(build_anchors(cfg)[0])
    tx = optim.make_optimizer(cfg.train, 100)
    opt_state = tx.init(params)
    batch = {k: jnp.asarray(v) for k, v in make_random_batch(
        cfg, np.random.default_rng(7), batch_size=4, n_points=600).items()
        if not k.startswith("plan_")}
    step = make_strategy_train_step(cfg, anchors, tx, mesh)
    p, s, o = (mesh_lib.replicate(mesh, t) for t in (params, state, opt_state))
    db = mesh_lib.shard_batch(mesh, batch)
    p, s, o, metrics = step(p, s, o, db)
    assert "band_overflow" in metrics
    assert np.isfinite(float(metrics["loss"]))

    # wrong mesh for the strategy must be loud, not silently data-parallel
    bad_mesh = mesh_lib.make_mesh(8, spatial=4)
    with pytest.raises(ValueError, match="spatial"):
        make_strategy_train_step(cfg, anchors, tx, bad_mesh)
