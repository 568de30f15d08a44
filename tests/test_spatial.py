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
