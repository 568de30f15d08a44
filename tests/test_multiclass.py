"""Multi-class detector path (per-class anchors/assigners, class-major order)."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sassd_tpu.config import AnchorConfig, ModelConfig, tiny_config
from sassd_tpu.data.kitti import build_anchors
from sassd_tpu.data.synthetic import make_random_batch
from sassd_tpu.models import detector


@pytest.fixture(scope="module")
def setup():
    base = tiny_config()
    cfg = dataclasses.replace(
        base,
        model=dataclasses.replace(base.model, num_class=2),
        anchors={
            "Car": AnchorConfig(sizes=(1.6, 3.9, 1.56), strides=(0.8, 0.8, 1.0),
                                offsets=(0.4, -2.8, -1.0),
                                matched_threshold=0.6,
                                unmatched_threshold=0.45),
            "Pedestrian": AnchorConfig(sizes=(0.6, 0.8, 1.73),
                                       strides=(0.8, 0.8, 1.0),
                                       offsets=(0.4, -2.8, -1.0),
                                       matched_threshold=0.5,
                                       unmatched_threshold=0.35),
        })
    params, state = detector.detector_init(jax.random.PRNGKey(0), cfg)
    anchors = jnp.asarray(build_anchors(cfg)[0])
    batch = make_random_batch(cfg, np.random.default_rng(0), batch_size=2)
    # mix of class 1 and class 2 GTs
    batch["gt_classes"] = np.where(
        batch["gt_valid"],
        1 + (np.arange(batch["gt_classes"].shape[1]) % 2)[None, :], 0
    ).astype(np.int32)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    return cfg, params, state, anchors, batch


def test_anchor_count_doubles(setup):
    cfg, params, state, anchors, batch = setup
    h, w = cfg.bev_map_size
    assert anchors.shape == (2 * h * w * 2, 7)
    # class-major flatten: first half Car sizes, second half Pedestrian sizes
    a = np.asarray(anchors)
    half = a.shape[0] // 2
    assert np.allclose(a[:half, 3:6], [1.6, 3.9, 1.56])
    assert np.allclose(a[half:, 3:6], [0.6, 0.8, 1.73])


def test_multiclass_train_and_test(setup):
    cfg, params, state, anchors, batch = setup
    losses, _ = jax.jit(
        lambda p, s, b: detector.forward_train(p, s, b, anchors, cfg)
    )(params, state, batch)
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    dets = jax.jit(
        lambda p, s, b: detector.forward_test(p, s, b, anchors, cfg)
    )(params, state, batch)
    labels = np.asarray(dets["labels"])
    assert labels.min() >= 0 and labels.max() <= 1
    assert dets["boxes"].shape[-1] == 7


def test_pointnet_vfe_path():
    import dataclasses as dc
    base = tiny_config()
    cfg = dc.replace(base, model=dc.replace(base.model, vfe_type="pointnet"))
    params, state = detector.detector_init(jax.random.PRNGKey(0), cfg)
    assert "vfe" in params
    anchors = jnp.asarray(build_anchors(cfg)[0])
    batch = {k: jnp.asarray(v) for k, v in make_random_batch(
        cfg, np.random.default_rng(1)).items()}
    losses, new_state = detector.forward_train(params, state, batch,
                                               anchors, cfg)
    assert all(np.isfinite(float(v)) for v in losses.values())
    assert "vfe" in new_state
    dets = detector.forward_test(params, state, batch, anchors, cfg)
    assert np.all(np.isfinite(np.asarray(dets["boxes"])))
