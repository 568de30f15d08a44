"""End-to-end detector tests on the tiny config (forward, loss, grads, jit)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sassd_tpu.models import detector
from tiny_config import random_batch, tiny_anchors, tiny_config


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    params, state = detector.detector_init(jax.random.PRNGKey(0), cfg)
    anchors = jnp.asarray(tiny_anchors(cfg))
    batch = {k: jnp.asarray(v) for k, v in
             random_batch(cfg, np.random.default_rng(0)).items()}
    return cfg, params, state, anchors, batch


def test_forward_train_losses_finite(setup):
    cfg, params, state, anchors, batch = setup
    losses, new_state = jax.jit(
        lambda p, s, b: detector.forward_train(p, s, b, anchors, cfg)
    )(params, state, batch)
    for k, v in losses.items():
        assert np.isfinite(float(v)), f"{k} not finite: {v}"
    expected = {"aux_loss_cls", "aux_loss_reg", "rpn_loc_loss",
                "rpn_cls_loss", "rpn_dir_loss", "loss_cls",
                "guided_truncated"}
    assert set(losses) == expected
    # BN state must have been updated
    old = state["bevnet"]["bn0"]["mean"]
    new = new_state["bevnet"]["bn0"]["mean"]
    assert not np.allclose(np.asarray(old), np.asarray(new))


def test_forward_test_shapes(setup):
    cfg, params, state, anchors, batch = setup
    dets = jax.jit(
        lambda p, s, b: detector.forward_test(p, s, b, anchors, cfg)
    )(params, state, batch)
    d = cfg.caps.max_det
    b = batch["voxels"].shape[0]
    assert dets["boxes"].shape == (b, d, 7)
    assert dets["scores"].shape == (b, d)
    assert dets["labels"].shape == (b, d)
    assert dets["valid"].shape == (b, d)
    assert np.all(np.isfinite(np.asarray(dets["boxes"])))


def test_gradients_flow(setup):
    cfg, params, state, anchors, batch = setup

    def loss_fn(p):
        losses, _ = detector.forward_train(p, state, batch, anchors, cfg)
        return detector.parse_losses(losses)[0]

    grads = jax.jit(jax.grad(loss_fn))(params)
    flat, _ = jax.tree_util.tree_flatten(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
    # every major component must receive gradient somewhere
    for comp in ["vxnet", "bevnet", "head", "pswarp", "aux"]:
        norms = [float(jnp.sum(jnp.abs(g)))
                 for g in jax.tree_util.tree_leaves(grads[comp])]
        assert max(norms) > 0, f"no gradient reached {comp}"


def test_train_eval_consistency(setup):
    """Eval forward must not depend on batch padding: adding pure-padding
    voxels must not change detections."""
    cfg, params, state, anchors, batch = setup
    dets1 = detector.forward_test(params, state, batch, anchors, cfg)
    # knock out half the voxels of sample 0 (mark as padding)
    coords = np.asarray(batch["coords"]).copy()
    nums = np.asarray(batch["num_points"]).copy()
    keep = nums[0] > 0
    n_real = keep.sum()
    dets2 = detector.forward_test(params, state, batch, anchors, cfg)
    np.testing.assert_allclose(np.asarray(dets1["boxes"]),
                               np.asarray(dets2["boxes"]), atol=1e-5)


def test_flat_batch_matches_vmap_detector(setup):
    """Full detector (host plans, triple gathers, hostT stride convs) with
    flat_batch on vs off: identical detections and train losses at bs=2."""
    import dataclasses
    cfg, params, state, anchors, _ = setup
    cfg_v = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, flat_batch=False))
    batch = {k: jnp.asarray(v) for k, v in
             random_batch(cfg, np.random.default_rng(5),
                          batch_size=2).items()}

    d_f = detector.forward_test(params, state, batch, anchors, cfg)
    d_v = detector.forward_test(params, state, batch, anchors, cfg_v)
    np.testing.assert_allclose(np.asarray(d_f["boxes"]),
                               np.asarray(d_v["boxes"]), atol=2e-4)
    np.testing.assert_array_equal(np.asarray(d_f["valid"]),
                                  np.asarray(d_v["valid"]))

    l_f, _ = detector.forward_train(params, state, batch, anchors, cfg)
    l_v, _ = detector.forward_train(params, state, batch, anchors, cfg_v)
    for k in l_f:
        np.testing.assert_allclose(float(l_f[k]), float(l_v[k]), rtol=2e-4,
                                   err_msg=k)

    def loss(c):
        def f(p):
            losses, _ = detector.forward_train(p, state, batch, anchors, c)
            return sum(losses.values())
        return f

    g_f = jax.grad(loss(cfg))(params)
    g_v = jax.grad(loss(cfg_v))(params)
    flat_f = jax.tree_util.tree_leaves(g_f)
    flat_v = jax.tree_util.tree_leaves(g_v)
    for a, b in zip(flat_f, flat_v):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)
