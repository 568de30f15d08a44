"""Round-4 device-plan features: windowed dense lookups, the on-device
transpose stride plan (gather-based backward), and on-device aux ring plans.

Oracles: the legacy binary-search/per-tap-gather plan builders, jax autodiff
through the plain (scatter-add) stride conv, the C++ host rulebook, and the
host-plans end-to-end training gradient.
"""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sassd_tpu.models import backbone, detector
from sassd_tpu.ops import native
from sassd_tpu.ops import sparse as sp
from tiny_config import tiny_config


def random_keys(rng, shape_zyx, n, cap, edge_bias=True):
    """Sorted active keys, biased to include grid-boundary cells (the
    windowed lookup's x-wrap hazard lives at x=0 / x=w-1)."""
    d, h, w = shape_zyx
    total = d * h * w
    lin = rng.choice(total, n, replace=False)
    if edge_bias:
        # force some boundary-x cells
        z = rng.integers(0, d, 8)
        y = rng.integers(0, h, 8)
        x = np.concatenate([np.zeros(4, np.int64), np.full(4, w - 1)])
        lin = np.unique(np.concatenate([lin, (z * h + y) * w + x]))[:n]
    keys = np.full((cap,), sp.INVALID_KEY, np.int32)
    keys[:len(lin)] = np.sort(lin).astype(np.int32)
    return jnp.asarray(keys)


def test_window_subm_plan_matches_legacy():
    shape = (6, 10, 9)   # odd W exercises the x=w-1 edge
    rng = np.random.default_rng(0)
    keys = random_keys(rng, shape, 50, 64)
    imap = sp.build_index_map(keys, shape)
    win = sp.build_subm_plan(keys, shape, index_map=imap)
    legacy = sp.build_subm_plan(keys, shape)     # binary search
    np.testing.assert_array_equal(np.asarray(win.found),
                                  np.asarray(legacy.found))
    wi, li = np.asarray(win.idx), np.asarray(legacy.idx)
    f = np.asarray(legacy.found)
    np.testing.assert_array_equal(wi[f], li[f])


def test_window_stride_plan_matches_legacy():
    shape = (6, 10, 9)
    rng = np.random.default_rng(1)
    keys = random_keys(rng, shape, 50, 64)
    out_keys = sp.downsample_keys(keys, shape, 48)
    imap = sp.build_index_map(keys, shape)
    win = sp.build_stride_plan(keys, out_keys, shape, index_map=imap)
    legacy = sp.build_stride_plan(keys, out_keys, shape)
    np.testing.assert_array_equal(np.asarray(win.found),
                                  np.asarray(legacy.found))
    f = np.asarray(legacy.found)
    np.testing.assert_array_equal(np.asarray(win.idx)[f],
                                  np.asarray(legacy.idx)[f])


def test_device_strideT_backward_matches_autodiff():
    """stride_conv_hostT with a DEVICE-built transpose plan == jax autodiff
    through the plain gather-GEMM stride conv, for d_feats and d_weight."""
    shape = (6, 10, 8)
    rng = np.random.default_rng(2)
    keys = random_keys(rng, shape, 60, 64)
    out_keys = sp.downsample_keys(keys, shape, 48)
    imap = sp.build_index_map(keys, shape)
    plan = sp.build_stride_plan(keys, out_keys, shape, index_map=imap)
    out_shape = sp.out_shape_stride2(shape)
    omap = sp.build_index_map(out_keys, out_shape)
    planT = sp.build_stride_plan_T(keys, shape, omap)

    feats = jnp.asarray(rng.normal(size=(64, 4)).astype(np.float32))
    feats = feats * (keys != sp.INVALID_KEY)[:, None]
    weight = jnp.asarray(rng.normal(size=(27, 4, 5)).astype(np.float32))
    cot = jnp.asarray(rng.normal(size=(48, 5)).astype(np.float32))

    def loss_plain(f, w):
        y = sp.subm_conv(f, w, plan, symmetric=False)
        return jnp.sum(y * cot)

    def loss_T(f, w):
        y = sp.stride_conv_hostT(jnp.float32, False, False, f, w,
                                 plan.idx, plan.found, planT.idx, planT.found)
        return jnp.sum(y * cot)

    gf0, gw0 = jax.grad(loss_plain, argnums=(0, 1))(feats, weight)
    gf1, gw1 = jax.grad(loss_T, argnums=(0, 1))(feats, weight)
    np.testing.assert_allclose(np.asarray(gf0), np.asarray(gf1),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw0), np.asarray(gw1),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.skipif(not native.available(), reason="native lib not built")
def test_device_aux_plan_matches_host():
    """Device-built aux ring plans == the C++ rulebook's, as key maps."""
    cfg = tiny_config()
    rng = np.random.default_rng(3)
    d, h, w = cfg.sparse_shape
    n = 40
    lin = np.sort(rng.choice(d * h * w, n, replace=False))
    cap = cfg.voxel.max_voxels
    coords = np.full((cap, 3), -1, np.int32)
    coords[:n, 0] = lin // (h * w)
    coords[:n, 1] = (lin // w) % h
    coords[:n, 2] = lin % w
    plans = native.build_plans_cpp(coords, cfg.sparse_shape,
                                   cfg.caps.level_caps, train=True)

    keys0 = sp.coords_to_keys(jnp.asarray(coords), cfg.sparse_shape)
    cell0 = jnp.asarray(coords)
    keys, shape = keys0, cfg.sparse_shape
    for lvl in (1, 2, 3):
        keys = sp.downsample_keys(keys, shape, cfg.caps.level_caps[lvl])
        shape = sp.out_shape_stride2(shape)
        imap = sp.build_index_map(keys, shape)
        dev = np.asarray(sp.build_aux_plan(cell0, lvl, imap, shape))
        host = plans[f"aux{lvl}"]
        # compare as KEYS (row spaces may order differently)
        dev_k = np.where(dev >= 0, np.asarray(keys)[np.maximum(dev, 0)], -1)
        hk = np.asarray(sp.coords_to_keys(
            jnp.asarray(plans[f"coords{lvl}"]), shape))
        host_k = np.where(host >= 0, hk[np.maximum(host, 0)], -1)
        np.testing.assert_array_equal(dev_k[:, :n], host_k[:, :n])


@pytest.mark.skipif(not native.available(), reason="native lib not built")
def test_train_gradients_device_plans_match_host_plans():
    """End-to-end: grad of the total train loss under DEVICE plans (windowed
    lookups + device strideT + device aux ring plans) == under HOST plans."""
    cfg = tiny_config()
    from sassd_tpu.data.synthetic import make_random_batch
    from sassd_tpu.data.kitti import build_anchors

    rng = np.random.default_rng(4)
    batch = {k: jnp.asarray(v) for k, v in make_random_batch(
        cfg, rng, batch_size=1, n_points=400).items()}
    anchors = jnp.asarray(build_anchors(cfg)[0])
    params, state = detector.detector_init(jax.random.PRNGKey(0), cfg)

    host_batch = batch
    dev_batch = {k: v for k, v in batch.items()
                 if not k.startswith("plan_")}

    def total(p, b):
        losses, _ = detector.forward_train(p, state, b, anchors, cfg)
        return detector.parse_losses(losses)[0]

    lh = float(total(params, host_batch))
    ld = float(total(params, dev_batch))
    np.testing.assert_allclose(ld, lh, rtol=2e-4)
    gh = jax.grad(total)(params, host_batch)
    gd = jax.grad(total)(params, dev_batch)
    flat_h = jax.tree_util.tree_leaves(gh)
    flat_d = jax.tree_util.tree_leaves(gd)
    for a, b in zip(flat_h, flat_d):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=2e-4)


def test_sorted_lookup_plans_match_dense():
    """Round-5 sorted-window plan resolution (lookup_sorted3 — no dense
    index map) must produce IDENTICAL plans to the dense-map path for
    subm, stride, transpose-stride, and aux builders."""
    shape = (6, 10, 9)
    rng = np.random.default_rng(5)
    keys = random_keys(rng, shape, 50, 64)
    imap = sp.build_index_map(keys, shape)

    subm_d = sp.build_subm_plan(keys, shape, index_map=imap)
    subm_s = sp.build_subm_plan(keys, shape, sorted_lookup=True)
    np.testing.assert_array_equal(np.asarray(subm_d.found),
                                  np.asarray(subm_s.found))
    f = np.asarray(subm_d.found)
    np.testing.assert_array_equal(np.asarray(subm_d.idx)[f],
                                  np.asarray(subm_s.idx)[f])

    out_keys = sp.downsample_keys(keys, shape, 48)
    st_d = sp.build_stride_plan(keys, out_keys, shape, index_map=imap)
    st_s = sp.build_stride_plan(keys, out_keys, shape, sorted_lookup=True)
    np.testing.assert_array_equal(np.asarray(st_d.found),
                                  np.asarray(st_s.found))
    f = np.asarray(st_d.found)
    np.testing.assert_array_equal(np.asarray(st_d.idx)[f],
                                  np.asarray(st_s.idx)[f])

    out_shape = sp.out_shape_stride2(shape)
    omap = sp.build_index_map(out_keys, out_shape)
    t_d = sp.build_stride_plan_T(keys, shape, omap)
    t_s = sp.build_stride_plan_T(keys, shape, out_sorted_keys=out_keys)
    np.testing.assert_array_equal(np.asarray(t_d.found),
                                  np.asarray(t_s.found))
    f = np.asarray(t_d.found)
    np.testing.assert_array_equal(np.asarray(t_d.idx)[f],
                                  np.asarray(t_s.idx)[f])

    cell0 = sp.keys_to_coords(keys, shape)
    aux_d = np.asarray(sp.build_aux_plan(cell0, 1, omap, out_shape))
    aux_s = np.asarray(sp.build_aux_plan(cell0, 1, None, out_shape,
                                         level_sorted_keys=out_keys))
    np.testing.assert_array_equal(aux_d, aux_s)


def test_forward_test_sorted_plans_match_dense():
    """End-to-end inference detections: plan_lookup='sorted' == 'dense'."""
    cfg = tiny_config()
    from sassd_tpu.data.synthetic import make_random_batch
    from sassd_tpu.data.kitti import build_anchors

    rng = np.random.default_rng(6)
    batch = {k: jnp.asarray(v) for k, v in make_random_batch(
        cfg, rng, batch_size=1, n_points=400).items()
        if not k.startswith("plan_")}
    anchors = jnp.asarray(build_anchors(cfg)[0])
    params, state = detector.detector_init(jax.random.PRNGKey(0), cfg)

    cfg_s = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, plan_lookup="sorted"))
    cfg_d = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, plan_lookup="dense"))
    det_s = detector.forward_test(params, state, batch, anchors, cfg_s)
    det_d = detector.forward_test(params, state, batch, anchors, cfg_d)
    np.testing.assert_array_equal(np.asarray(det_s["valid"]),
                                  np.asarray(det_d["valid"]))
    v = np.asarray(det_d["valid"])
    np.testing.assert_allclose(np.asarray(det_s["boxes"])[v],
                               np.asarray(det_d["boxes"])[v],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(det_s["scores"])[v],
                               np.asarray(det_d["scores"])[v],
                               rtol=1e-5, atol=1e-5)


def test_downsample_with_map_matches_sort_path():
    """downsample_keys_with_map == downsample_keys + build_index_map
    (keys AND map), including cap truncation and y_limit_out."""
    rng = np.random.default_rng(7)
    shape = (6, 20, 17)
    total = 6 * 20 * 17
    for trial in range(4):
        n = int(rng.integers(10, 60))
        lin = np.sort(rng.choice(total, n, replace=False)).astype(np.int32)
        keys = np.full((64,), sp.INVALID_KEY, np.int32)
        keys[:n] = lin
        keys = jnp.asarray(keys)
        for cap in (8, 48, 96):
            ref = sp.downsample_keys(keys, shape, cap)
            ref_map = sp.build_index_map(ref, sp.out_shape_stride2(shape))
            got, got_map = sp.downsample_keys_with_map(keys, shape, cap)
            np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
            np.testing.assert_array_equal(np.asarray(ref_map),
                                          np.asarray(got_map))
        ref = sp.downsample_keys(keys, shape, 48, y_limit_out=7)
        got, _ = sp.downsample_keys_with_map(keys, shape, 48, y_limit_out=7)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_direct_window_table_matches_map_stack():
    """build_window_table (one patch scatter from sorted keys, round 5) ==
    the map+3-shift-stack table, and lookup_table3 == lookup_dense3 on
    in-range AND out-of-range window starts."""
    rng = np.random.default_rng(11)
    shape = (4, 13, 17)
    total = 4 * 13 * 17
    for trial in range(6):
        n = int(rng.integers(1, total - 1))
        keys = random_keys(rng, shape, n, n + int(rng.integers(0, 5)))
        m = sp.build_index_map(keys, shape, keys_sorted=True)
        pad = jnp.full((2,), -1, jnp.int32)
        p = jnp.concatenate([pad[:1], m, pad])
        ref = jnp.stack([p[:-2], p[1:-1], p[2:]], axis=-1)   # [total+1, 3]
        wt = sp.build_window_table(keys, shape)
        np.testing.assert_array_equal(np.asarray(wt.tab[1:total + 2]),
                                      np.asarray(ref))
        starts = jnp.asarray(
            rng.integers(-(13 * 17) - 5, total + 5, size=400), jnp.int32)
        r0, f0 = sp.lookup_dense3(m, starts)
        r1, f1 = sp.lookup_table3(wt, starts)
        np.testing.assert_array_equal(np.asarray(r0), np.asarray(r1))
        np.testing.assert_array_equal(np.asarray(f0), np.asarray(f1))


def test_plans_with_direct_tables_match_dense_maps():
    """Every plan family (subm, stride, strideT, aux) resolved through a
    WindowTable == the same plan resolved through the dense index map."""
    rng = np.random.default_rng(12)
    shape = (6, 10, 9)
    keys = random_keys(rng, shape, 40, 48)
    m = sp.build_index_map(keys, shape, keys_sorted=True)
    wt = sp.build_window_table(keys, shape)
    a = sp.build_subm_plan(keys, shape, index_map=m)
    b = sp.build_subm_plan(keys, shape, index_map=wt)
    np.testing.assert_array_equal(np.asarray(a.found), np.asarray(b.found))
    np.testing.assert_array_equal(np.asarray(a.idx * a.found),
                                  np.asarray(b.idx * b.found))
    out = sp.downsample_keys(keys, shape, 32)
    a = sp.build_stride_plan(keys, out, shape, index_map=m)
    b = sp.build_stride_plan(keys, out, shape, index_map=wt)
    np.testing.assert_array_equal(np.asarray(a.found), np.asarray(b.found))
    np.testing.assert_array_equal(np.asarray(a.idx * a.found),
                                  np.asarray(b.idx * b.found))
    oshape = sp.out_shape_stride2(shape)
    om = sp.build_index_map(out, oshape, keys_sorted=True)
    owt = sp.build_window_table(out, oshape)
    a = sp.build_stride_plan_T(keys, shape, om)
    b = sp.build_stride_plan_T(keys, shape, owt)
    np.testing.assert_array_equal(np.asarray(a.found), np.asarray(b.found))
    np.testing.assert_array_equal(np.asarray(a.idx * a.found),
                                  np.asarray(b.idx * b.found))
    cell0 = sp.keys_to_coords(keys, shape)
    a = sp.build_aux_plan(cell0, 1, om, oshape, level_rows_cap=32)
    b = sp.build_aux_plan(cell0, 1, owt, oshape)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
