"""Device-resident serving path (sassd_tpu/serve.py): in-graph voxelize +
anchors-mask + device sparse plans must reproduce the host pipeline.

Reference behavior covered: the CPU-worker leg of tools/test.py
(/root/reference/mmdet/datasets/kitti.py:265-354 — voxelize + anchors-mask)
fused into the device program.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sassd_tpu import serve
from sassd_tpu.data import augment as aug
from sassd_tpu.data.kitti import build_anchors, build_host_plans
from sassd_tpu.models import backbone, detector
from sassd_tpu.ops import sparse as sp
from sassd_tpu.ops.voxelize import voxelize_np
from tiny_config import tiny_config


def scene_points(cfg, rng, n=420):
    """Clustered in-range points (blob scene) + a few out-of-range strays.

    Clusters keep every level under its static cap: uniform scatter makes
    each voxel isolated and inflates downsampled active sets ~8x (PERF.md),
    and under cap overflow the truncation ORDER legitimately differs
    between the builders (host voxelizer keeps first-occurrence voxels,
    the device one the lowest keys; the sorted/dense downsamplers likewise
    keep different survivors) — caps are sized to make overflow impossible
    on real data, so the tests stay in that regime."""
    pcr = np.asarray(cfg.voxel.point_cloud_range)
    centers = np.stack([
        rng.uniform(pcr[0] + 0.5, 0.5 * (pcr[0] + pcr[3]), 4),
        rng.uniform(pcr[1] * 0.6, pcr[4] * 0.6, 4),
        rng.uniform(-1.8, -1.2, 4)], axis=1)
    k = n // 4
    parts = [centers[i] + rng.normal(0, 0.35, (k, 3)) for i in range(4)]
    pts = np.zeros((4 * k, 4), np.float32)
    pts[:, :3] = np.concatenate(parts)
    pts[:, 3] = rng.uniform(0, 1, 4 * k)
    # a few out-of-range points (must be cropped identically by both paths)
    pts[-5:, 0] = pcr[3] + rng.uniform(0.1, 2.0, 5)
    return pts


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    anchors, anchors_bv = build_anchors(cfg)
    params, state = detector.detector_init(jax.random.PRNGKey(0), cfg)
    return cfg, anchors, anchors_bv, params, state


def test_anchors_mask_device_matches_host(setup):
    cfg, anchors, anchors_bv, _, _ = setup
    rng = np.random.default_rng(0)
    pts = scene_points(cfg, rng)
    _, coords, _ = voxelize_np(pts, cfg.voxel, pad=True)
    pcr = np.asarray(cfg.voxel.point_cloud_range)
    host = aug.anchors_mask_from_coords(
        coords, anchors_bv, cfg.voxel.voxel_size, pcr,
        cfg.voxel.grid_size, cfg.data.anchor_area_threshold)
    corners = serve.anchor_corner_indices(
        anchors_bv, cfg.voxel.voxel_size, pcr, cfg.voxel.grid_size)
    gh, gw = int(cfg.voxel.grid_size[1]), int(cfg.voxel.grid_size[0])
    dev = serve.anchors_mask_jax(
        jnp.asarray(coords), jnp.asarray(corners), (gh, gw),
        cfg.data.anchor_area_threshold)
    np.testing.assert_array_equal(np.asarray(dev), host)
    assert host.any() and not host.all()     # non-degenerate case


def test_batch_from_points_matches_host_batch(setup):
    """In-graph voxelize+mask == the loader's voxelize_np+mask, exactly."""
    cfg, anchors, anchors_bv, _, _ = setup
    rng = np.random.default_rng(1)
    raw = scene_points(cfg, rng)
    # host path
    hv, hc, hn = voxelize_np(raw, cfg.voxel, pad=True)
    pcr = np.asarray(cfg.voxel.point_cloud_range)
    hm = aug.anchors_mask_from_coords(
        hc, anchors_bv, cfg.voxel.voxel_size, pcr,
        cfg.voxel.grid_size, cfg.data.anchor_area_threshold)
    # device path
    pts, n = serve.prepare_points(raw, cfg)
    corners = jnp.asarray(serve.anchor_corner_indices(
        anchors_bv, cfg.voxel.voxel_size, pcr, cfg.voxel.grid_size))
    batch = jax.jit(lambda p, c: serve.batch_from_points(
        p, c, corners, cfg))(jnp.asarray(pts[None]),
                             jnp.asarray(np.asarray([n])))
    np.testing.assert_array_equal(np.asarray(batch["coords"][0]), hc)
    np.testing.assert_array_equal(np.asarray(batch["num_points"][0]), hn)
    np.testing.assert_allclose(np.asarray(batch["voxels"][0]), hv, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(batch["anchors_mask"][0]), hm)


def test_sorted_device_levels_match_scatter_max_path(setup):
    """Sorted sort+unique active sets + triple gathers == the sort-free
    scatter-max path, as key->feature maps."""
    cfg, *_ = setup
    rng = np.random.default_rng(2)
    pts = scene_points(cfg, rng)
    _, coords, _ = voxelize_np(pts, cfg.voxel, pad=True)
    keys0 = sp.coords_to_keys(jnp.asarray(coords), cfg.sparse_shape)[None]
    feats = rng.normal(size=(1, coords.shape[0], 4)).astype(np.float32)
    feats[0, np.asarray(keys0[0]) == sp.INVALID_KEY] = 0
    params, state = backbone.vxnet_init(jax.random.PRNGKey(1), 4)

    def run(sorted_dev):
        return backbone.vxnet_apply(
            params, state, keys0, jnp.asarray(feats),
            sparse_shape=cfg.sparse_shape, level_caps=cfg.caps.level_caps,
            train=False, dense_index=True, dense_tail=False,
            sorted_device_levels=sorted_dev, triple_gather=True)

    ks, fs, _, _, _ = run(True)
    ku, fu, _, _, _ = run(False)
    # sorted path emits ascending keys
    k_s = np.asarray(ks)[0]
    real = k_s[k_s != sp.INVALID_KEY]
    assert np.all(np.diff(real.astype(np.int64)) > 0)

    def as_map(keys, feats):
        keys, feats = np.asarray(keys)[0], np.asarray(feats)[0]
        return {int(k): feats[i] for i, k in enumerate(keys)
                if k != sp.INVALID_KEY}

    m_s, m_u = as_map(ks, fs), as_map(ku, fu)
    assert m_s.keys() == m_u.keys()
    for k in m_s:
        np.testing.assert_allclose(m_s[k], m_u[k], atol=3e-4)


def test_serving_step_matches_host_pipeline(setup):
    """Full jitted serving graph == host-pipeline forward_test detections."""
    cfg, anchors, anchors_bv, params, state = setup
    rng = np.random.default_rng(3)
    raw = scene_points(cfg, rng)

    # host pipeline (voxelize + mask + plans in the loader)
    hv, hc, hn = voxelize_np(raw, cfg.voxel, pad=True)
    pcr = np.asarray(cfg.voxel.point_cloud_range)
    hm = aug.anchors_mask_from_coords(
        hc, anchors_bv, cfg.voxel.voxel_size, pcr,
        cfg.voxel.grid_size, cfg.data.anchor_area_threshold)
    batch = {"voxels": hv[None], "num_points": hn[None], "coords": hc[None],
             "anchors_mask": hm[None]}
    for k, v in build_host_plans(cfg, hc, train=False).items():
        batch[k] = v[None]
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    ref = jax.jit(lambda p, s, b: detector.forward_test(
        p, s, b, jnp.asarray(anchors), cfg))(params, state, batch)

    # device-resident serving
    step = serve.make_serving_step(cfg, anchors, anchors_bv)
    pts, n = serve.prepare_points(raw, cfg)
    got = step(params, state, {"points": jnp.asarray(pts[None]),
                               "n_points": jnp.asarray(np.asarray([n]))})

    rv, gv = np.asarray(ref["valid"][0]), np.asarray(got["valid"][0])
    np.testing.assert_array_equal(rv, gv)
    np.testing.assert_array_equal(np.asarray(ref["labels"][0])[rv],
                                  np.asarray(got["labels"][0])[gv])
    np.testing.assert_allclose(np.asarray(ref["boxes"][0])[rv],
                               np.asarray(got["boxes"][0])[gv],
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(ref["scores"][0])[rv],
                               np.asarray(got["scores"][0])[gv], atol=1e-3)


def test_points_view_sample_layout(setup):
    cfg, *_ = setup

    class FakeDS:
        def __len__(self):
            return 2

        def load_points(self, idx):
            rng = np.random.default_rng(idx)
            return scene_points(cfg, rng), {"sample_idx": idx}

    view = serve.PointsView(FakeDS(), cfg)
    s = view[0]
    assert s["points"].shape == (cfg.caps.max_points_per_scan, 4)
    assert s["points"].dtype == np.float32
    assert int(s["n_points"]) > 0
    assert s["meta"]["sample_idx"] == 0


def test_separable_anchors_mask_matches_gather():
    """anchors_mask_jax_separable (round 5: gather-free corner lookups) ==
    anchors_mask_jax on both single- and multi-class anchor grids."""
    import jax.numpy as jnp
    from sassd_tpu import serve
    from sassd_tpu.config import multi_config
    from sassd_tpu.data.kitti import build_anchors
    from tiny_config import tiny_config

    for cfg in (tiny_config(), multi_config()):
        _, anchors_bv = build_anchors(cfg)
        corners = jnp.asarray(serve.anchor_corner_indices(
            anchors_bv, cfg.voxel.voxel_size, cfg.voxel.point_cloud_range,
            cfg.voxel.grid_size))
        sep = serve.separable_corners(anchors_bv, cfg)
        assert sep is not None
        rng = np.random.default_rng(0)
        d, h, w = cfg.sparse_shape
        n = 200
        coords = np.full((512, 3), -1, np.int32)
        coords[:n, 0] = rng.integers(0, d, n)
        coords[:n, 1] = rng.integers(0, h, n)
        coords[:n, 2] = rng.integers(0, w, n)
        gh, gw = int(cfg.voxel.grid_size[1]), int(cfg.voxel.grid_size[0])
        ref = serve.anchors_mask_jax(jnp.asarray(coords), corners, (gh, gw),
                                     cfg.data.anchor_area_threshold)
        got = serve.anchors_mask_jax_separable(
            jnp.asarray(coords), sep, cfg.model.num_anchor_per_loc,
            (gh, gw), cfg.data.anchor_area_threshold)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
        assert int(np.asarray(ref).sum()) > 0


def test_persistent_plan_carry_matches_per_scan(setup):
    """make_serving_step(persistent_plans=True): detections over a SEQUENCE
    of scans (the carry path re-used scan-to-scan, delta-clearing the
    previous scan's index-map rows) == the per-scan rebuild path."""
    from sassd_tpu.data.kitti import build_anchors
    from tiny_config import tiny_config

    cfg = tiny_config()
    anchors_np, anchors_bv = build_anchors(cfg)
    params, state = detector.detector_init(jax.random.PRNGKey(0), cfg)
    step = serve.make_serving_step(cfg, anchors_np, anchors_bv)
    step_p = serve.make_serving_step(cfg, anchors_np, anchors_bv,
                                     persistent_plans=True)
    carry = serve.init_plan_carry(cfg)
    rng = np.random.default_rng(11)
    pcr = cfg.voxel.point_cloud_range
    for i in range(3):
        n_pts = int(rng.integers(300, 900))
        pts = np.zeros((n_pts, 4), np.float32)
        pts[:, 0] = rng.uniform(pcr[0], pcr[3], n_pts)
        pts[:, 1] = rng.uniform(pcr[1], pcr[4], n_pts)
        pts[:, 2] = rng.uniform(pcr[2], pcr[5], n_pts)
        p, n = serve.prepare_points(pts, cfg)
        batch = dict(points=jnp.asarray(p[None]),
                     n_points=jnp.asarray(np.array([n])))
        ref = step(params, state, batch)
        got, carry = step_p(params, state, carry, batch)
        np.testing.assert_array_equal(np.asarray(ref["valid"]),
                                      np.asarray(got["valid"]))
        v = np.asarray(ref["valid"])
        np.testing.assert_allclose(np.asarray(ref["boxes"])[v],
                                   np.asarray(got["boxes"])[v],
                                   rtol=1e-6, atol=1e-6)
