"""PSWarp sampling vs torch grid_sample; 3-NN interpolation vs brute force."""
import numpy as np
import torch
import jax.numpy as jnp

from sassd_tpu.ops import interpolate, warp


def torch_reference_warp(image_hwk, xs, ys):
    """Transcription of ssd_rotate_head.py:400-414 (grid_sample path)."""
    k, n = xs.shape
    h, w, c = image_hwk.shape
    assert c == k
    img = torch.tensor(np.moveaxis(image_hwk, -1, 0)).unsqueeze(1)  # [K,1,H,W]
    sx = torch.tensor(xs).unsqueeze(2).unsqueeze(3)
    sy = torch.tensor(ys).unsqueeze(2).unsqueeze(3)
    samples = torch.cat([sx, sy], 3)
    samples[..., 0] = samples[..., 0] / (w - 1)
    samples[..., 1] = samples[..., 1] / (h - 1)
    samples = samples * 2 - 1
    out = torch.nn.functional.grid_sample(img, samples, align_corners=True)
    return out[:, 0, :, 0].numpy()                             # [K, N]


def test_bilinear_matches_grid_sample():
    rng = np.random.default_rng(0)
    h, w, k, n = 20, 30, 28, 50
    img = rng.normal(size=(h, w, k)).astype(np.float32)
    xs = rng.uniform(-3, w + 3, (k, n)).astype(np.float32)   # incl. outside
    ys = rng.uniform(-3, h + 3, (k, n)).astype(np.float32)
    ref = torch_reference_warp(img, xs, ys)
    got = np.asarray(warp.bilinear_sample_per_part(
        jnp.asarray(img), jnp.asarray(xs), jnp.asarray(ys)))
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_bilinear_packed_exact_parity():
    """The width-4 packed-corner gather must reproduce the reference
    formulation bit-exactly, including every clip/edge case (coordinates
    straddling -1/0, w-1/w, far out of range, integer-exact)."""
    rng = np.random.default_rng(3)
    h, w, k, n = 17, 23, 28, 400
    img = rng.normal(size=(h, w, k)).astype(np.float32)
    xs = rng.uniform(-4, w + 4, (k, n)).astype(np.float32)
    ys = rng.uniform(-4, h + 4, (k, n)).astype(np.float32)
    # force edge-straddling and integer-exact columns
    xs[:, :50] = rng.uniform(-1.0, 1.0, (k, 50))
    ys[:, :50] = rng.uniform(-1.0, 1.0, (k, 50))
    xs[:, 50:100] = rng.uniform(w - 2, w + 1, (k, 50))
    ys[:, 50:100] = rng.uniform(h - 2, h + 1, (k, 50))
    xs[:, 100:120] = np.round(xs[:, 100:120])
    ys[:, 100:120] = np.round(ys[:, 100:120])
    ref = np.asarray(warp.bilinear_sample_per_part(
        jnp.asarray(img), jnp.asarray(xs), jnp.asarray(ys)))
    got = np.asarray(warp.bilinear_sample_per_part_packed(
        jnp.asarray(img), jnp.asarray(xs), jnp.asarray(ys)))
    np.testing.assert_array_equal(got, ref)


def test_gen_sample_grid_formula():
    """Lattice points must match the reference generator (ssd_rotate_head.py
    :374-398) transcribed here in numpy."""
    rng = np.random.default_rng(1)
    n = 12
    boxes = np.zeros((n, 5), np.float32)
    boxes[:, :2] = rng.uniform(0, 60, (n, 2))
    boxes[:, 2:4] = rng.uniform(1.5, 4.5, (n, 2))
    boxes[:, 4] = rng.uniform(-np.pi, np.pi, n)
    wx, wy = 4, 7
    off = (0.0, 40.0)
    scale = 2.5

    xs, ys = warp.gen_sample_grid(jnp.asarray(boxes), (wx, wy), off, scale)
    xs, ys = np.asarray(xs), np.asarray(ys)
    assert xs.shape == (wx * wy, n)

    x, y, w, l, r = boxes.T
    xx = np.linspace(-0.5, 0.5, wx)[:, None, None] * w[None, None, :]  # [wx,1,n]
    yy = np.linspace(-0.5, 0.5, wy)[None, :, None] * l[None, None, :]
    c, s = np.cos(r), np.sin(r)
    gx = (xx * c + yy * s + x) + off[0]
    gy = (yy * c - xx * s + y) + off[1]
    np.testing.assert_allclose(xs, (gx * scale).reshape(wx * wy, n), atol=1e-4)
    np.testing.assert_allclose(ys, (gy * scale).reshape(wx * wy, n), atol=1e-4)


def test_three_nn_interpolate_oracle():
    rng = np.random.default_rng(2)
    n, m, c = 300, 200, 8
    unknown = rng.uniform(0, 10, (n, 3)).astype(np.float32)
    known = rng.uniform(0, 10, (m + 40, 3)).astype(np.float32)
    valid = np.arange(m + 40) < m
    feats = rng.normal(size=(m + 40, c)).astype(np.float32)

    got = np.asarray(interpolate.three_nn_interpolate(
        jnp.asarray(unknown), jnp.asarray(known), jnp.asarray(valid),
        jnp.asarray(feats), chunk=64))

    # brute-force oracle with the reference weighting (1/(d2+eps), cmn.py:175-189)
    d2 = ((unknown[:, None, :] - known[None, :m, :]) ** 2).sum(-1)
    idx = np.argsort(d2, axis=1)[:, :3]
    d3 = np.take_along_axis(d2, idx, axis=1)
    wgt = 1.0 / (d3 + 1e-8)
    wgt = wgt / wgt.sum(1, keepdims=True)
    ref = (feats[idx] * wgt[..., None]).sum(1)
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_interpolation_smooth_field():
    """Interpolating a linear field reproduces it (3-NN convexity check)."""
    rng = np.random.default_rng(3)
    known = rng.uniform(0, 10, (500, 3)).astype(np.float32)
    feats = (known @ np.array([[1.0], [2.0], [-0.5]], np.float32))
    unknown = rng.uniform(1, 9, (100, 3)).astype(np.float32)
    got = np.asarray(interpolate.three_nn_interpolate(
        jnp.asarray(unknown), jnp.asarray(known),
        jnp.ones(500, bool), jnp.asarray(feats)))
    ref = unknown @ np.array([[1.0], [2.0], [-0.5]], np.float32)
    # 3-NN of a dense cloud approximates a linear field coarsely
    assert np.abs(got - ref).mean() < 0.5


def test_neighborhood_interpolation_matches_exact():
    """Host-rulebook neighborhood 3-NN must agree with global 3-NN for
    centroid queries (their parent cell is active by construction)."""
    import jax
    from sassd_tpu.config import tiny_config
    from sassd_tpu.ops import native
    from sassd_tpu.ops import sparse as sp
    if not native.available():
        import pytest
        pytest.skip("native lib not built")
    cfg = tiny_config()
    rng = np.random.default_rng(0)
    # clustered actives (realistic surface-like data)
    pcr = np.asarray(cfg.voxel.point_cloud_range)
    pts = np.concatenate([
        rng.normal([2.0, 0.0, -1.5], 0.5, (400, 3)),
        rng.normal([4.5, 1.5, -1.8], 0.4, (400, 3))]).astype(np.float32)
    pts = np.concatenate([pts, rng.uniform(0, 1, (800, 1)).astype(np.float32)], 1)
    from sassd_tpu.ops.voxelize import voxelize_np
    v, c, n = voxelize_np(pts, cfg.voxel, pad=True)
    plans = native.build_plans_cpp(c, cfg.sparse_shape,
                                   (cfg.voxel.max_voxels,)
                                   + tuple(cfg.caps.level_caps[1:]))
    # level-1 centers/feats
    shape1 = sp.out_shape_stride2(cfg.sparse_shape)
    keys1 = sp.coords_to_keys(jnp.asarray(plans["coords1"]), shape1)
    coords1 = np.asarray(plans["coords1"])
    valid1 = coords1[:, 0] >= 0
    vs = np.asarray(cfg.voxel.voxel_size) * 2
    centers = (coords1[:, [2, 1, 0]] + 0.5) * vs + pcr[:3]
    centers[~valid1] = 0
    m1 = valid1.sum()
    feats = rng.normal(size=(len(coords1), 8)).astype(np.float32)
    feats[~valid1] = 0
    # queries: voxel centroids
    nums = n
    q = np.zeros((len(v), 3), np.float32)
    ok = nums > 0
    q[ok] = v[ok, :, :3].sum(1) / nums[ok][:, None]

    exact = np.asarray(interpolate.three_nn_interpolate(
        jnp.asarray(q), jnp.asarray(centers.astype(np.float32)),
        jnp.asarray(valid1), jnp.asarray(feats), chunk=128))
    nbhd = np.asarray(interpolate.neighborhood_interpolate(
        jnp.asarray(q), jnp.asarray(centers.astype(np.float32)),
        jnp.asarray(feats), jnp.asarray(plans["aux1"])))
    # agreement on valid queries (allow rare isolated-voxel divergences)
    diff = np.abs(exact[ok] - nbhd[ok]).max(axis=1)
    assert (diff < 1e-3).mean() > 0.97, (diff < 1e-3).mean()


def test_neighborhood_cells_matches_gathered():
    """Arithmetic candidate centers == gathered centers (same selections)."""
    from sassd_tpu.ops import native
    if not native.available():
        import pytest
        pytest.skip("native lib not built")
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from tiny_config import tiny_config
    from sassd_tpu.ops import sparse as sp
    from sassd_tpu.ops import interpolate as I

    cfg = tiny_config()
    rng = np.random.default_rng(21)
    d, h, w = cfg.sparse_shape
    n = 50
    lin = np.sort(rng.choice(d * h * w, n, replace=False))
    cap = cfg.voxel.max_voxels
    coords = np.full((cap, 3), -1, np.int32)
    coords[:n, 0] = lin // (h * w)
    coords[:n, 1] = (lin // w) % h
    coords[:n, 2] = lin % w
    plans = native.build_plans_cpp(coords, cfg.sparse_shape,
                                   cfg.caps.level_caps)
    vs0 = np.asarray(cfg.voxel.voxel_size, np.float32)
    pcr = np.asarray(cfg.voxel.point_cloud_range[:3], np.float32)
    for lvl in (1, 2):
        lvl_coords = plans[f"coords{lvl}"]
        m = lvl_coords.shape[0]
        feats = rng.normal(size=(m, 4)).astype(np.float32)
        vs = vs0 * (2 ** lvl)
        centers = ((lvl_coords[:, ::-1].astype(np.float32) + 0.5) * vs + pcr)
        # queries: jittered level-0 cell centers (stay inside their cell)
        q = ((coords[:, ::-1].astype(np.float32) + 0.5
              + rng.uniform(-0.4, 0.4, (cap, 3)).astype(np.float32))
             * vs0 + pcr)
        plan = jnp.asarray(plans[f"aux{lvl}"])
        a = np.asarray(I.neighborhood_interpolate(
            jnp.asarray(q), jnp.asarray(centers), jnp.asarray(feats), plan))
        b = np.asarray(I.neighborhood_interpolate_cells(
            jnp.asarray(q), jnp.asarray(coords), lvl, jnp.asarray(feats),
            plan, vs, pcr))
        np.testing.assert_allclose(b[:n], a[:n], atol=1e-5,
                                   err_msg=f"level {lvl}")
