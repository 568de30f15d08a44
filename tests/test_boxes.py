"""Unit tests for core box geometry against independent numpy oracles."""
import numpy as np
import jax.numpy as jnp

from sassd_tpu.core import boxes as B


def random_boxes(rng, n, center_range=10.0):
    out = np.zeros((n, 7), np.float32)
    out[:, :2] = rng.uniform(-center_range, center_range, (n, 2))
    out[:, 2] = rng.uniform(-3, 1, n)
    out[:, 3:6] = rng.uniform(0.5, 4.0, (n, 3))
    out[:, 6] = rng.uniform(-np.pi, np.pi, n)
    return out


def test_limit_period():
    v = jnp.array([0.1, np.pi + 0.1, -np.pi - 0.1, 3 * np.pi])
    out = np.asarray(B.limit_period(v, 0.5, np.pi))
    assert np.all(out >= -np.pi / 2 - 1e-6) and np.all(out < np.pi / 2 + 1e-6)
    np.testing.assert_allclose(np.sin(2 * out), np.sin(2 * np.asarray(v)), atol=1e-5)


def test_encode_decode_roundtrip():
    rng = np.random.default_rng(0)
    boxes = random_boxes(rng, 128)
    anchors = random_boxes(rng, 128)
    enc = B.second_box_encode(jnp.asarray(boxes), jnp.asarray(anchors))
    dec = np.asarray(B.second_box_decode(enc, jnp.asarray(anchors)))
    np.testing.assert_allclose(dec, boxes, rtol=1e-4, atol=1e-4)


def test_encode_matches_reference_formula():
    """Check one hand-computed case against ssd_rotate_head.py:15-51 math."""
    box = jnp.array([[11.0, -2.0, -1.4, 1.8, 4.2, 1.6, 0.3]])
    anchor = jnp.array([[10.0, -1.0, -1.78, 1.6, 3.9, 1.56, 0.0]])
    enc = np.asarray(B.second_box_encode(box, anchor))[0]
    diag = np.sqrt(3.9 ** 2 + 1.6 ** 2)
    np.testing.assert_allclose(enc[0], 1.0 / diag, rtol=1e-4)
    np.testing.assert_allclose(enc[1], -1.0 / diag, rtol=1e-4)
    # z compares box centers: (-1.4 + 0.8) - (-1.78 + 0.78) = 0.4, / ha
    np.testing.assert_allclose(enc[2], 0.4 / 1.56, rtol=1e-4)
    np.testing.assert_allclose(enc[3], np.log(1.8 / 1.6), rtol=1e-4)
    np.testing.assert_allclose(enc[4], np.log(4.2 / 3.9), rtol=1e-4)
    np.testing.assert_allclose(enc[5], np.log(1.6 / 1.56), rtol=1e-4)
    np.testing.assert_allclose(enc[6], 0.3, rtol=1e-4)


def test_nearest_bev_swaps_extents():
    b = jnp.array([
        [0.0, 0.0, 0.0, 2.0, 6.0, 1.0, 0.0],
        [0.0, 0.0, 0.0, 2.0, 6.0, 1.0, np.pi / 2],
    ])
    near = np.asarray(B.boxes3d_to_near_bev(b))
    np.testing.assert_allclose(near[0], [-1, -3, 1, 3], atol=1e-5)
    np.testing.assert_allclose(near[1], [-3, -1, 3, 1], atol=1e-5)


def test_iou_aligned_oracle():
    rng = np.random.default_rng(1)
    a = np.sort(rng.uniform(-5, 5, (40, 2, 2)), axis=1).reshape(40, 4)[:, [0, 2, 1, 3]]
    b = np.sort(rng.uniform(-5, 5, (30, 2, 2)), axis=1).reshape(30, 4)[:, [0, 2, 1, 3]]
    got = np.asarray(B.iou_aligned(jnp.asarray(a), jnp.asarray(b)))
    for i in range(5):
        for j in range(5):
            ix = max(0, min(a[i, 2], b[j, 2]) - max(a[i, 0], b[j, 0]))
            iy = max(0, min(a[i, 3], b[j, 3]) - max(a[i, 1], b[j, 1]))
            inter = ix * iy
            union = ((a[i, 2] - a[i, 0]) * (a[i, 3] - a[i, 1])
                     + (b[j, 2] - b[j, 0]) * (b[j, 3] - b[j, 1]) - inter)
            np.testing.assert_allclose(got[i, j], inter / union if union > 0 else 0,
                                       atol=1e-5)


def test_corners_bev_axis_aligned():
    b = jnp.array([[1.0, 2.0, 2.0, 4.0, 0.0]])
    c = np.asarray(B.corners_bev(b))[0]
    expected = {(2.0, 4.0), (0.0, 4.0), (0.0, 0.0), (2.0, 0.0)}
    got = {tuple(np.round(p, 5)) for p in c}
    assert got == expected


def test_corners_bev_rotation_area_preserved():
    rng = np.random.default_rng(2)
    b = random_boxes(rng, 16)
    c = np.asarray(B.corners_bev(jnp.asarray(b[:, [0, 1, 3, 4, 6]])))
    # shoelace area == w*l and centroid == center
    x, y = c[..., 0], c[..., 1]
    area = 0.5 * np.abs(np.sum(x * np.roll(y, -1, 1) - np.roll(x, -1, 1) * y, axis=1))
    np.testing.assert_allclose(area, b[:, 3] * b[:, 4], rtol=1e-4)
    np.testing.assert_allclose(c.mean(1), b[:, :2], atol=1e-4)


def test_points_in_boxes3d_oracle():
    rng = np.random.default_rng(3)
    boxes = random_boxes(rng, 8)
    pts = rng.uniform(-12, 12, (500, 3)).astype(np.float32)
    flags, label, offsets = B.points_in_boxes3d(jnp.asarray(pts), jnp.asarray(boxes))
    flags = np.asarray(flags)
    # oracle: inverse-transform each point into the box frame
    for j in range(8):
        cx, cy, zb, w, l, h, r = boxes[j]
        d = pts[:, :2] - [cx, cy]
        # reference rotation (points_op.cpp:100-101)
        lx = d[:, 0] * np.cos(r) - d[:, 1] * np.sin(r)
        ly = d[:, 0] * np.sin(r) + d[:, 1] * np.cos(r)
        ok = ((np.abs(lx) <= w / 2) & (np.abs(ly) <= l / 2)
              & (np.abs(pts[:, 2] - (zb + h / 2)) <= h / 2))
        np.testing.assert_array_equal(flags[:, j], ok)
    # offsets point from box center to the point, for contained points
    label = np.asarray(label)
    offsets = np.asarray(offsets)
    for i in np.where(label)[0][:20]:
        j = np.argmax(flags[i])
        center = boxes[j, :3] + [0, 0, boxes[j, 5] / 2]
        np.testing.assert_allclose(offsets[i], pts[i] - center, atol=1e-5)
    assert np.all(offsets[~label] == 0)


def test_camera_lidar_roundtrip():
    rng = np.random.default_rng(4)
    r_rect = np.eye(4, dtype=np.float32)
    # small rotation + translation velo->cam
    th = 0.05
    velo2cam = np.array([
        [0, -1, 0, 0.1],
        [0, 0, -1, -0.05],
        [1, 0, 0, 0.27],
        [0, 0, 0, 1]], np.float32)
    pts = rng.uniform(0, 50, (64, 3)).astype(np.float32)
    cam = B.lidar_to_camera_points(pts, r_rect, velo2cam)
    back = B.camera_to_lidar_points(cam, r_rect, velo2cam)
    np.testing.assert_allclose(np.asarray(back), pts, atol=1e-3)


def test_box_camera_to_lidar():
    r_rect = np.eye(4, dtype=np.float32)
    velo2cam = np.array([
        [0, -1, 0, 0],
        [0, 0, -1, 0],
        [1, 0, 0, 0],
        [0, 0, 0, 1]], np.float32)
    # camera box at (x=2 right, y=1 down, z=10 fwd), dims (w, l, h), ry=0.2
    cam = np.array([[2.0, 1.0, 10.0, 1.6, 3.9, 1.56, 0.2]], np.float32)
    lidar = B.box_camera_to_lidar(cam, r_rect, velo2cam)
    np.testing.assert_allclose(np.asarray(lidar[0, :3]), [10.0, -2.0, -1.0], atol=1e-4)
    np.testing.assert_allclose(np.asarray(lidar[0, 3:6]), [1.6, 3.9, 1.56], atol=1e-5)
    np.testing.assert_allclose(np.asarray(lidar[0, 6]), 0.2, atol=1e-5)


def test_bev_box_coder_roundtrip():
    rng = np.random.default_rng(5)
    boxes = random_boxes(rng, 32)
    anchors = random_boxes(rng, 32)
    enc = B.bev_box_encode(jnp.asarray(boxes), jnp.asarray(anchors))
    assert enc.shape == (32, 5)
    dec = np.asarray(B.bev_box_decode(enc, jnp.asarray(anchors)))
    np.testing.assert_allclose(dec, boxes[:, [0, 1, 3, 4, 6]], rtol=1e-3,
                               atol=1e-3)


def test_corner_box_coder_roundtrip():
    rng = np.random.default_rng(7)
    boxes = random_boxes(rng, 32)
    anchors = random_boxes(rng, 32)
    enc = B.corner_box_encode(jnp.asarray(boxes), jnp.asarray(anchors))
    assert enc.shape == (32, 24)
    dec = np.asarray(B.corner_box_decode(enc, jnp.asarray(anchors)))
    np.testing.assert_allclose(dec[:, :6], boxes[:, :6], rtol=1e-3, atol=1e-3)
    dyaw = np.arctan2(np.sin(dec[:, 6] - boxes[:, 6]),
                      np.cos(dec[:, 6] - boxes[:, 6]))
    np.testing.assert_allclose(dyaw, 0.0, atol=1e-3)


def test_decode_grad_finite_at_pathological_residuals():
    """Round-5 NaN regression (core/boxes.py SIZE_DECODE_CLIP): the head
    decodes EVERY anchor before guided selection, so one size logit > ~88
    used to make exp() infinite and the backward 0 * inf = NaN for the
    whole gradient even with ZERO cotangent on that anchor (froze the
    exact-aux A/B training run at peak LR). Decode gradients must stay
    finite — and the decode itself exact — for absurd residuals."""
    import jax
    anchors = jnp.asarray([[1.0, 2.0, -1.0, 1.6, 3.9, 1.56, 0.3],
                           [0.0, 0.0, -1.5, 0.6, 0.8, 1.73, 1.57]])
    enc = jnp.asarray([[0.1, -0.2, 0.05, 0.2, -0.1, 0.02, 0.1],
                       [0.0, 0.0, 0.0, 150.0, -200.0, 97.0, 0.0]])

    # zero cotangent on the pathological row (it is "unselected")
    cot = jnp.asarray([[1.0] * 7, [0.0] * 7])

    def f(e):
        return jnp.sum(B.second_box_decode(e, anchors) * cot)

    g = jax.grad(f)(enc)
    assert np.all(np.isfinite(np.asarray(g))), g
    dec = np.asarray(B.second_box_decode(enc, anchors))
    assert np.all(np.isfinite(dec[0])) and np.all(np.isfinite(dec[1]))
    # realistic residuals (row 0) are untouched by the clamp: exact roundtrip
    rt = np.asarray(B.second_box_encode(
        B.second_box_decode(enc, anchors), anchors))
    np.testing.assert_allclose(rt[0], np.asarray(enc)[0], rtol=1e-5,
                               atol=1e-5)
