"""Rotated IoU / NMS tests against Monte-Carlo and brute-force oracles."""
import numpy as np
import jax.numpy as jnp

from sassd_tpu.core import riou


def random_bev(rng, n, extent=8.0):
    b = np.zeros((n, 5), np.float32)
    b[:, :2] = rng.uniform(-extent, extent, (n, 2))
    b[:, 2:4] = rng.uniform(0.5, 5.0, (n, 2))
    b[:, 4] = rng.uniform(-np.pi, np.pi, n)
    return b


def mc_intersection(a, b, n=200_000, seed=0):
    """Monte-Carlo rotated-rectangle intersection area (independent oracle)."""
    rng = np.random.default_rng(seed)
    lo = np.minimum(a[:2] - np.hypot(a[2], a[3]), b[:2] - np.hypot(b[2], b[3]))
    hi = np.maximum(a[:2] + np.hypot(a[2], a[3]), b[:2] + np.hypot(b[2], b[3]))
    pts = rng.uniform(lo, hi, (n, 2))

    def inside(box):
        # clockwise yaw convention (points_op.cpp:100-101)
        d = pts - box[:2]
        c, s = np.cos(box[4]), np.sin(box[4])
        lx = d[:, 0] * c - d[:, 1] * s
        ly = d[:, 0] * s + d[:, 1] * c
        return (np.abs(lx) <= box[2] / 2) & (np.abs(ly) <= box[3] / 2)

    frac = np.mean(inside(a) & inside(b))
    return frac * np.prod(hi - lo)


def test_identical_boxes():
    b = jnp.array([[1.0, 2.0, 2.0, 4.0, 0.7]])
    iou = np.asarray(riou.rotate_iou_bev(b, b))
    np.testing.assert_allclose(iou, [[1.0]], atol=1e-5)


def test_disjoint_boxes():
    a = jnp.array([[0.0, 0.0, 2.0, 2.0, 0.3]])
    b = jnp.array([[10.0, 10.0, 2.0, 2.0, -0.8]])
    np.testing.assert_allclose(np.asarray(riou.rotate_iou_bev(a, b)), [[0.0]], atol=1e-7)


def test_axis_aligned_matches_analytic():
    a = jnp.array([[0.0, 0.0, 4.0, 2.0, 0.0]])
    b = jnp.array([[1.0, 0.5, 4.0, 2.0, 0.0]])
    # overlap: x in [-1, 2] => 3 ; y in [-0.5, 1] => 1.5 ; inter = 4.5
    iou = np.asarray(riou.rotate_iou_bev(a, b))[0, 0]
    np.testing.assert_allclose(iou, 4.5 / (8 + 8 - 4.5), atol=1e-5)


def test_contained_box():
    a = jnp.array([[0.0, 0.0, 10.0, 10.0, 0.2]])
    b = jnp.array([[0.0, 0.0, 2.0, 2.0, 1.0]])  # fully inside a
    inter = np.asarray(riou.rotate_overlap_bev(a, b))[0, 0]
    np.testing.assert_allclose(inter, 4.0, atol=1e-5)


def test_45deg_cross():
    # two identical squares, one rotated 45 deg: intersection is a regular octagon
    a = jnp.array([[0.0, 0.0, 2.0, 2.0, 0.0]])
    b = jnp.array([[0.0, 0.0, 2.0, 2.0, np.pi / 4]])
    inter = np.asarray(riou.rotate_overlap_bev(a, b))[0, 0]
    np.testing.assert_allclose(inter, 8 * (np.sqrt(2) - 1), atol=1e-4)


def test_random_vs_monte_carlo():
    rng = np.random.default_rng(5)
    a = random_bev(rng, 12)
    b = random_bev(rng, 12)
    got = np.asarray(riou.rotate_overlap_bev(jnp.asarray(a), jnp.asarray(b)))
    for i in range(12):
        mc = mc_intersection(a[i], b[i], seed=i)
        np.testing.assert_allclose(got[i, i], mc, atol=0.12)


def test_numpy_backend_matches_jnp():
    rng = np.random.default_rng(6)
    a = random_bev(rng, 20)
    b = random_bev(rng, 15)
    got_j = np.asarray(riou.rotate_overlap_bev(jnp.asarray(a), jnp.asarray(b)))
    got_n = riou.rotate_overlap_bev_np(a, b)
    np.testing.assert_allclose(got_j, got_n, atol=1e-4)


def test_iou3d_height_overlap():
    a = jnp.array([[0.0, 0.0, 0.0, 2.0, 2.0, 2.0, 0.0]])
    b = jnp.array([[0.0, 0.0, 1.0, 2.0, 2.0, 2.0, 0.0]])  # shifted up 1m
    # bev inter 4, height inter 1 -> inter 4 ; union = 8 + 8 - 4
    np.testing.assert_allclose(np.asarray(riou.rotate_iou_3d(a, b)), [[4 / 12]], atol=1e-5)


def test_iou_eval_criteria():
    a = np.array([[0.0, 0.0, 2.0, 2.0, 0.0]])
    b = np.array([[1.0, 0.0, 2.0, 2.0, 0.0]])  # inter = 2, areas 4, 4
    np.testing.assert_allclose(riou.rotate_iou_eval_np(a, b, -1), [[2 / 6]], atol=1e-5)
    np.testing.assert_allclose(riou.rotate_iou_eval_np(a, b, 0), [[0.5]], atol=1e-5)
    np.testing.assert_allclose(riou.rotate_iou_eval_np(a, b, 1), [[0.5]], atol=1e-5)


def naive_nms(boxes, scores, thr):
    """O(N^2) greedy NMS oracle in numpy."""
    order = np.argsort(-scores)
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i] or not np.isfinite(scores[i]):
            continue
        keep.append(i)
        ious = riou.rotate_iou_eval_np(boxes[i: i + 1], boxes, -1)[0]
        for j in order:
            if j != i and ious[j] > thr:
                suppressed[j] = True
    return sorted(keep)


def test_nms_matches_naive():
    rng = np.random.default_rng(7)
    boxes = random_bev(rng, 64, extent=6.0)
    scores = rng.uniform(0, 1, 64).astype(np.float32)
    order, keep = riou.rotate_nms(jnp.asarray(boxes), jnp.asarray(scores), 0.3)
    got = sorted(np.asarray(order)[np.asarray(keep)].tolist())
    assert got == naive_nms(boxes, scores, 0.3)


def test_nms_respects_valid_mask():
    boxes = jnp.asarray(random_bev(np.random.default_rng(8), 16))
    scores = jnp.ones(16)
    valid = jnp.arange(16) < 4
    order, keep = riou.rotate_nms(boxes, scores, 0.99, valid=valid)
    kept = np.asarray(order)[np.asarray(keep)]
    assert np.all(kept < 4)


def test_blocked_nms_matches_full():
    """The early-exit blocked NMS must agree with the one-matrix fixpoint on
    the first max_det kept boxes, across densities and thresholds."""
    import jax.numpy as jnp
    rng = np.random.default_rng(12)
    for n, max_det, thr in [(700, 20, 0.1), (700, 300, 0.3), (513, 5, 0.5),
                            (1000, 100, 0.1)]:
        boxes = np.concatenate([
            rng.uniform(0, 40, (n, 2)), rng.uniform(1.5, 4.5, (n, 2)),
            rng.uniform(-np.pi, np.pi, (n, 1))], 1).astype(np.float32)
        scores = rng.uniform(0, 1, n).astype(np.float32)
        valid = rng.random(n) < 0.8
        order_f, keep_f = riou.rotate_nms(
            jnp.asarray(boxes), jnp.asarray(scores), thr,
            valid=jnp.asarray(valid))
        order_b, keep_b = riou.rotate_nms(
            jnp.asarray(boxes), jnp.asarray(scores), thr,
            valid=jnp.asarray(valid), max_det=max_det, block_size=256)
        np.testing.assert_array_equal(np.asarray(order_f),
                                      np.asarray(order_b))
        kf = np.asarray(order_f)[np.asarray(keep_f)][:max_det]
        kb = np.asarray(order_b)[np.asarray(keep_b)][:max_det]
        np.testing.assert_array_equal(kf, kb, err_msg=f"n={n} md={max_det}")
        # blocked keep flags are a prefix-faithful subset of full greedy
        assert np.all(~np.asarray(keep_b) | np.asarray(keep_f))
