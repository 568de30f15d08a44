"""Pallas rotated-IoU kernel parity vs the XLA/numpy implementation."""
import numpy as np
import jax.numpy as jnp

from sassd_tpu.core import riou
from sassd_tpu.ops.pallas.riou_kernel import rotate_overlap_pallas


def random_bev(rng, n):
    b = np.zeros((n, 5), np.float32)
    b[:, :2] = rng.uniform(-8, 8, (n, 2))
    b[:, 2:4] = rng.uniform(0.5, 5.0, (n, 2))
    b[:, 4] = rng.uniform(-np.pi, np.pi, n)
    return b


def test_pallas_matches_reference_impl():
    rng = np.random.default_rng(0)
    a = random_bev(rng, 37)     # deliberately not tile-aligned
    b = random_bev(rng, 131)
    ref = riou.rotate_overlap_bev_np(a, b, use_native=False)
    got = np.asarray(rotate_overlap_pallas(jnp.asarray(a), jnp.asarray(b), 2))
    np.testing.assert_allclose(got, ref, atol=1e-3)


def test_pallas_iou_criteria():
    rng = np.random.default_rng(1)
    a = random_bev(rng, 16)
    b = random_bev(rng, 16)
    inter = riou.rotate_overlap_bev_np(a, b, use_native=False)
    a1 = (a[:, 2] * a[:, 3])[:, None]
    a2 = (b[:, 2] * b[:, 3])[None, :]
    got_iou = np.asarray(rotate_overlap_pallas(jnp.asarray(a), jnp.asarray(b), -1))
    np.testing.assert_allclose(got_iou, inter / np.maximum(a1 + a2 - inter, 1e-7),
                               atol=1e-4)
    got0 = np.asarray(rotate_overlap_pallas(jnp.asarray(a), jnp.asarray(b), 0))
    np.testing.assert_allclose(got0, inter / np.maximum(a1, 1e-7), atol=1e-4)


def test_pallas_zero_padding_safe():
    rng = np.random.default_rng(2)
    a = np.concatenate([random_bev(rng, 4), np.zeros((4, 5), np.float32)])
    b = random_bev(rng, 8)
    got = np.asarray(rotate_overlap_pallas(jnp.asarray(a), jnp.asarray(b), 2))
    assert np.all(got[4:] == 0.0)


def test_pallas_degenerate_pairs():
    """Identical, touching, contained, and disjoint boxes — the cases where
    the Green's-theorem boundary decomposition needs its direction-aware
    tie-break (coincident arcs counted net-once)."""
    boxes = np.array([
        [0.0, 0.0, 2.0, 4.0, 0.0],        # 0: base
        [0.0, 0.0, 2.0, 4.0, 0.0],        # 1: identical
        [2.0, 0.0, 2.0, 4.0, 0.0],        # 2: touching (shares edge x=1)
        [0.0, 0.0, 1.0, 2.0, 0.0],        # 3: contained (shares no edge)
        [10.0, 10.0, 2.0, 4.0, 0.0],      # 4: disjoint
        [0.5, 0.0, 2.0, 4.0, 0.0],        # 5: overlap, collinear edges
        [0.0, 0.0, 2.0, 4.0, np.pi / 2],  # 6: rotated 90 deg, same center
        [0.0, 0.0, 2.0, 4.0, np.pi],      # 7: rotated 180 = identical shape
    ], np.float32)
    got = np.asarray(rotate_overlap_pallas(
        jnp.asarray(boxes), jnp.asarray(boxes), 2))
    expect = riou.rotate_overlap_bev_np(boxes, boxes, use_native=False)
    np.testing.assert_allclose(got, expect, atol=5e-3)
    # the headline degenerates, asserted explicitly
    assert abs(got[0, 1] - 8.0) < 1e-2        # identical -> full area
    assert abs(got[0, 2]) < 1e-2              # touching -> 0
    assert abs(got[0, 3] - 2.0) < 1e-2        # contained -> area of inner
    assert got[0, 4] == 0.0                   # disjoint
    assert abs(got[0, 7] - 8.0) < 1e-2        # 180-deg flip == identical
    assert abs(got[0, 6] - 4.0) < 1e-2        # plus-sign overlap 2x2
