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
