"""Anchor grid tests (vs anchor3d_generator.py semantics)."""
import numpy as np

from sassd_tpu.core import anchors as A


def test_stride_anchor_shape_and_values():
    gen = A.AnchorGeneratorStride()
    out = gen([1, 200, 176])
    assert out.shape == (1, 200, 176, 1, 2, 7)
    flat = out.reshape(-1, 7)
    assert flat.shape[0] == 200 * 176 * 2
    # first anchor at the offset corner
    np.testing.assert_allclose(flat[0], [0.2, -39.8, -1.78, 1.6, 3.9, 1.56, 0.0],
                               atol=1e-6)
    np.testing.assert_allclose(flat[1][6], np.pi / 2, atol=1e-6)
    # x advances fastest (within a z,y row), stride 0.4
    np.testing.assert_allclose(flat[2][0] - flat[0][0], 0.4, atol=1e-5)
    # y stride between rows
    row = 176 * 2
    np.testing.assert_allclose(flat[row][1] - flat[0][1], 0.4, atol=1e-5)
    # centers cover the configured range
    assert np.isclose(flat[:, 0].max(), 0.2 + 175 * 0.4)
    assert np.isclose(flat[:, 1].max(), -39.8 + 199 * 0.4)


def test_range_anchor_linspace():
    gen = A.AnchorGeneratorRange(anchor_ranges=(0, -40, -1.78, 70.4, 40, -1.78))
    out = gen([1, 4, 8])
    assert out.shape == (1, 4, 8, 1, 2, 7)
    xs = np.unique(out[..., 0])
    np.testing.assert_allclose(xs, np.linspace(0, 70.4, 8), atol=1e-5)


def test_num_anchors_per_loc():
    gen = A.AnchorGeneratorStride(sizes=(1.6, 3.9, 1.56, 0.6, 0.8, 1.73))
    assert gen.num_anchors_per_localization == 4
