"""Part-sensitive warping primitives: rotated sample grids + bilinear gather.

Replaces torch `grid_sample` as used by PSWarpHead
(/root/reference/mmdet/models/single_stage_heads/ssd_rotate_head.py:374-414):
each box gets a window_size[0] x window_size[1] lattice of sample points in
its rotated frame, mapped to BEV feature-map pixel coordinates, and part k of
the part-sensitive score map is bilinearly sampled at grid point k. Zero
padding outside the map, align_corners=True semantics (pixel coordinates are
used directly).
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def gen_sample_grid(boxes: jnp.ndarray,
                    window_size: Tuple[int, int] = (4, 7),
                    grid_offsets: Tuple[float, float] = (0.0, 40.0),
                    spatial_scale: float = 2.5):
    """Per-box rotated sampling lattices (ssd_rotate_head.py:374-398).

    Args:
      boxes: [N, 5] (x, y, w, l, yaw) BEV boxes in metric lidar coords.
    Returns:
      (xs, ys): each [K, N] pixel coordinates, K = prod(window_size); the
      lattice is ordered local-x-major then local-y (reference .view(win, -1)
      of an [N, wx, wy] tensor).
    """
    n = boxes.shape[0]
    wx, wy = window_size
    x, y, w, l, r = (boxes[:, i] for i in range(5))
    xx = jnp.linspace(-0.5, 0.5, wx)[None, :, None] * w[:, None, None]  # [N,wx,1]
    yy = jnp.linspace(-0.5, 0.5, wy)[None, None, :] * l[:, None, None]  # [N,1,wy]
    c = jnp.cos(r)[:, None, None]
    s = jnp.sin(r)[:, None, None]
    gx = xx * c + yy * s + x[:, None, None]
    gy = yy * c - xx * s + y[:, None, None]
    gx = (gx + grid_offsets[0]) * spatial_scale
    gy = (gy + grid_offsets[1]) * spatial_scale
    return (gx.reshape(n, wx * wy).T, gy.reshape(n, wx * wy).T)


def bilinear_sample_per_part(image: jnp.ndarray, xs: jnp.ndarray,
                             ys: jnp.ndarray) -> jnp.ndarray:
    """Sample part k of `image` at (xs[k], ys[k]) with bilinear interpolation.

    Args:
      image: [H, W, K] part-sensitive score map (NHWC slice, K parts).
      xs, ys: [K, N] pixel coordinates (x indexes W, y indexes H).
    Returns:
      [K, N] sampled values; zero contribution outside the map
      (torch grid_sample padding_mode='zeros', align_corners=True).
    """
    h, w, k = image.shape
    part = jnp.arange(k)[:, None]                             # [K, 1]
    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    tx = xs - x0
    ty = ys - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def tap(yi, xi, wgt):
        ok = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        v = image[jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1), part]
        return jnp.where(ok, v, 0.0) * wgt

    return (tap(y0i, x0i, (1 - tx) * (1 - ty))
            + tap(y0i, x0i + 1, tx * (1 - ty))
            + tap(y0i + 1, x0i, (1 - tx) * ty)
            + tap(y0i + 1, x0i + 1, tx * ty))


def bilinear_sample_per_part_packed(image: jnp.ndarray, xs: jnp.ndarray,
                                    ys: jnp.ndarray) -> jnp.ndarray:
    """`bilinear_sample_per_part` with the 4 corner reads in ONE gather.

    XLA's TPU gather cost is per-ROW and row-width-independent, so the 4
    single-element corner gathers of the reference formulation dominate
    PSWarp at full candidate budgets (4 x K x N rows). Here a corner
    tensor R[H*W, K, 2, 2] = image[y+dy, x+dx, k] (built with two shifted
    zero-padded copies, pure elementwise) lets one width-4 gather at the
    clipped base corner fetch the whole 2x2 neighborhood — 4x fewer rows.

    Clip alignment: the base is (clip(y0, 0, h-2), clip(x0, 0, w-2)); when
    the true corner lies one step left/above the clipped base (x0 = -1 /
    y0 = -1) the in-range tap lives one slot lower — remapped with the
    elementwise slot select below. Whenever |offset| > 1 every affected
    tap is out of range and masked to zero, so the clipped slot value is
    never observed. Exact same taps, weights, and zero-padding semantics
    as the reference formulation (tests/test_warp_interp.py parity).
    """
    h, w, k = image.shape
    part = jnp.arange(k)[:, None]                             # [K, 1]
    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    tx = xs - x0
    ty = ys - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    flat = image.reshape(h * w, k)
    zrow = jnp.zeros((1, k), image.dtype)
    sx = jnp.concatenate([flat[1:], zrow], 0)                 # x + 1
    zw = jnp.zeros((w, k), image.dtype)
    sy = jnp.concatenate([flat[w:], zw], 0)                   # y + 1
    sxy = jnp.concatenate([flat[w + 1:], zrow, zw], 0)        # y + 1, x + 1
    # R[p, c, dy, dx] = image[y(p) + dy, x(p) + dx, c]
    R = jnp.stack([jnp.stack([flat, sx], -1),
                   jnp.stack([sy, sxy], -1)], -2)             # [H*W, K, 2, 2]

    bx = jnp.clip(x0i, 0, w - 2)
    by = jnp.clip(y0i, 0, h - 2)
    ox = x0i - bx
    oy = y0i - by
    G = R[by * w + bx, part]                                  # [K, N, 2, 2]

    def slot(dy, dx):
        """Corner (y0+dy, x0+dx) from the gathered 2x2 window."""
        sy_ = jnp.clip(dy + oy, 0, 1)
        sx_ = jnp.clip(dx + ox, 0, 1)
        r = jnp.where((sy_ == 0)[..., None], G[..., 0, :], G[..., 1, :])
        return jnp.where(sx_ == 0, r[..., 0], r[..., 1])

    def tap(dy, dx, wgt):
        yi, xi = y0i + dy, x0i + dx
        ok = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        return jnp.where(ok, slot(dy, dx), 0.0) * wgt

    return (tap(0, 0, (1 - tx) * (1 - ty))
            + tap(0, 1, tx * (1 - ty))
            + tap(1, 0, (1 - tx) * ty)
            + tap(1, 1, tx * ty))
