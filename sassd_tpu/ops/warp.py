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
