"""Pallas TPU kernel: pairwise rotated-rectangle intersection areas.

The XLA-composed Sutherland-Hodgman implementation in core/riou.py moves its
8-slot vertex buffers through HBM on every step (gathers + one-hot einsums):
~430 ms for a 512x512 matrix. This kernel keeps the whole clip pipeline in
VMEM/registers: the pair grid is tiled [TILE_A, TILE_B], every per-pair
quantity is one [TILE_A, TILE_B] vector, and all slot indexing is unrolled at
trace time (static python loops over the <=8 polygon slots), so the only HBM
traffic is reading the two box lists and writing the result tile.

Semantics identical to core/riou.py `_pair_area_*` (clockwise yaw; CCW-wound
corners; intersection area of two rotated rectangles).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_A = 8
TILE_B = 128
_MAXV = 8


def _corners(x, y, w, l, r):
    """Corner lists ([4 of (a, b)]) for center-format boxes, clockwise yaw."""
    c = jnp.cos(r)
    s = jnp.sin(r)
    out = []
    for sx, sy in ((0.5, 0.5), (-0.5, 0.5), (-0.5, -0.5), (0.5, -0.5)):
        lx = sx * w
        ly = sy * l
        out.append((lx * c + ly * s + x, -lx * s + ly * c + y))
    return out


def _riou_kernel(a_ref, b_ref, o_ref, *, criterion: int):
    # boxes_a tile: [TILE_A, 5]; boxes_b tile: [TILE_B, 5]
    ax = a_ref[:, 0][:, None]
    ay = a_ref[:, 1][:, None]
    aw = a_ref[:, 2][:, None]
    al = a_ref[:, 3][:, None]
    ar = a_ref[:, 4][:, None]
    bx = b_ref[:, 0][None, :]
    by = b_ref[:, 1][None, :]
    bw = b_ref[:, 2][None, :]
    bl = b_ref[:, 3][None, :]
    br = b_ref[:, 4][None, :]

    shape = (TILE_A, TILE_B)
    zero = jnp.zeros(shape, jnp.float32)

    ca = _corners(ax, ay, aw, al, ar)           # subject polygon (4 corners)
    cb = _corners(bx, by, bw, bl, br)           # clip rectangle

    # polygon state: 8 slots of (x, y), per-pair count
    vx = [jnp.broadcast_to(c[0], shape) for c in ca] + [zero] * (_MAXV - 4)
    vy = [jnp.broadcast_to(c[1], shape) for c in ca] + [zero] * (_MAXV - 4)
    cnt = jnp.full(shape, 4, jnp.int32)

    for e in range(4):
        p1x, p1y = cb[e]
        p2x, p2y = cb[(e + 1) % 4]
        ex = p2x - p1x
        ey = p2y - p1y
        # signed distances for each slot
        d = [ex * (vy[i] - p1y) - ey * (vx[i] - p1x) for i in range(_MAXV)]
        live = [cnt > i for i in range(_MAXV)]
        ins = [d[i] >= 0 for i in range(_MAXV)]
        # next-slot values with wrap to slot 0
        nxt = [jnp.where(cnt > i + 1, x, y)
               for i, (x, y) in enumerate(zip(vx[1:] + [vx[0]],
                                              [vx[0]] * _MAXV))]
        nxty = [jnp.where(cnt > i + 1, x, y)
                for i, (x, y) in enumerate(zip(vy[1:] + [vy[0]],
                                               [vy[0]] * _MAXV))]
        dn = [jnp.where(cnt > i + 1, x, y)
              for i, (x, y) in enumerate(zip(d[1:] + [d[0]],
                                             [d[0]] * _MAXV))]
        emit_v = [live[i] & ins[i] for i in range(_MAXV)]
        emit_x = [live[i] & (ins[i] != (dn[i] >= 0)) for i in range(_MAXV)]
        # intersection points
        ix, iy = [], []
        for i in range(_MAXV):
            denom = d[i] - dn[i]
            t = d[i] / jnp.where(jnp.abs(denom) > 1e-12, denom, 1.0)
            ix.append(vx[i] + t * (nxt[i] - vx[i]))
            iy.append(vy[i] + t * (nxty[i] - vy[i]))
        # output positions: running emission count before each slot
        start = [zero.astype(jnp.int32)]
        for i in range(_MAXV - 1):
            start.append(start[i] + emit_v[i].astype(jnp.int32)
                         + emit_x[i].astype(jnp.int32))
        # static-slot compaction (no scatters: per output slot, select the
        # unique emission landing there)
        nvx = []
        nvy = []
        for k in range(_MAXV):
            accx = zero
            accy = zero
            for i in range(_MAXV):
                mv = emit_v[i] & (start[i] == k)
                accx = jnp.where(mv, vx[i], accx)
                accy = jnp.where(mv, vy[i], accy)
                mx = emit_x[i] & ((start[i] + emit_v[i].astype(jnp.int32)) == k)
                accx = jnp.where(mx, ix[i], accx)
                accy = jnp.where(mx, iy[i], accy)
            nvx.append(accx)
            nvy.append(accy)
        vx, vy = nvx, nvy
        cnt = (start[_MAXV - 1] + emit_v[_MAXV - 1].astype(jnp.int32)
               + emit_x[_MAXV - 1].astype(jnp.int32))

    # shoelace over the first cnt slots (wrap to slot 0)
    area = zero
    for i in range(_MAXV):
        nx = jnp.where(cnt > i + 1, vx[(i + 1) % _MAXV], vx[0])
        ny = jnp.where(cnt > i + 1, vy[(i + 1) % _MAXV], vy[0])
        area = area + jnp.where(cnt > i, vx[i] * ny - nx * vy[i], 0.0)
    inter = jnp.where(cnt >= 3, jnp.abs(area) * 0.5, 0.0)

    if criterion == 2:
        o_ref[:, :] = inter
    else:
        a_area = aw * al
        b_area = bw * bl
        if criterion == -1:
            denom = a_area + b_area - inter
        elif criterion == 0:
            denom = jnp.broadcast_to(a_area, shape)
        else:
            denom = jnp.broadcast_to(b_area, shape)
        o_ref[:, :] = inter / jnp.maximum(denom, 1e-7)


@functools.partial(jax.custom_jvp, nondiff_argnums=(2,))
def rotate_overlap_pallas(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray,
                          criterion: int = 2) -> jnp.ndarray:
    """Pairwise rotated overlap/IoU: [N,5] x [M,5] -> [N,M] float32.

    criterion: 2 raw intersection area, -1 IoU, 0 inter/area_a, 1 inter/area_b.
    Inputs are zero-padded to tile multiples (zero boxes give zero overlap).

    Declared non-differentiable (zero tangent): every consumer uses the
    overlaps for discrete decisions (target assignment, NMS), matching the
    reference whose CUDA/numba IoU kernels define no backward.
    """
    n, m = boxes_a.shape[0], boxes_b.shape[0]
    pad_n = (-n) % TILE_A
    pad_m = (-m) % TILE_B
    a = jnp.pad(boxes_a.astype(jnp.float32), ((0, pad_n), (0, 0)))
    b = jnp.pad(boxes_b.astype(jnp.float32), ((0, pad_m), (0, 0)))
    np_, mp_ = a.shape[0], b.shape[0]

    interpret = jax.default_backend() == "cpu"
    out = pl.pallas_call(
        functools.partial(_riou_kernel, criterion=criterion),
        grid=(np_ // TILE_A, mp_ // TILE_B),
        in_specs=[
            pl.BlockSpec((TILE_A, 5), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_B, 5), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_A, TILE_B), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((np_, mp_), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(a, b)
    return out[:n, :m]


@rotate_overlap_pallas.defjvp
def _rotate_overlap_jvp(criterion, primals, tangents):
    out = rotate_overlap_pallas(*primals, criterion)
    return out, jnp.zeros_like(out)
