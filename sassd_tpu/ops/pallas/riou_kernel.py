"""Device kernel: pairwise rotated-rectangle intersection areas.

Algorithm: Green's theorem over the intersection boundary instead of an
explicit vertex-buffer polygon clip. For convex A, B the boundary of A "*" B
is exactly (edges of A clipped to B) union (edges of B clipped to A), each
traversed CCW, so

    area(A "*" B) = 1/2 * sum over those directed segments (p, q) of
                    cross(p, q)

Each edge-vs-rectangle clip is a slab test in the clipping box's local frame
(2 reciprocals + min/max — no division cascade, no vertex buffers, no
compaction), and the clipped endpoints are re-evaluated in the GLOBAL frame
via the frame-independent parameters t0/t1 so all cross products share one
origin. Coincident-boundary degeneracies (identical / edge-touching boxes)
are resolved by a direction-aware eps tie-break (see
_edges_clipped_cross_sum).

Implementation history (all measured on one v5e chip, [2048, 2048] pairs):
  * XLA Sutherland-Hodgman with 8-slot gather/one-hot compaction
    (core/riou.py `_pair_area_jnp`, kept as the semantics oracle): ~6.9 s.
  * Pallas SH kernel, all slot indexing unrolled in VMEM: ~390 ms — the
    ~100 live [8,128] tiles per pair spill to VMEM on every op.
  * Pallas Green/slab kernel (~5x fewer ops, ~4x less live state): ~210 ms
    — still spill-bound under Mosaic.
  * THIS: the same Green/slab math as plain XLA broadcast arithmetic — a
    pure elementwise chain over [N, M] tiles that XLA fuses into one loop
    with its own register allocation: ~5 ms. 40x faster than the best
    hand-tiled Mosaic variant; the lesson recorded here is that for
    gather-free elementwise math the XLA fuser IS the right kernel
    generator, and Pallas earns its keep only where explicit memory
    choreography (gathers, DMA, gridded reuse) is the point.

The public entry keeps its historical name `rotate_overlap_pallas` (callers
and tests import it); `rotate_overlap_green` is the canonical alias.

Semantics match core/riou.py `_pair_area_*` (clockwise yaw; CCW corners;
intersection area of two rotated rectangles).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

EPS_SHRINK = 1e-5


def _corners(x, y, w, l, r):
    """Corner lists ([4 of (a, b)]) for center-format boxes, clockwise yaw.

    CCW winding (orientation preserved by the rigid transform)."""
    c = jnp.cos(r)
    s = jnp.sin(r)
    out = []
    for sx, sy in ((0.5, 0.5), (-0.5, 0.5), (-0.5, -0.5), (0.5, -0.5)):
        lx = sx * w
        ly = sy * l
        out.append((lx * c + ly * s + x, -lx * s + ly * c + y))
    return out


def _safe_recip(d):
    """1/d with a sign-preserving floor so axis-parallel segments resolve
    to +-inf slab bounds instead of NaNs."""
    tiny = 1e-12
    safe = jnp.where(d >= 0, jnp.maximum(d, tiny), jnp.minimum(d, -tiny))
    return 1.0 / safe


def _edges_clipped_cross_sum(corners, cx, cy, cc, cs, hw, hl,
                             subject: bool):
    """Sum of cross(p', q') over the 4 directed edges of `corners`, each
    clipped to the rectangle (center (cx, cy), cos/sin (cc, cs), half dims
    (hw, hl)). Clip parameters come from a slab test in the rectangle's
    local frame; clipped endpoints are evaluated in the global frame.

    Boundary-coincident segments (degenerate pairs: identical or
    edge-touching boxes) need a tie-break so each true boundary arc is
    counted net-once:
      subject=True  (A edges vs B): a face bound is EXPANDED by EPS_SHRINK
        when the segment direction matches the face's CCW orientation
        (include: the arc belongs to the intersection boundary), SHRUNK
        otherwise (exclude: anti-parallel coincidence must cancel to zero,
        which dropping both sides achieves).
      subject=False (B edges vs A): all bounds shrunk — coincident arcs are
        counted only by the subject pass.
    For non-degenerate geometry the +-eps shifts perturb crossing points by
    O(eps): ~1e-4 m^2 area error at KITTI scales."""
    eps = EPS_SHRINK
    # local coords of all 4 corners (inverse of the _corners rotation)
    loc = []
    for gx, gy in corners:
        dx = gx - cx
        dy = gy - cy
        loc.append((dx * cc - dy * cs, dx * cs + dy * cc))
    acc = 0.0
    for e in range(4):
        pgx, pgy = corners[e]
        qgx, qgy = corners[(e + 1) % 4]
        plx, ply = loc[e]
        qlx, qly = loc[(e + 1) % 4]
        dlx = qlx - plx
        dly = qly - ply
        if subject:
            # CCW face orientations: right +y, left -y, top -x, bottom +x
            x_hi = hw + jnp.where(dly > 0, eps, -eps)
            x_lo = -hw - jnp.where(dly < 0, eps, -eps)
            y_hi = hl + jnp.where(dlx < 0, eps, -eps)
            y_lo = -hl - jnp.where(dlx > 0, eps, -eps)
        else:
            x_hi, x_lo = hw - eps, -hw + eps
            y_hi, y_lo = hl - eps, -hl + eps
        rdx = _safe_recip(dlx)
        rdy = _safe_recip(dly)
        tx1 = (x_lo - plx) * rdx
        tx2 = (x_hi - plx) * rdx
        ty1 = (y_lo - ply) * rdy
        ty2 = (y_hi - ply) * rdy
        t0 = jnp.maximum(jnp.maximum(jnp.minimum(tx1, tx2),
                                     jnp.minimum(ty1, ty2)), 0.0)
        t1 = jnp.minimum(jnp.minimum(jnp.maximum(tx1, tx2),
                                     jnp.maximum(ty1, ty2)), 1.0)
        hit = t1 > t0
        egx = qgx - pgx
        egy = qgy - pgy
        x0 = pgx + t0 * egx
        y0 = pgy + t0 * egy
        x1 = pgx + t1 * egx
        y1 = pgy + t1 * egy
        acc = acc + jnp.where(hit, x0 * y1 - x1 * y0, 0.0)
    return acc


@functools.partial(jax.custom_jvp, nondiff_argnums=(2,))
def rotate_overlap_green(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray,
                         criterion: int = 2) -> jnp.ndarray:
    """Pairwise rotated overlap/IoU: [N,5] x [M,5] -> [N,M] float32.

    criterion: 2 raw intersection area, -1 IoU, 0 inter/area_a,
    1 inter/area_b. Zero boxes (padding) give zero overlap.

    Declared non-differentiable (zero tangent): every consumer uses the
    overlaps for discrete decisions (target assignment, NMS), matching the
    reference whose CUDA/numba IoU kernels define no backward.
    """
    a = boxes_a.astype(jnp.float32)
    b = boxes_b.astype(jnp.float32)
    ax, ay, aw, al, ar = (a[:, i][:, None] for i in range(5))
    bx, by, bw, bl, br = (b[:, i][None, :] for i in range(5))

    # Per-box quantities stay in their narrow shapes ([N,1] / [1,M]); full
    # [N, M] arrays only materialize inside the clip arithmetic, which XLA
    # fuses into a single elementwise loop.
    ca = _corners(ax, ay, aw, al, ar)
    cb = _corners(bx, by, bw, bl, br)
    # edges of A clipped by B (direction-aware tie-break), plus edges of B
    # clipped by A (shrunk): see _edges_clipped_cross_sum
    s = _edges_clipped_cross_sum(ca, bx, by, jnp.cos(br), jnp.sin(br),
                                 bw * 0.5, bl * 0.5, subject=True)
    s = s + _edges_clipped_cross_sum(cb, ax, ay, jnp.cos(ar), jnp.sin(ar),
                                     aw * 0.5, al * 0.5, subject=False)
    inter = jnp.maximum(s * 0.5, 0.0)

    if criterion == 2:
        return inter
    a_area = aw * al
    b_area = bw * bl
    if criterion == -1:
        denom = a_area + b_area - inter
    elif criterion == 0:
        denom = jnp.broadcast_to(a_area, inter.shape)
    else:
        denom = jnp.broadcast_to(b_area, inter.shape)
    return inter / jnp.maximum(denom, 1e-7)


@rotate_overlap_green.defjvp
def _rotate_overlap_jvp(criterion, primals, tangents):
    out = rotate_overlap_green(*primals, criterion)
    return out, jnp.zeros_like(out)


# historical name — the first device implementation was a Pallas kernel
# (see module docstring); callers/tests import this symbol.
rotate_overlap_pallas = rotate_overlap_green
