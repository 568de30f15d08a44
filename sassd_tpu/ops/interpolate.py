"""Three-nearest-neighbor feature interpolation (aux branch).

Replaces the pointnet2 CUDA extension of the reference
(/root/reference/mmdet/ops/pointnet2/src/interpolate_gpu.cu:9-165 and the
`nearest_neighbor_interpolate` wrapper, necks/cmn.py:175-189) with a chunked
matmul-based brute-force search that runs on the MXU: squared distances are
computed as |u|^2 + |k|^2 - 2 u.k (one [chunk,3] x [3,M] GEMM per chunk), and
the 3 nearest are taken with top_k. Chunking bounds the transient distance
matrix; `lax.map` keeps memory flat while XLA pipelines the chunks.

Weighting matches the reference wrapper exactly: w_i = (1/(d2_i + 1e-8)) /
sum_j (1/(d2_j + 1e-8)) over the 3 nearest, where d2 are *squared* distances
(pointnet2's three_nn returns squared distances).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_BIG = 1e10


def three_nn_interpolate(unknown_xyz: jnp.ndarray,
                         known_xyz: jnp.ndarray,
                         known_valid: jnp.ndarray,
                         known_feats: jnp.ndarray,
                         chunk: int = 512) -> jnp.ndarray:
    """Interpolate features from `known` points onto `unknown` points.

    Args:
      unknown_xyz: [N, 3] query positions (padded rows produce garbage that the
        caller masks; N must be a multiple of `chunk`... it is padded here).
      known_xyz:   [M, 3] source positions.
      known_valid: [M] bool validity (padded source rows are excluded).
      known_feats: [M, C] source features.
    Returns:
      [N, C] interpolated features.
    """
    n = unknown_xyz.shape[0]
    pad = (-n) % chunk
    if pad:
        unknown_xyz = jnp.concatenate(
            [unknown_xyz, jnp.zeros((pad, 3), unknown_xyz.dtype)])
    k2 = jnp.sum(known_xyz * known_xyz, axis=1)               # [M]
    invalid_bias = jnp.where(known_valid, 0.0, _BIG)

    def one_chunk(u):
        u2 = jnp.sum(u * u, axis=1, keepdims=True)            # [c, 1]
        d2 = u2 + k2[None, :] - 2.0 * jnp.dot(
            u, known_xyz.T, preferred_element_type=jnp.float32)
        d2 = jnp.maximum(d2, 0.0) + invalid_bias[None, :]
        neg, idx = jax.lax.top_k(-d2, 3)                      # [c, 3]
        d2_3 = -neg
        w = 1.0 / (d2_3 + 1e-8)
        w = w / jnp.sum(w, axis=1, keepdims=True)
        f = known_feats[idx]                                  # [c, 3, C]
        return jnp.sum(f * w[..., None], axis=1)

    chunks = unknown_xyz.reshape(-1, chunk, 3)
    out = jax.lax.map(one_chunk, chunks)
    out = out.reshape(-1, known_feats.shape[-1])
    return out[:n]


def neighborhood_interpolate(query_xyz: jnp.ndarray,
                             centers: jnp.ndarray,
                             feats: jnp.ndarray,
                             plan_idx: jnp.ndarray) -> jnp.ndarray:
    """3-NN interpolation restricted to a precomputed candidate neighborhood.

    The exact brute-force search above is O(N*M) and dominated the train
    step; here the host rulebook supplies, per query, the <=27 active cells
    of the 3x3x3 ring around the query's parent cell (ops/native.py
    build_plans_cpp aux{L} plans). Queries are input-voxel centroids, so
    their parent cell is active by construction and the global 3 nearest
    centers lie in this ring except in degenerate isolated-voxel cases —
    where the weighting gracefully falls back to the available candidates.

    Args:
      query_xyz: [N, 3]; centers: [M, 3]; feats: [M, C];
      plan_idx: [27, N] int32 rows into centers/feats (-1 = missing).
    Returns:
      [N, C] interpolated features (0 where no candidate exists).
    """
    found = plan_idx >= 0                                     # [27, N]
    idx = jnp.maximum(plan_idx, 0).astype(jnp.int32)
    cand = centers[idx]                                       # [27, N, 3]
    d2 = jnp.sum((cand - query_xyz[None]) ** 2, axis=-1)      # [27, N]
    d2 = jnp.where(found, d2, _BIG)
    neg, sel = jax.lax.top_k(-d2.T, 3)                        # [N, 3]
    d2_3 = -neg
    rows = jnp.take_along_axis(idx.T, sel, axis=1)            # [N, 3]
    ok = jnp.take_along_axis(found.T, sel, axis=1)
    w = jnp.where(ok, 1.0 / (d2_3 + 1e-8), 0.0)
    denom = jnp.sum(w, axis=1, keepdims=True)
    w = w / jnp.where(denom > 0, denom, 1.0)
    f = feats[rows]                                           # [N, 3, C]
    return jnp.sum(f * w[..., None], axis=1)


_OFFSETS27 = None


def _offsets27():
    """Cache NUMPY (not jnp — a traced constant would leak across jits)."""
    global _OFFSETS27
    if _OFFSETS27 is None:
        import numpy as np
        r = np.arange(3) - 1
        _OFFSETS27 = np.stack(np.meshgrid(r, r, r, indexing="ij"),
                              -1).reshape(-1, 3).astype(np.int32)
    return jnp.asarray(_OFFSETS27)


def neighborhood_interpolate_cells(query_xyz: jnp.ndarray,
                                   query_cell0: jnp.ndarray,
                                   level: int,
                                   feats: jnp.ndarray,
                                   plan_idx: jnp.ndarray,
                                   voxel_size_xyz,
                                   pc_min_xyz) -> jnp.ndarray:
    """neighborhood_interpolate without the candidate-center gather.

    The candidate cells of aux plan tap k are STRUCTURAL: (query's level-0
    cell >> level) + off_k (csrc build_plans aux plans), so their metric
    centers are arithmetic in the plan layout — no [27, N] row gather of
    center coordinates is needed at all, only the final [N, 3] feature
    gather of the selected neighbors. Distances are computed with the same
    (cell + 0.5) * voxel_size + pc_min formula as tensor2points
    (/root/reference/mmdet/core/bbox/transforms.py:218-223), on the exact
    integer parent cell, so selections match neighborhood_interpolate.

    Args:
      query_xyz: [N, 3] query positions (input-voxel centroids).
      query_cell0: [N, 3] int32 zyx level-0 cells of the queries (-1 pad).
      level: pyramid level of `feats` (cells are level-0 cells >> level).
      feats: [M, C]; plan_idx: [27, N] rows into feats (-1 = missing).
      voxel_size_xyz / pc_min_xyz: the LEVEL's voxel size and grid origin.
    """
    vs = jnp.asarray(voxel_size_xyz, jnp.float32)
    pcr = jnp.asarray(pc_min_xyz, jnp.float32)
    parent = query_cell0 >> level                              # [N, 3] zyx
    cand = parent[None] + _offsets27()[:, None, :]             # [27, N, 3]
    centers = (cand[..., ::-1].astype(jnp.float32) + 0.5) * vs + pcr
    found = plan_idx >= 0
    idx = jnp.maximum(plan_idx, 0).astype(jnp.int32)
    d2 = jnp.sum((centers - query_xyz[None]) ** 2, axis=-1)    # [27, N]
    d2 = jnp.where(found, d2, _BIG)
    neg, sel = jax.lax.top_k(-d2.T, 3)                         # [N, 3]
    d2_3 = -neg
    rows = jnp.take_along_axis(idx.T, sel, axis=1)             # [N, 3]
    ok = jnp.take_along_axis(found.T, sel, axis=1)
    w = jnp.where(ok, 1.0 / (d2_3 + 1e-8), 0.0)
    denom = jnp.sum(w, axis=1, keepdims=True)
    w = w / jnp.where(denom > 0, denom, 1.0)
    f = feats[rows]                                            # [N, 3, C]
    return jnp.sum(f * w[..., None], axis=1)
