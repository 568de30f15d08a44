"""TPU-native sparse 3D convolution engine.

Replaces the external `spconv` v1.0 dependency of the reference (the entire
SpMiddleFHD backbone, /root/reference/mmdet/models/necks/cmn.py:1,109-173)
with a sorted-key gather-GEMM design built for XLA/TPU:

  * Active voxels live in per-sample fixed-capacity arrays: `keys [M]` int32
    linearized zyx coordinates, ascending, padded with INT32_MAX; `feats
    [M, C]`. Static shapes everywhere — jit compiles once per config.
  * Neighbor resolution is binary search over the sorted keys
    (`jnp.searchsorted`), not hash tables — sort + search is the TPU idiom
    (no atomics/mutexes; deterministic).
  * A convolution is: gather the K=27 neighbor features into an im2col matrix
    [M, K*Cin] and hit the MXU with one [M, K*Cin] x [K*Cin, Cout] matmul.
    Missing neighbors contribute zeros. K*Cin is 432..1728 — a deep,
    MXU-friendly contraction.
  * Like spconv's `indice_key` reuse (cmn.py:140-173), neighbor gather plans
    are built once per resolution level (`build_subm_plan`) and shared by all
    submanifold convs at that level.
  * Downsampling (stride-2, kernel-3, pad-1 SparseConv3d) computes the output
    active set with a sort-unique over the <=8 candidate parents of each input
    voxel, entirely on device (`downsample_keys`).

Kernel offset order is (dz, dy, dx) row-major over {-1, 0, 1}, matching the
weight layout [K, Cin, Cout] used by the models.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import functools

import jax
import jax.numpy as jnp
import numpy as np

INVALID_KEY = np.int32(np.iinfo(np.int32).max)


# ---------------------------------------------------------------------------
# keys
# ---------------------------------------------------------------------------

def coords_to_keys(coords_zyx: jnp.ndarray, shape_zyx: Tuple[int, int, int]):
    """[M, 3] zyx int coords (-1 rows = padding) -> [M] linear keys."""
    d, h, w = shape_zyx
    z, y, x = coords_zyx[:, 0], coords_zyx[:, 1], coords_zyx[:, 2]
    keys = (z * h + y) * w + x
    return jnp.where(z >= 0, keys, INVALID_KEY).astype(jnp.int32)


def keys_to_coords(keys: jnp.ndarray, shape_zyx: Tuple[int, int, int]):
    """[M] keys -> [M, 3] zyx coords (INVALID -> -1)."""
    d, h, w = shape_zyx
    x = keys % w
    y = (keys // w) % h
    z = keys // (w * h)
    coords = jnp.stack([z, y, x], axis=-1)
    return jnp.where((keys != INVALID_KEY)[:, None], coords, -1)


def sort_by_key(keys: jnp.ndarray, feats: jnp.ndarray):
    """Sort (keys, feats) ascending by key; INVALID keys sink to the end."""
    perm = jnp.argsort(keys)
    return keys[perm], feats[perm]


def lookup(sorted_keys: jnp.ndarray, queries: jnp.ndarray):
    """Binary-search queries in sorted keys.

    Returns (idx, found): idx clipped to [0, M-1]; found marks exact hits.
    """
    m = sorted_keys.shape[0]
    pos = jnp.searchsorted(sorted_keys, queries)
    pos_c = jnp.clip(pos, 0, m - 1)
    found = (sorted_keys[pos_c] == queries) & (queries != INVALID_KEY)
    return pos_c, found


def valid_mask(keys: jnp.ndarray) -> jnp.ndarray:
    return keys != INVALID_KEY


def build_index_map(keys: jnp.ndarray, shape_zyx: Tuple[int, int, int],
                    dtype=None, keys_sorted: bool = False) -> jnp.ndarray:
    """Dense [D*H*W] map: linear key -> row in the level arrays (-1 = empty).

    One scatter builds the map; every neighbor lookup afterwards is a single
    gather — ~15x fewer memory passes than binary search over sorted keys.
    This is the TPU analog of spconv's GPU hash table: HBM is large enough to
    hold the dense grid (the full-res KITTI grid is 90M cells = 360 MB,
    transient), and a dense scatter/gather needs no atomics.

    dtype: int16 halves the map-build and window-table HBM traffic when the
    level cap fits (rows < 32768) but MEASURED SLOWER on v5e (46.1 vs 43.5
    ms full serving graph — sub-word scatter/gather pays more than the
    traffic saves); int32 stays the default.

    keys_sorted: promise the (valid prefix of) keys is ascending — true for
    the voxelizers' level-0 output and the sort-based downsampler. TPU
    scatters with indices_are_sorted run ~1.6x faster (PERF.md round 5:
    the 20k-row L0 map scatter drops 3.5 -> 2.15 ms incl. fill); the
    INVALID tail maps to the constant `total`, which keeps the promise.
    """
    d, h, w = shape_zyx
    total = d * h * w
    if dtype is None:
        dtype = jnp.int32
    ok = keys != INVALID_KEY
    dense = jnp.full((total,), -1, dtype)
    idx = jnp.where(ok, keys, total)
    rows = jnp.arange(keys.shape[0], dtype=dtype)
    return dense.at[idx].set(rows, mode="drop",
                             indices_are_sorted=keys_sorted)


def lookup_dense(index_map: jnp.ndarray, queries: jnp.ndarray):
    """Resolve linear-key queries through a dense index map.

    Returns (rows clipped to >=0, found mask)."""
    total = index_map.shape[0]
    q = jnp.where((queries >= 0) & (queries < total)
                  & (queries != INVALID_KEY), queries, 0)
    rows = index_map[q].astype(jnp.int32)
    found = (rows >= 0) & (queries != INVALID_KEY)
    return jnp.maximum(rows, 0), found


def lookup_sorted3(sorted_keys: jnp.ndarray, start: jnp.ndarray):
    """Resolve 3 CONSECUTIVE key queries (start + j, j=0..2) against a
    SORTED key array with ONE binary search per group.

    The dense-map analog is lookup_dense3; this form needs no [D*H*W]
    index map at all. Because the 3 queried keys are consecutive integers
    and the key array is sorted+unique, every present query lands in the
    3-row window starting at searchsorted(start): rows p, p+1, p+2 of the
    sorted array hold whichever of {start, start+1, start+2} exist. One
    width-3 windowed read of the (tiny, <= cap-sized) sorted keys + 9
    compares resolves the whole group — the full-resolution grid is never
    materialized, so plan building costs O(M log M) instead of O(D*H*W).

    Returns rows [..., 3] (clipped >= 0) and found [..., 3]. Caller masks
    per-tap grid-bounds validity exactly as with lookup_dense3.
    """
    m = sorted_keys.shape[0]
    p = jnp.searchsorted(sorted_keys, start, method="scan_unrolled")
    pad = jnp.full((2,), INVALID_KEY, sorted_keys.dtype)
    sk = jnp.concatenate([sorted_keys, pad])               # [m + 2]
    t = jnp.stack([sk[:-2], sk[1:-1], sk[2:]], axis=-1)    # [m, 3]
    pc = jnp.clip(p, 0, m - 1)
    w = t[pc.reshape(-1)].reshape(start.shape + (3,))      # [..., 3] keys
    vals = start[..., None] + jnp.arange(3, dtype=start.dtype)
    cmp = w[..., :, None] == vals[..., None, :]            # [..., slot, tap]
    found = jnp.any(cmp, axis=-2) & (vals != INVALID_KEY)
    slot = jnp.argmax(cmp, axis=-2).astype(jnp.int32)
    rows = jnp.minimum(pc[..., None] + slot, m - 1)
    return rows, found


class WindowTable(NamedTuple):
    """Directly built window table (no dense index map materialized).

    tab is FRONT-padded: tab[1 + s] = (map[s-1], map[s], map[s+1]) for
    s in [0, total], where map is the dense cell->row map the table
    replaces; tab has total + 5 rows (1 front pad + total + 1 real rows
    + 3 junk rows absorbing the INVALID tail's scatter)."""
    tab: jnp.ndarray


def build_window_table(keys: jnp.ndarray,
                       shape_zyx: Tuple[int, int, int]) -> WindowTable:
    """Build the [total+1, 3] window table of lookup_dense3 DIRECTLY from
    the level's SORTED unique keys — the dense index map is never
    materialized.

    The map+stack form costs a [total] memset + scatter for the map plus
    ~3x total int32 of copy passes for the padded 3-shift stack (the
    7.98 ms row of the round-5 serving trace at the 90M-cell L0 grid).
    Sorted keys make each voxel able to compute its WHOLE [3, 3]
    neighborhood patch of the table locally — map[c +/- 1] and
    map[c +/- 2] are determined by comparing the 2 preceding / following
    sorted keys — so the build collapses to one [total+5, 3] memset plus
    three unique-index row scatters of cap [3]-rows. Overlapping rows
    across the three scatters carry identical values (each entry is the
    true map content), so scatter order is irrelevant.

    Requires keys ascending-sorted, unique, INVALID-padded (both
    voxelizers and both downsamplers guarantee it).
    """
    d, h, w = shape_zyx
    total = d * h * w
    cap = keys.shape[0]
    ok = keys != INVALID_KEY
    rows = jnp.arange(cap, dtype=jnp.int32)
    s1 = jnp.array([-2], keys.dtype)
    prev_k = jnp.concatenate([s1, keys[:-1]])
    prev2_k = jnp.concatenate([jnp.full((2,), -3, keys.dtype), keys[:-2]])
    next_k = jnp.concatenate([keys[1:], jnp.array([INVALID_KEY], keys.dtype)])
    next2_k = jnp.concatenate(
        [keys[2:], jnp.full((2,), INVALID_KEY, keys.dtype)])
    l1 = jnp.where(prev_k == keys - 1, rows - 1, -1)
    l2 = jnp.where(prev_k == keys - 2, rows - 1,
                   jnp.where(prev2_k == keys - 2, rows - 2, -1))
    r1 = jnp.where(next_k == keys + 1, rows + 1, -1)
    r2 = jnp.where(next_k == keys + 2, rows + 1,
                   jnp.where(next2_k == keys + 2, rows + 2, -1))
    # three ROW scatters (table rows c-1 / c / c+1 of each voxel at cell
    # c): within each scatter the indices keys+dj are UNIQUE and sorted,
    # which lowers to the fast vectorized scatter form — a single scatter
    # of overlapping [3,3] patches (unique_indices=False) serializes on
    # TPU (~200 ms at the L0 grid, measured round 5)
    t = jnp.full((total + 5, 3), -1, jnp.int32)
    # table row s lives at tab[s + 1] (front pad)
    for dj, win in ((-1, jnp.stack([l2, l1, rows], -1)),
                    (1, jnp.stack([rows, r1, r2], -1)),
                    (0, jnp.stack([l1, rows, r1], -1))):
        idx = jnp.where(ok, keys + (1 + dj), total + 2)
        t = t.at[idx].set(win, mode="drop", indices_are_sorted=True,
                          unique_indices=True)
    return WindowTable(t)


def lookup_table3(wt: WindowTable, start: jnp.ndarray):
    """lookup_dense3 on a directly built WindowTable (same contract)."""
    total = wt.tab.shape[0] - 5
    s = jnp.clip(start + 2, 1, total + 1)
    rows = wt.tab[s.reshape(-1)].reshape(start.shape + (3,))
    return jnp.maximum(rows, 0), rows >= 0


def lookup_dense3(index_map: jnp.ndarray, start: jnp.ndarray,
                  rows_cap: int = None):
    if isinstance(index_map, WindowTable):
        return lookup_table3(index_map, start)
    """Gather index_map[start + j] for j=0..2 as ONE slice-3 gather per row.

    XLA TPU gather cost is per-row and width-independent (PERF.md), and the
    3 x-consecutive taps of a kernel (dz, dy) group query 3 CONSECUTIVE
    linear keys — so one windowed gather resolves the whole group, cutting
    every plan build's gather rows 3x (the plan-construction analog of
    gather_im2col_triple). Out-of-range window cells read the -1 padding;
    the caller masks per-tap validity (an out-of-grid x tap aliases a
    neighboring y-row's cell, so arithmetic in-bounds masks are REQUIRED).

    Returns rows [..., 3] (clipped >= 0) and raw found [..., 3].
    """
    total = index_map.shape[0]
    if not USE_WINDOW_TABLE:
        # 3 direct 1-D gathers from the RAW map — no padded copy, no
        # [total+1, 3] table: at the full-res level those two copies are
        # ~1.4 GB of HBM traffic per plan build
        s0 = start.reshape(-1)
        rows = []
        for j in range(3):
            q = s0 + j
            r = jnp.where((q >= 0) & (q < total),
                          index_map[jnp.clip(q, 0, total - 1)], -1)
            rows.append(r)
        rows = jnp.stack(rows, axis=-1).reshape(start.shape + (3,))
        return jnp.maximum(rows, 0).astype(jnp.int32), rows >= 0
    # materialized [total+1, 3] window table + 2-D row gather — the
    # per-row width-independent gather form (PERF.md); a vmapped
    # dynamic_slice(3) lowers to a slow strided-slice gather on TPU.
    # int16 table elements (SASSD_INT16_TABLES=1) were REFUTED on v5e:
    # the r5 trace priced the L0 table's copy passes at ~7.2 ms/scan and
    # predicted halving them, but the measured FULL graph went 36.5 ->
    # 40.1 ms — sub-word GATHERS pay a per-row penalty (like the r4
    # int16-MAP scatter refutation) and the map->int16 astype adds a
    # 540 MB convert pass. int32 is the default.
    tdt = (jnp.int16 if USE_INT16_TABLES and rows_cap is not None
           and rows_cap <= 32767 else index_map.dtype)
    m16 = index_map.astype(tdt)
    pad = jnp.full((2,), -1, tdt)
    p = jnp.concatenate([pad[:1], m16, pad])           # [total + 3]
    t = jnp.stack([p[:-2], p[1:-1], p[2:]], axis=-1)   # [total + 1, 3]
    s = jnp.clip(start + 1, 0, total)                  # row stays in range
    rows = t[s.reshape(-1)].reshape(start.shape + (3,)).astype(jnp.int32)
    return jnp.maximum(rows, 0), rows >= 0


# ---------------------------------------------------------------------------
# submanifold conv plan (indice_key analog)
# ---------------------------------------------------------------------------

class SubmPlan(NamedTuple):
    """Cached neighbor gather plan for one resolution level."""
    idx: jnp.ndarray    # [K, M] gather rows into the level's feature array
    found: jnp.ndarray  # [K, M] neighbor-exists flags


def _offsets(kernel: int = 3) -> np.ndarray:
    r = np.arange(kernel) - kernel // 2
    off = np.stack(np.meshgrid(r, r, r, indexing="ij"), -1).reshape(-1, 3)
    return off  # [K, 3] (dz, dy, dx), row-major


_DZDY = np.stack(np.meshgrid([-1, 0, 1], [-1, 0, 1], indexing="ij"),
                 -1).reshape(-1, 2).astype(np.int32)          # [9, 2]

# Windowed (slice-3) plan lookups vs one gather row per tap. Module-level so
# perf ablations (tools/profile_serve.py) can flip it; semantics identical.
import os as _os
USE_WINDOW_PLANS = _os.environ.get("SASSD_WINDOW_PLANS", "1") != "0"
# window-table form of lookup_dense3 vs 3 direct map gathers (perf ablation)
USE_WINDOW_TABLE = _os.environ.get("SASSD_WINDOW_TABLE", "1") != "0"
# int16 vs int32 window-table elements — REFUTED on v5e (PERF.md round 5:
# full serving graph 40.1 vs 36.5 ms; sub-word gathers + the astype pass
# cost more than the halved streaming). Kept as an ablation flag.
USE_INT16_TABLES = _os.environ.get("SASSD_INT16_TABLES", "0") == "1"
# build window tables DIRECTLY from sorted keys (build_window_table) instead
# of materializing the dense index map first — kills the [D*H*W] map
# memset+scatter AND the 3-shift stack copies per level. REFUTED on v5e
# (PERF.md round 5): the full serving graph with direct tables never
# finished XLA compile + first run within 10 min (two attempts), vs 199 s
# compile / 35.0 ms steady for the map+stack form — the three [3]-wide
# row scatters at the 90M-cell L0 grid blow up compilation. Correctness
# is covered by tests/test_device_plans.py; kept as an ablation flag.
USE_DIRECT_TABLES = _os.environ.get("SASSD_DIRECT_TABLES", "0") == "1"


def _window_plan(base_coords: jnp.ndarray, shape_zyx: Tuple[int, int, int],
                 index_map: jnp.ndarray = None,
                 sorted_keys: jnp.ndarray = None,
                 rows_cap: int = None) -> SubmPlan:
    """27-tap plan (taps = base + off, (dz,dy,dx) row-major) via 9 windowed
    slice-3 lookups instead of 27 single-row lookups.

    Resolution backend: a dense index map (lookup_dense3) or a binary
    search over the level's SORTED keys (lookup_sorted3 — no dense grid
    materialized; the serving-graph fast path).

    base_coords [M, 3] zyx; rows with z < 0 are padding. The per-tap
    x-bounds masks are mandatory: the window cells of an out-of-grid x tap
    alias the neighboring y-row.
    """
    d, h, w = shape_zyx
    z, y, x = base_coords[:, 0], base_coords[:, 1], base_coords[:, 2]
    dz = jnp.asarray(_DZDY[:, 0])[:, None]                    # [9, 1]
    dy = jnp.asarray(_DZDY[:, 1])[:, None]
    zq, yq = z[None] + dz, y[None] + dy                       # [9, M]
    gok = ((z >= 0) & (x >= 0) & (x < w))[None] \
        & (zq >= 0) & (zq < d) & (yq >= 0) & (yq < h)
    qmid = (zq * h + yq) * w + x[None]
    if index_map is not None:
        rows3, fw = lookup_dense3(index_map, qmid - 1,
                                  rows_cap=rows_cap)          # [9, M, 3]
    else:
        safe = jnp.where(gok, qmid - 1, INVALID_KEY - 3)
        rows3, fw = lookup_sorted3(sorted_keys, safe)         # [9, M, 3]
    f0 = fw[..., 0] & gok & (x >= 1)[None]
    f1 = fw[..., 1] & gok
    f2 = fw[..., 2] & gok & (x + 1 < w)[None]
    found = jnp.stack([f0, f1, f2], axis=1)                   # [9, 3, M]
    idx = jnp.transpose(rows3, (0, 2, 1))                     # [9, 3, M]
    m = base_coords.shape[0]
    return SubmPlan(idx.reshape(27, m).astype(jnp.int32),
                    found.reshape(27, m))


def build_subm_plan(keys: jnp.ndarray, shape_zyx: Tuple[int, int, int],
                    kernel: int = 3, index_map: jnp.ndarray = None,
                    sorted_lookup: bool = False) -> SubmPlan:
    """Neighbor indices for a submanifold conv at this level (built once,
    reused by every subm conv with the same level — spconv indice_key).

    With `index_map` (see build_index_map) resolution is one windowed dense
    gather per (dz, dy) tap group; with `sorted_lookup` (keys must be
    sorted — both voxelizers and downsample_keys guarantee it) one windowed
    binary search per group, with NO dense grid materialized (the cheapest
    form at serving voxel counts); otherwise per-tap binary search."""
    if kernel == 3 and USE_WINDOW_PLANS and sorted_lookup:
        return _window_plan(keys_to_coords(keys, shape_zyx), shape_zyx,
                            sorted_keys=keys)
    if index_map is not None and kernel == 3 and USE_WINDOW_PLANS:
        return _window_plan(keys_to_coords(keys, shape_zyx), shape_zyx,
                            index_map, rows_cap=keys.shape[0])
    d, h, w = shape_zyx
    coords = keys_to_coords(keys, shape_zyx)                  # [M, 3]
    off = jnp.asarray(_offsets(kernel), jnp.int32)            # [K, 3]
    nb = coords[None, :, :] + off[:, None, :]                 # [K, M, 3]
    inb = jnp.all((nb >= 0) & (nb < jnp.asarray([d, h, w], jnp.int32)), axis=-1)
    inb = inb & (coords[None, :, 0] >= 0)
    q = (nb[..., 0] * h + nb[..., 1]) * w + nb[..., 2]
    q = jnp.where(inb, q, INVALID_KEY).astype(jnp.int32)
    if index_map is not None:
        idx, found = lookup_dense(index_map, q.reshape(-1))
    else:
        idx, found = lookup(keys, q.reshape(-1))
    k = off.shape[0]
    return SubmPlan(idx.reshape(k, -1), found.reshape(k, -1))


def gather_im2col(feats: jnp.ndarray, plan: SubmPlan,
                  dtype=None) -> jnp.ndarray:
    """[M, C] features + plan -> [M, K*C] im2col matrix (missing -> 0)."""
    k, m = plan.idx.shape
    g = feats[plan.idx.reshape(-1)].reshape(k, m, -1)
    g = jnp.where(plan.found[..., None], g, 0)
    out = jnp.transpose(g, (1, 0, 2)).reshape(m, -1)
    return out.astype(dtype) if dtype is not None else out


def _shift_cat3(feats: jnp.ndarray) -> jnp.ndarray:
    """[M, C] -> [M, 3C]: row r holds rows r, r+1, r+2 (zero-padded tail)."""
    z1 = jnp.zeros((1,) + feats.shape[1:], feats.dtype)
    s1 = jnp.concatenate([feats[1:], z1], 0)
    s2 = jnp.concatenate([feats[2:], z1, z1], 0)
    return jnp.concatenate([feats, s1, s2], axis=-1)


def gather_im2col_triple(feats: jnp.ndarray, plan: SubmPlan,
                         dtype=None) -> jnp.ndarray:
    """gather_im2col with 3x fewer gathered rows via x-run packing.

    Requires (a) the level array be SORTED by key with unique keys and
    INVALID padding at the end, and (b) each consecutive group of 3 taps in
    the plan query x-consecutive cells (ascending, unit key steps) — true
    for subm and stride plans in the (dz, dy, dx)-fastest offset order.

    Then any active cells among a group's 3 queried keys occupy ADJACENT
    rows (sorted unique keys leave no room between K-1, K, K+1), so ONE
    3C-wide row gathered at the first active row covers the whole group.
    XLA's gather cost is per-row and width-independent, so this cuts the
    gather time of every sparse conv ~3x. The tap features are recovered
    from the wide row with elementwise selects (VPU-cheap).
    """
    k, m = plan.idx.shape
    c = feats.shape[-1]
    T = _shift_cat3(feats)
    i3 = plan.idx.reshape(-1, 3, m)
    f3 = plan.found.reshape(-1, 3, m)
    f0, f1, f2 = f3[:, 0, :, None], f3[:, 1, :, None], f3[:, 2, :, None]
    r = jnp.where(f3[:, 0], i3[:, 0], jnp.where(f3[:, 1], i3[:, 1], i3[:, 2]))
    G = T[r.reshape(-1)].reshape(k // 3, m, 3 * c)
    g0, g1, g2 = G[..., :c], G[..., c:2 * c], G[..., 2 * c:]
    t0 = jnp.where(f0, g0, 0)
    t1 = jnp.where(f1, jnp.where(f0, g1, g0), 0)
    nbefore = f0.astype(jnp.int32) + f1.astype(jnp.int32)
    gh = jnp.where(nbefore == 0, g0, jnp.where(nbefore == 1, g1, g2))
    t2 = jnp.where(f2, gh, 0)
    taps = jnp.stack([t0, t1, t2], axis=1).reshape(k, m, c)
    out = jnp.transpose(taps, (1, 0, 2)).reshape(m, -1)
    return out.astype(dtype) if dtype is not None else out


def gather_im2col_strideT3(feats: jnp.ndarray, plan: SubmPlan,
                           dtype=None) -> jnp.ndarray:
    """Packed gather for TRANSPOSE stride plans (csrc stride_plan_T).

    Within a (dz, dy) group the taps query coarse cells (x+1)/2, x/2,
    (x-1)/2 under per-axis parity: the middle tap (x even) is exclusive
    with the outer taps (x odd), and when the outer pair is live it queries
    two consecutive coarse keys in DESCENDING order (tap0 = tap2's key + 1).
    Same sorted-adjacency argument as gather_im2col_triple.
    """
    k, m = plan.idx.shape
    c = feats.shape[-1]
    T = _shift_cat3(feats)
    i3 = plan.idx.reshape(-1, 3, m)
    f3 = plan.found.reshape(-1, 3, m)
    f0, f1, f2 = f3[:, 0, :, None], f3[:, 1, :, None], f3[:, 2, :, None]
    r = jnp.where(f3[:, 1], i3[:, 1], jnp.where(f3[:, 2], i3[:, 2], i3[:, 0]))
    G = T[r.reshape(-1)].reshape(k // 3, m, 3 * c)
    g0, g1 = G[..., :c], G[..., c:2 * c]
    t1 = jnp.where(f1, g0, 0)
    t2 = jnp.where(f2, g0, 0)
    t0 = jnp.where(f0, jnp.where(f2, g1, g0), 0)
    taps = jnp.stack([t0, t1, t2], axis=1).reshape(k, m, c)
    out = jnp.transpose(taps, (1, 0, 2)).reshape(m, -1)
    return out.astype(dtype) if dtype is not None else out


def _gather(feats, plan: SubmPlan, dtype, triple: bool, kind: str = "subm"):
    if triple and plan.idx.shape[0] % 3 == 0:
        if kind == "strideT":
            return gather_im2col_strideT3(feats, plan, dtype=dtype)
        return gather_im2col_triple(feats, plan, dtype=dtype)
    return gather_im2col(feats, plan, dtype=dtype)


def subm_conv(feats: jnp.ndarray, weight: jnp.ndarray, plan: SubmPlan,
              compute_dtype=jnp.float32,
              symmetric: bool = True, triple: bool = False,
              store_col: bool = False) -> jnp.ndarray:
    """Submanifold sparse conv: im2col gather + one MXU matmul.

    weight: [K, Cin, Cout].

    With `symmetric=True` (valid ONLY when the plan's input and output sets
    are the same — true submanifold convs) a custom VJP turns the backward
    gather-transpose into another GATHER with the kernel offsets reversed
    on the weight side instead of XLA's serialized scatter-add:
        d_in[j] = sum_k W_k . d_out[n_{K-1-k}(j)] = sum_m W_{K-1-m} . d_out[n_m(j)]
    because the offset list is antisymmetric under reversal. Pass
    symmetric=False for stride plans (different in/out sets).

    `triple=True` enables the packed gather (see gather_im2col_triple) —
    valid only when the plan's level arrays are key-sorted (host plans).

    `store_col=True` keeps the forward im2col matrix alive as a VJP
    residual so dW needs no recomputation gather in the backward — one of
    the three gathers per conv in a train step disappears, at [M, K*Cin]
    of extra HBM per conv (identical numerics either way).
    """
    if symmetric:
        return _subm_conv_sym(compute_dtype, triple, store_col, feats,
                              weight, plan.idx, plan.found)
    return _subm_conv_raw(feats, weight, plan, compute_dtype, triple)


def _subm_conv_raw(feats, weight, plan: SubmPlan, compute_dtype,
                   triple: bool = False):
    k, cin, cout = weight.shape
    col = _gather(feats, plan, compute_dtype, triple)
    w2 = weight.reshape(k * cin, cout).astype(compute_dtype)
    return jnp.dot(col, w2, preferred_element_type=jnp.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _subm_conv_sym(compute_dtype, triple, store_col, feats, weight, idx,
                   found):
    return _subm_conv_raw(feats, weight, SubmPlan(idx, found), compute_dtype,
                          triple)


def _subm_conv_sym_fwd(compute_dtype, triple, store_col, feats, weight, idx,
                       found):
    if store_col:
        # materialize the im2col once; the matmul consumes it AND it rides
        # along as a residual (no recompute gather in the backward)
        k, cin, cout = weight.shape
        col = _gather(feats, SubmPlan(idx, found), compute_dtype, triple)
        w2 = weight.reshape(k * cin, cout).astype(compute_dtype)
        out = jnp.dot(col, w2, preferred_element_type=jnp.float32)
        return out, (col, feats, weight, idx, found)
    out = _subm_conv_raw(feats, weight, SubmPlan(idx, found), compute_dtype,
                         triple)
    return out, (None, feats, weight, idx, found)


def _subm_conv_sym_bwd(compute_dtype, triple, store_col, res, d_out):
    col, feats, weight, idx, found = res
    k, cin, cout = weight.shape
    plan = SubmPlan(idx, found)
    if col is None:
        # dW: recompute the forward im2col (cheaper in memory than storing)
        col = _gather(feats, plan, compute_dtype, triple)
    dw = jnp.dot(col.T, d_out.astype(compute_dtype),
                 preferred_element_type=jnp.float32).reshape(k, cin, cout)
    # d_feats: gather d_out with the SAME plan, contract with the kernel-
    # reversed transposed weights: slot m of the im2col holds d_out[n_m(j)],
    # whose coefficient in d_in[j] = sum_k W_k . d_out[n_{K-1-k}(j)] is
    # W_{K-1-m} — so reverse the tap axis on the weight side.
    col_b = _gather(d_out, plan, compute_dtype, triple)
    wb = weight[::-1].transpose(0, 2, 1).reshape(
        k * cout, cin).astype(compute_dtype)
    d_feats = jnp.dot(col_b, wb, preferred_element_type=jnp.float32)
    d_feats = d_feats.astype(feats.dtype)
    return (d_feats, dw.astype(weight.dtype), None, None)


_subm_conv_sym.defvjp(_subm_conv_sym_fwd, _subm_conv_sym_bwd)


# ---------------------------------------------------------------------------
# strided sparse conv (downsample)
# ---------------------------------------------------------------------------

def _unique_sorted(cands: jnp.ndarray, cap: int) -> jnp.ndarray:
    """Sort + dedup candidate keys into a [cap] INVALID-padded sorted array."""
    s = jnp.sort(cands)
    first = jnp.concatenate([jnp.array([True]), s[1:] != s[:-1]])
    first = first & (s != INVALID_KEY)
    rank = jnp.cumsum(first.astype(jnp.int32)) - 1
    out = jnp.full((cap,), INVALID_KEY, jnp.int32)
    # every row of a duplicate group writes the group's (identical) key at
    # the group's rank — rank is nondecreasing and the INVALID tail maps to
    # the constant `cap`, so the scatter indices are provably sorted (the
    # sorted-scatter TPU lowering is ~1.6x faster, PERF.md round 5)
    idx = jnp.where(s != INVALID_KEY, rank, cap)
    out = out.at[idx].set(s, mode="drop", indices_are_sorted=True)
    return out


def out_shape_stride2(shape_zyx: Tuple[int, int, int]) -> Tuple[int, int, int]:
    """spconv output dims for kernel 3 / stride 2 / pad 1: floor((D-1)/2)+1."""
    return tuple((s - 1) // 2 + 1 for s in shape_zyx)


def _downsample_candidates(keys: jnp.ndarray,
                           shape_zyx: Tuple[int, int, int],
                           y_limit_out=None) -> jnp.ndarray:
    """[8*M] candidate output keys of a stride-2 k3 p1 conv (with dups).

    y_limit_out: optional exclusive output-y bound BELOW the grid height —
    the banded spatial sharding passes the GLOBAL grid top in band-local
    coordinates, so a band whose local grid extends past the global
    boundary clips the round-up candidate (y+1)//2 exactly where the
    replicated grid does (parallel/sparse_spatial.py)."""
    od, oh, ow = out_shape_stride2(shape_zyx)
    coords = keys_to_coords(keys, shape_zyx)                  # [M, 3]
    c0 = coords // 2
    c1 = (coords + 1) // 2
    y_hi = oh if y_limit_out is None else jnp.minimum(y_limit_out, oh)
    cands = []
    for sz in range(2):
        for sy in range(2):
            for sx in range(2):
                z = jnp.where(sz == 0, c0[:, 0], c1[:, 0])
                y = jnp.where(sy == 0, c0[:, 1], c1[:, 1])
                x = jnp.where(sx == 0, c0[:, 2], c1[:, 2])
                ok = ((coords[:, 0] >= 0) & (z < od) & (y < y_hi) & (x < ow))
                kk = (z * oh + y) * ow + x
                cands.append(jnp.where(ok, kk, INVALID_KEY).astype(jnp.int32))
    return jnp.concatenate(cands)


def downsample_keys(keys: jnp.ndarray, shape_zyx: Tuple[int, int, int],
                    out_cap: int, y_limit_out=None) -> jnp.ndarray:
    """Active output set of a stride-2 k3 p1 sparse conv (sorted, capped).

    Each input voxel coordinate i contributes to outputs o with
    2o-1 <= i <= 2o+1, i.e. o in {i//2, (i+1)//2} per dim (<= 8 parents).
    The output set is the union, computed as sort+unique with a static cap.
    """
    return _unique_sorted(
        _downsample_candidates(keys, shape_zyx, y_limit_out), out_cap)


def downsample_keys_with_map(keys: jnp.ndarray,
                             shape_zyx: Tuple[int, int, int],
                             out_cap: int, y_limit_out=None):
    """Sorted active output set of a stride-2 conv AND the output level's
    dense index map, in ONE fused pass — no XLA sort.

    Scatter the <= 8*M candidate keys as presence marks into the OUTPUT
    grid, take a running rank (cumsum), and read each candidate's rank
    back: the rank IS both the compaction destination (sorted, because
    ranks ascend with linear cell index) and the output index map that
    build_subm_plan / build_stride_plan at the next level need — so the
    sort-based downsample (~2.3 ms/level on v5e) and the next level's
    build_index_map collapse into one cumsum + two scatter/gather passes.

    MEASURED SLOWER on v5e (round 5): the 3-level serving plan pipeline
    went 25.3 -> 29.9 ms — the output-grid cumsum (11.3M cells at L0->L1)
    costs more than the 160k-element sort it replaces. Kept for grids
    where out_cap*8 >> out_total would flip the balance, and as the
    recorded refutation (PERF.md round 5).

    Returns (out_keys [out_cap] sorted INVALID-padded, index_map [total]
    int32 rows-or--1). Identical results to downsample_keys +
    build_index_map (tests/test_device_plans.py).
    """
    od, oh, ow = out_shape_stride2(shape_zyx)
    total = od * oh * ow
    cands = _downsample_candidates(keys, shape_zyx, y_limit_out)  # [8M]
    valid = cands != INVALID_KEY
    safe = jnp.where(valid, cands, total)
    mark = jnp.zeros((total + 1,), jnp.int32).at[safe].set(1, mode="drop")
    mark = mark[:total]
    rank = jnp.cumsum(mark) - 1                    # row of each marked cell
    index_map = jnp.where((mark > 0) & (rank < out_cap), rank, -1)
    r = jnp.where(valid, rank[jnp.minimum(safe, total - 1)], out_cap)
    out = jnp.full((out_cap,), INVALID_KEY, jnp.int32)
    out = out.at[r].set(jnp.where(valid, cands, 0).astype(jnp.int32),
                        mode="drop")
    return out, index_map


def downsample_keys_dense(keys: jnp.ndarray,
                          shape_zyx: Tuple[int, int, int],
                          out_cap: int, y_limit_out=None) -> jnp.ndarray:
    """Sort-free active-set computation for the TPU fast path.

    XLA sorts on TPU are expensive; instead each candidate key is scatter-
    max'ed into a dense grid at the output resolution, the surviving
    ("representative") candidates are identified with one gather, and a
    cumsum compacts them into the capped output array. Output order is
    deterministic (candidate-major) but NOT sorted — pair with the dense
    index maps, which don't need sorted keys.
    """
    od, oh, ow = out_shape_stride2(shape_zyx)
    total = od * oh * ow
    cands = _downsample_candidates(keys, shape_zyx, y_limit_out)  # [8M]
    n = cands.shape[0]
    valid = cands != INVALID_KEY
    safe = jnp.where(valid, cands, total)
    mark = jnp.full((total,), -1, jnp.int32)
    mark = mark.at[safe].max(jnp.arange(n, dtype=jnp.int32), mode="drop")
    is_rep = valid & (mark[jnp.minimum(safe, total - 1)]
                      == jnp.arange(n, dtype=jnp.int32))
    rank = jnp.cumsum(is_rep.astype(jnp.int32)) - 1
    out = jnp.full((out_cap,), INVALID_KEY, jnp.int32)
    return out.at[jnp.where(is_rep, rank, out_cap)].set(cands, mode="drop")


def build_stride_plan(in_keys: jnp.ndarray, out_keys: jnp.ndarray,
                      in_shape: Tuple[int, int, int],
                      kernel: int = 3, index_map: jnp.ndarray = None,
                      sorted_lookup: bool = False) -> SubmPlan:
    """Gather plan mapping each output voxel's 27 taps to input rows.

    For output o and kernel tap k (0..2 per dim), the input coordinate is
    i = 2*o + k - 1 (stride 2, pad 1). sorted_lookup: resolve against the
    SORTED in_keys with windowed binary search (no dense map).
    """
    d, h, w = in_shape
    out_sh = out_shape_stride2(in_shape)
    ocoords = keys_to_coords(out_keys, out_sh)                # [Mo, 3]
    if kernel == 3 and USE_WINDOW_PLANS and sorted_lookup:
        # base = 2*o: the x taps query 2x-1, 2x, 2x+1 — consecutive keys,
        # so the windowed lookup applies unchanged (pad rows: 2*(-1) < 0)
        return _window_plan(2 * ocoords, in_shape, sorted_keys=in_keys)
    if index_map is not None and kernel == 3 and USE_WINDOW_PLANS:
        return _window_plan(2 * ocoords, in_shape, index_map,
                            rows_cap=in_keys.shape[0])
    off = jnp.asarray(_offsets(kernel), jnp.int32)            # [K, 3]
    icoords = 2 * ocoords[None, :, :] + off[:, None, :]       # [K, Mo, 3]
    inb = jnp.all((icoords >= 0) & (icoords < jnp.asarray([d, h, w], jnp.int32)),
                  axis=-1)
    inb = inb & (ocoords[None, :, 0] >= 0)
    q = (icoords[..., 0] * h + icoords[..., 1]) * w + icoords[..., 2]
    q = jnp.where(inb, q, INVALID_KEY).astype(jnp.int32)
    if index_map is not None:
        idx, found = lookup_dense(index_map, q.reshape(-1))
    else:
        idx, found = lookup(in_keys, q.reshape(-1))
    k = off.shape[0]
    return SubmPlan(idx.reshape(k, -1), found.reshape(k, -1))


def build_stride_plan_T(in_keys: jnp.ndarray,
                        in_shape: Tuple[int, int, int],
                        out_index_map: jnp.ndarray = None,
                        out_sorted_keys: jnp.ndarray = None,
                        out_rows_cap: int = None) -> SubmPlan:
    """TRANSPOSE plan of a stride-2 k3 p1 conv, built ON DEVICE.

    For each INPUT voxel with coordinate c and tap offset off_k, the output
    cell is (c - off_k)/2 when every dim is parity-aligned, on-grid and
    active — the plan the gather-based backward of stride_conv_hostT needs
    (host analog: csrc stride_plan_T). Layout [27, M_in] in (dz,dy,dx)
    row-major tap order, identical to the host plan, so the
    gather_im2col_strideT3 packing applies unchanged.

    Per (dz, dy) group the valid x taps query coarse cells (x+1)/2, x/2,
    (x-1)/2 — all inside the 3-window starting at (x-1)//2 — so one
    windowed gather per group resolves every tap (lookup_dense3).
    """
    od, oh, ow = out_shape_stride2(in_shape)
    coords = keys_to_coords(in_keys, in_shape)                # [M, 3]
    z, y, x = coords[:, 0], coords[:, 1], coords[:, 2]
    dz = jnp.asarray(_DZDY[:, 0])[:, None]                    # [9, 1]
    dy = jnp.asarray(_DZDY[:, 1])[:, None]
    cz, cy = z[None] - dz, y[None] - dy                       # [9, M]
    gok = ((z >= 0)[None]
           & (cz % 2 == 0) & (cz >= 0) & (cz // 2 < od)
           & (cy % 2 == 0) & (cy >= 0) & (cy // 2 < oh))
    s = (x - 1) // 2                                          # window start
    qstart = ((cz // 2) * oh + (cy // 2)) * ow + s[None]
    if out_index_map is not None:
        rows3, fw = lookup_dense3(out_index_map, qstart,
                                  rows_cap=out_rows_cap)      # [9, M, 3]
    else:
        safe = jnp.where(gok, qstart, INVALID_KEY - 3)
        rows3, fw = lookup_sorted3(out_sorted_keys, safe)     # [9, M, 3]
    taps_idx, taps_found = [], []
    for dx in (-1, 0, 1):
        cx = x - dx
        okx = (cx % 2 == 0) & (cx >= 0) & (cx // 2 < ow)
        rel = cx // 2 - s                                     # [M] in {0,1,2}
        r = jnp.where(rel[None] == 0, rows3[..., 0],
                      jnp.where(rel[None] == 1, rows3[..., 1],
                                rows3[..., 2]))
        f = jnp.where(rel[None] == 0, fw[..., 0],
                      jnp.where(rel[None] == 1, fw[..., 1], fw[..., 2]))
        taps_idx.append(r)
        taps_found.append(f & gok & okx[None])
    m = coords.shape[0]
    idx = jnp.stack(taps_idx, axis=1).reshape(27, m)          # [9,3,M]->[27,M]
    found = jnp.stack(taps_found, axis=1).reshape(27, m)
    return SubmPlan(idx.astype(jnp.int32), found)


def build_aux_plan(cell0_zyx: jnp.ndarray, level: int,
                   level_index_map: jnp.ndarray,
                   level_shape: Tuple[int, int, int],
                   level_sorted_keys: jnp.ndarray = None,
                   level_rows_cap: int = None) -> jnp.ndarray:
    """Aux-branch ring 3-NN candidate plan, built ON DEVICE.

    [M0, 3] level-0 zyx cells (-1 = padding) -> [27, M0] int32 rows of the
    3x3x3 neighborhood of (cell0 >> level) in the level's arrays, -1 =
    missing — the host rulebook's aux{L} plan format (ops/native.py), tap
    order = interpolate._offsets27. Consumed by
    interpolate.neighborhood_interpolate_cells. Resolution: dense index
    map, or windowed binary search when `level_sorted_keys` is given
    instead (level_index_map=None).
    """
    parent = cell0_zyx >> level                               # -1 stays -1
    plan = _window_plan(parent, level_shape, index_map=level_index_map,
                        sorted_keys=level_sorted_keys,
                        rows_cap=level_rows_cap)
    return jnp.where(plan.found, plan.idx, -1)


def stride_conv(in_keys: jnp.ndarray, feats: jnp.ndarray, weight: jnp.ndarray,
                in_shape: Tuple[int, int, int], out_cap: int,
                compute_dtype=jnp.float32):
    """Stride-2 sparse conv: new active set + gather-GEMM.

    Returns (out_keys [out_cap], out_feats [out_cap, Cout], out_shape).
    """
    out_keys = downsample_keys(in_keys, in_shape, out_cap)
    plan = build_stride_plan(in_keys, out_keys, in_shape)
    # symmetric=False: the symmetric-gather VJP is only valid when input and
    # output active sets coincide; a stride plan's do not (caught by the
    # torch-dense gradient oracle in tests/test_reference_oracle.py)
    out = subm_conv(feats, weight, plan, compute_dtype, symmetric=False)
    out = jnp.where(valid_mask(out_keys)[:, None], out, 0.0)
    return out_keys, out, out_shape_stride2(in_shape)


def conv1x1(feats: jnp.ndarray, weight: jnp.ndarray,
            compute_dtype=jnp.float32) -> jnp.ndarray:
    """1x1x1 sparse conv == plain matmul over active voxels. weight [Cin, Cout]."""
    return jnp.dot(feats.astype(compute_dtype), weight.astype(compute_dtype),
                   preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# densification
# ---------------------------------------------------------------------------

def to_dense(keys: jnp.ndarray, feats: jnp.ndarray,
             shape_zyx: Tuple[int, int, int],
             keys_sorted: bool = False) -> jnp.ndarray:
    """Scatter active voxels into a dense [D, H, W, C] canvas (spconv .dense()).

    keys_sorted: promise ascending valid keys (sorted levels) — padding is
    pinned to the constant (d, h, w) so the full index tuple sequence stays
    lexicographically nondecreasing and the faster sorted-scatter TPU
    lowering applies.
    """
    d, h, w = shape_zyx
    coords = keys_to_coords(keys, shape_zyx)
    ok = coords[:, 0] >= 0
    z = jnp.where(ok, coords[:, 0], d)                        # drop padding
    y = jnp.where(ok, coords[:, 1], h)
    x = jnp.where(ok, coords[:, 2], w)
    canvas = jnp.zeros((d, h, w, feats.shape[-1]), feats.dtype)
    return canvas.at[z, y, x].set(feats, mode="drop",
                                  indices_are_sorted=keys_sorted)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def stride_conv_hostT(compute_dtype, triple, store_col, feats, weight, idx,
                      found, idxT, foundT):
    """Strided sparse conv with a gather-based backward.

    Forward is the usual gather-GEMM over the stride plan (idx/found,
    [27, M_out] rows into the input level). The backward uses the host-built
    TRANSPOSE plan (idxT/foundT, [27, M_in] rows into the output level;
    csrc stride_plan_T) so the gradient w.r.t. the input features is a
    gather + matmul instead of XLA's serialized scatter-add:
        d_in[i] = sum_k W_k . d_out[(i - off_k)/2]   (when on-grid/active)

    `store_col=True`: keep the forward im2col as a residual (see subm_conv).
    """
    return _subm_conv_raw(feats, weight, SubmPlan(idx, found), compute_dtype,
                          triple)


def _stride_hostT_fwd(compute_dtype, triple, store_col, feats, weight, idx,
                      found, idxT, foundT):
    if store_col:
        k, cin, cout = weight.shape
        col = _gather(feats, SubmPlan(idx, found), compute_dtype, triple)
        w2 = weight.reshape(k * cin, cout).astype(compute_dtype)
        out = jnp.dot(col, w2, preferred_element_type=jnp.float32)
        return out, (col, feats, weight, idx, found, idxT, foundT)
    out = _subm_conv_raw(feats, weight, SubmPlan(idx, found), compute_dtype,
                         triple)
    return out, (None, feats, weight, idx, found, idxT, foundT)


def _stride_hostT_bwd(compute_dtype, triple, store_col, res, d_out):
    col, feats, weight, idx, found, idxT, foundT = res
    k, cin, cout = weight.shape
    if col is None:
        col = _gather(feats, SubmPlan(idx, found), compute_dtype, triple)
    dw = jnp.dot(col.T, d_out.astype(compute_dtype),
                 preferred_element_type=jnp.float32).reshape(k, cin, cout)
    colT = _gather(d_out, SubmPlan(idxT, foundT), compute_dtype, triple,
                   kind="strideT")
    wT = weight.transpose(0, 2, 1).reshape(k * cout, cin).astype(compute_dtype)
    d_feats = jnp.dot(colT, wT, preferred_element_type=jnp.float32)
    return (d_feats.astype(feats.dtype), dw.astype(weight.dtype),
            None, None, None, None)


stride_conv_hostT.defvjp(_stride_hostT_fwd, _stride_hostT_bwd)


# ---------------------------------------------------------------------------
# flat-batch execution: one level array for the whole batch
# ---------------------------------------------------------------------------
# The reference batches by concatenating each sample's voxel tensor with a
# batch-index coordinate column (merge_second_batch,
# /root/reference/mmdet/models/detectors/single_stage.py:52-73) so every
# conv runs once over the union of actives. The TPU adaptation: concatenate
# the per-sample fixed-capacity segments along rows and add b*cap to every
# plan index. Row offsets preserve each segment's internal sort order, so
# the packed triple gathers still apply (adjacency is a within-sample
# property; cross-sample rows are never marked `found` because plans are
# built per sample). vs. vmap: the gathers lose their batch dimension
# (ONE flat gather instead of a batched gather) and each GEMM runs once at
# B x the rows — the batch-scaling execution mode.

def flatten_plan(plan: SubmPlan, rows_in: int) -> SubmPlan:
    """[B, K, M] batched plan -> [K, B*M] flat plan over concatenated rows.

    rows_in: per-sample row count of the level the indices point INTO
    (equals M for subm plans; the input level's cap for stride plans).
    """
    b, k, m = plan.idx.shape
    off = (jnp.arange(b, dtype=plan.idx.dtype) * rows_in)[:, None, None]
    idx = jnp.transpose(plan.idx + off, (1, 0, 2)).reshape(k, b * m)
    found = jnp.transpose(plan.found, (1, 0, 2)).reshape(k, b * m)
    return SubmPlan(idx, found)


def subm_conv_batched(feats: jnp.ndarray, weight: jnp.ndarray,
                      plan: SubmPlan, compute_dtype=jnp.float32,
                      symmetric: bool = True, triple: bool = False,
                      store_col: bool = False) -> jnp.ndarray:
    """subm_conv over a whole batch as ONE flat gather-GEMM.

    feats: [B, M_in, C]; plan: batched ([B, K, M_out]) with indices into
    the input rows (M_out == M_in for subm plans; pass symmetric=False
    with a stride plan). Returns [B, M_out, Cout].
    """
    b, m_in, c = feats.shape
    m_out = plan.idx.shape[-1]
    fp = flatten_plan(plan, m_in)
    out = subm_conv(feats.reshape(b * m_in, c), weight, fp, compute_dtype,
                    symmetric=symmetric, triple=triple, store_col=store_col)
    return out.reshape(b, m_out, -1)


def stride_conv_hostT_batched(compute_dtype, triple, store_col,
                              feats: jnp.ndarray, weight: jnp.ndarray,
                              plan: SubmPlan, planT: SubmPlan) -> jnp.ndarray:
    """stride_conv_hostT over a whole batch as ONE flat gather-GEMM.

    feats: [B, M_in, C]; plan: [B, K, M_out] into input rows; planT:
    [B, K, M_in] into output rows. Returns [B, M_out, Cout].
    """
    b, m_in, c = feats.shape
    m_out = plan.idx.shape[-1]
    fp = flatten_plan(plan, m_in)
    fpT = flatten_plan(planT, m_out)
    out = stride_conv_hostT(compute_dtype, triple, store_col,
                            feats.reshape(b * m_in, c), weight,
                            fp.idx, fp.found, fpT.idx, fpT.found)
    return out.reshape(b, m_out, -1)
