"""ctypes bindings for the native host library (csrc/sassd_host.cpp).

Build with `make -C csrc` (or `python -m sassd_tpu.ops.native`). Every entry
point has a pure-numpy fallback, so the framework runs without the library —
the C++ path is the fast host lane for dataloader voxelization and the
evaluator's rotated-overlap matrices.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_LIB_PATH = Path(__file__).resolve().parents[2] / "csrc" / "libsassd_host.so"
_SRC_PATH = _LIB_PATH.parent / "sassd_host.cpp"
_HASH_PATH = _LIB_PATH.parent / ".libsassd_host.srchash"
_lib: Optional[ctypes.CDLL] = None


def _source_hash() -> str:
    h = hashlib.sha256()
    h.update(_SRC_PATH.read_bytes())
    h.update((_LIB_PATH.parent / "Makefile").read_bytes())
    return h.hexdigest()


def _is_stale() -> bool:
    """True when the .so does not correspond to the current sources.

    The binary is NOT committed; build() records the source hash in a
    sidecar file, so an on-disk library left over from an older source
    revision is rebuilt instead of silently loaded."""
    if not _LIB_PATH.exists():
        return True
    try:
        return _HASH_PATH.read_text().strip() != _source_hash()
    except OSError:
        return True


def build(verbose: bool = False) -> bool:
    """Compile the shared library in-tree. Returns success."""
    try:
        out = subprocess.run(["make", "-C", str(_LIB_PATH.parent)],
                             capture_output=True, text=True, timeout=120)
        if verbose:
            print(out.stdout, out.stderr)
        ok = out.returncode == 0 and _LIB_PATH.exists()
        if ok:
            _HASH_PATH.write_text(_source_hash())
        return ok
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if _is_stale() and os.environ.get("SASSD_BUILD_NATIVE", "1") == "1":
        build()
    if not _LIB_PATH.exists():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    i64, f32p = ctypes.c_int64, np.ctypeslib.ndpointer(np.float32, flags="C")
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C")
    lib.voxelize.restype = i64
    lib.voxelize.argtypes = [f32p, i64, i64, f32p, f32p, i64p, i64, i64,
                             f32p, i32p, i32p]
    lib.points_in_rbbox.restype = None
    lib.points_in_rbbox.argtypes = [f32p, i64, i64, f32p, i64, u8p]
    lib.rotated_overlap.restype = None
    lib.rotated_overlap.argtypes = [f64p, i64, f64p, i64, ctypes.c_int, f32p]
    lib.build_plans.restype = i64
    lib.build_plans.argtypes = [i32p, i64p, i64p] + [i32p] * 16 + [i64p, i64]
    lib.anchors_mask.restype = None
    lib.anchors_mask.argtypes = [i32p, i64, f32p, i64, f32p, f32p, i64p,
                                 ctypes.c_float, u8p]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def voxelize_cpp(points: np.ndarray, pc_min, voxel_size, grid,
                 max_pts: int, max_voxels: int):
    """Native first-come voxelization. Returns (voxels, coords, num, m)."""
    lib = _load()
    assert lib is not None
    points = np.ascontiguousarray(points, np.float32)
    n, f = points.shape
    voxels = np.zeros((max_voxels, max_pts, f), np.float32)
    coords = np.full((max_voxels, 3), -1, np.int32)
    nums = np.zeros((max_voxels,), np.int32)
    m = lib.voxelize(points, n, f,
                     np.ascontiguousarray(pc_min, np.float32),
                     np.ascontiguousarray(voxel_size, np.float32),
                     np.ascontiguousarray(grid, np.int64),
                     max_pts, max_voxels, voxels, coords, nums)
    return voxels, coords, nums, int(m)


def points_in_rbbox_cpp(points: np.ndarray, boxes: np.ndarray) -> np.ndarray:
    lib = _load()
    assert lib is not None
    points = np.ascontiguousarray(points, np.float32)
    boxes = np.ascontiguousarray(boxes, np.float32)
    out = np.zeros((points.shape[0], boxes.shape[0]), np.uint8)
    if points.size and boxes.size:
        lib.points_in_rbbox(points, points.shape[0], points.shape[1],
                            boxes, boxes.shape[0], out)
    return out.astype(bool)


def rotated_overlap_cpp(boxes: np.ndarray, qboxes: np.ndarray,
                        criterion: int = 2) -> np.ndarray:
    lib = _load()
    assert lib is not None
    boxes = np.ascontiguousarray(boxes, np.float64)
    qboxes = np.ascontiguousarray(qboxes, np.float64)
    out = np.zeros((boxes.shape[0], qboxes.shape[0]), np.float32)
    if boxes.size and qboxes.size:
        lib.rotated_overlap(boxes, boxes.shape[0], qboxes, qboxes.shape[0],
                            criterion, out)
    return out


def build_plans_cpp(coords0: np.ndarray, sparse_shape, level_caps,
                    train: bool = True):
    """Host rulebook: full VxNet gather plans from level-0 voxel coords.

    Args:
      coords0: [cap0, 3] int32 zyx coords (-1 rows = padding).
      sparse_shape: (D, H, W) of the full-res grid.
      level_caps: 4 per-level capacities (cap0 == coords0.shape[0]).
      train: when False, the train-only plans (aux1..3 neighborhood rings,
        strideT1..3 backward transposes) are skipped — ~2x less rulebook
        work for inference serving.
    Returns:
      dict with keys subm0..subm3 ([27, capL] int32, -1 = missing),
      stride1..stride3, coords1..coords3 ([capL, 3] int32, -1 padded);
      plus aux1..3 / strideT1..3 when train.
    """
    lib = _load()
    assert lib is not None
    caps = np.asarray(level_caps, np.int64)
    assert coords0.shape[0] == caps[0], (coords0.shape, caps)
    dims = np.asarray(sparse_shape, np.int64)
    out = {f"subm{l}": np.empty((27, int(caps[l])), np.int32)
           for l in range(4)}
    dummy = np.empty((1,), np.int32)
    trainbuf = (lambda *shape: np.empty(shape, np.int32)) if train else (
        lambda *shape: dummy)
    aux, sT = {}, {}
    for l in range(1, 4):
        out[f"coords{l}"] = np.empty((int(caps[l]), 3), np.int32)
        out[f"stride{l}"] = np.empty((27, int(caps[l])), np.int32)
        aux[l] = trainbuf(27, int(caps[0]))
        sT[l] = trainbuf(27, int(caps[l - 1]))
    n_out = np.zeros(4, np.int64)
    lib.build_plans(np.ascontiguousarray(coords0, np.int32), caps, dims,
                    out["subm0"], out["coords1"], out["subm1"],
                    out["stride1"], out["coords2"], out["subm2"],
                    out["stride2"], out["coords3"], out["subm3"],
                    out["stride3"], aux[1], aux[2], aux[3],
                    sT[1], sT[2], sT[3], n_out, int(train))
    if train:
        for l in range(1, 4):
            out[f"aux{l}"] = aux[l]
            out[f"strideT{l}"] = sT[l]
    out["n_active"] = n_out.astype(np.int32)
    return out


def anchors_mask_cpp(coords, anchors_bv, voxel_size, pc_range, grid,
                     threshold: float) -> np.ndarray:
    """Native BEV-occupancy anchors mask (kitti.py:227-238 semantics)."""
    lib = _load()
    assert lib is not None
    coords = np.ascontiguousarray(coords, np.int32)
    bv = np.ascontiguousarray(anchors_bv, np.float32)
    out = np.zeros((bv.shape[0],), np.uint8)
    lib.anchors_mask(coords, coords.shape[0], bv, bv.shape[0],
                     np.ascontiguousarray(voxel_size, np.float32),
                     np.ascontiguousarray(pc_range[:3], np.float32),
                     np.ascontiguousarray(grid, np.int64),
                     float(threshold), out)
    return out.astype(bool)


if __name__ == "__main__":
    ok = build(verbose=True)
    print("native build:", "ok" if ok else "FAILED")
