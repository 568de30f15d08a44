"""Load the reference's OWN code as numerical oracles.

The parity tests elsewhere in this suite compare sassd_tpu against hand
transcriptions of the reference math; a shared misreading would pass
silently. This module executes the reference's actual source from
/root/reference (read-only) so tests in test_reference_oracle.py can assert
equality against the code itself:

  * numba is absent in this environment, but every numba-decorated function
    in the reference is plain Python under the decorator — an identity-`jit`
    stub (plus `cuda.local.array` -> np.zeros for the CUDA device helpers)
    makes them importable AND callable.
  * the mmdet package __init__ files drag in mmcv/compiled CUDA extensions;
    instead of importing the package, each needed module is loaded directly
    from its file under a synthetic package tree, with attribute-stub
    modules standing in for the compiled/mmcv-only imports that the tested
    functions never touch.

Nothing from /root/reference is copied; it is imported in place.
"""
from __future__ import annotations

import importlib.util
import sys
import types

import numpy as np

REF = "/root/reference"


def _make_numba_stub() -> types.ModuleType:
    numba = types.ModuleType("numba")
    numba.__sassd_stub__ = True

    def _jit(*args, **kwargs):
        # @numba.jit / @numba.jit(nopython=True) / @cuda.jit('sig', device=..)
        if len(args) == 1 and callable(args[0]) and not kwargs:
            return args[0]

        def deco(fn):
            return fn

        return deco

    numba.jit = _jit
    numba.njit = _jit
    numba.prange = range
    numba.float32 = np.float32
    numba.float64 = np.float64
    numba.int32 = np.int32
    numba.int64 = np.int64
    numba.boolean = np.bool_

    cuda = types.ModuleType("numba.cuda")
    cuda.jit = _jit

    class _Local:
        @staticmethod
        def array(shape, dtype):
            return np.zeros(shape, dtype=dtype)

    cuda.local = _Local
    numba.cuda = cuda
    return numba


def install_numba_stub() -> None:
    existing = sys.modules.get("numba")
    if existing is not None and not getattr(existing, "__sassd_stub__", False):
        raise RuntimeError("real numba present; oracle stub would shadow it")
    if existing is None:
        numba = _make_numba_stub()
        sys.modules["numba"] = numba
        sys.modules["numba.cuda"] = numba.cuda


class _AttrStubModule(types.ModuleType):
    """Module whose every attribute resolves to None.

    Lets `from X import Anything` succeed for compiled/mmcv-only deps that
    the oracle functions never call."""

    def __getattr__(self, name):
        if name.startswith("__"):
            raise AttributeError(name)
        return None


def _ensure_package(fullname: str) -> None:
    parts = fullname.split(".")
    for i in range(1, len(parts) + 1):
        name = ".".join(parts[:i])
        if name not in sys.modules:
            pkg = types.ModuleType(name)
            pkg.__path__ = []          # mark as package
            sys.modules[name] = pkg


def install_attr_stub(fullname: str, **attrs) -> None:
    """Register an attribute-stub module (e.g. a compiled extension)."""
    if fullname in sys.modules:
        return
    _ensure_package(fullname.rsplit(".", 1)[0])
    mod = _AttrStubModule(fullname)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[fullname] = mod


_LOADED = {}


def load_ref_module(fullname: str, relpath: str) -> types.ModuleType:
    """Execute a reference source file under its canonical module name."""
    if fullname in _LOADED:
        return _LOADED[fullname]
    install_numba_stub()
    _ensure_package(fullname.rsplit(".", 1)[0])
    kwargs = {}
    if relpath.endswith("__init__.py"):
        # package __init__: keep relative imports resolvable
        kwargs["submodule_search_locations"] = [
            f"{REF}/{relpath[:-len('/__init__.py')]}"]
    spec = importlib.util.spec_from_file_location(
        fullname, f"{REF}/{relpath}", **kwargs)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[fullname] = mod
    spec.loader.exec_module(mod)
    _LOADED[fullname] = mod
    return mod


def load_geometry():
    return load_ref_module("mmdet.core.bbox3d.geometry",
                           "mmdet/core/bbox3d/geometry.py")


def load_box_coders():
    load_geometry()
    return load_ref_module("mmdet.core.bbox3d.box_coders",
                           "mmdet/core/bbox3d/box_coders.py")


def load_target_ops():
    return load_ref_module("mmdet.core.bbox3d.target_ops",
                           "mmdet/core/bbox3d/target_ops.py")


def load_losses():
    return load_ref_module("mmdet.core.loss.losses",
                           "mmdet/core/loss/losses.py")


def load_rotate_nms_gpu():
    """The numba-CUDA rotated-IoU file; its *device* helpers (scalar math:
    rbbox_to_corners / inter / devRotateIoUEval) run as plain Python under
    the stub. The kernel launchers (`fn[blocks, threads]`) do not — use
    ref_rotate_iou_eval below instead of rotate_iou_gpu_eval."""
    return load_ref_module("mmdet.core.post_processing.rotate_nms_gpu",
                           "mmdet/core/post_processing/rotate_nms_gpu.py")


def load_region_similarity():
    load_geometry()
    load_rotate_nms_gpu()
    return load_ref_module("mmdet.core.bbox3d.region_similarity",
                           "mmdet/core/bbox3d/region_similarity.py")


def ref_rotate_iou_eval(boxes: np.ndarray, qboxes: np.ndarray,
                        criterion: int = -1) -> np.ndarray:
    """Pairwise rotated overlap via the reference's own devRotateIoUEval
    device function (rotate_nms_gpu.py:537-549), looped on the host — the
    CPU-executable equivalent of rotate_iou_gpu_eval."""
    gpu = load_rotate_nms_gpu()
    boxes = np.ascontiguousarray(boxes, dtype=np.float32)
    qboxes = np.ascontiguousarray(qboxes, dtype=np.float32)
    out = np.zeros((boxes.shape[0], qboxes.shape[0]), dtype=np.float32)
    for i in range(boxes.shape[0]):
        for j in range(qboxes.shape[0]):
            out[i, j] = gpu.devRotateIoUEval(boxes[i], qboxes[j],
                                             np.int32(criterion))
    return out


def load_kitti_eval():
    """kitti_eval with its CUDA rotated-IoU import replaced by
    ref_rotate_iou_eval (same math, reference device functions, host loop).
    Everything else in the module is the reference's own numba/python."""
    # kitti_eval does `from ...rotate_nms_gpu import rotate_iou_gpu_eval`;
    # pre-load the real module, then patch the launcher it would have bound.
    gpu = load_rotate_nms_gpu()
    orig = gpu.rotate_iou_gpu_eval
    gpu.rotate_iou_gpu_eval = ref_rotate_iou_eval
    try:
        mod = load_ref_module("mmdet.core.evaluation.kitti_eval",
                              "mmdet/core/evaluation/kitti_eval.py")
    finally:
        gpu.rotate_iou_gpu_eval = orig
    return mod


def load_models_utils():
    """mmdet.models.utils (__init__) for `one_hot`; its mmcv-backed sibling
    imports are attribute-stubbed (never used by one_hot)."""
    for sub in ("conv_module", "norm", "weight_init", "empty", "sequential"):
        install_attr_stub(f"mmdet.models.utils.{sub}")
    # __init__ uses `from .conv_module import ConvModule` style relative
    # imports, which resolve via sys.modules entries made above
    return load_ref_module("mmdet.models.utils",
                           "mmdet/models/utils/__init__.py")


def load_ssd_rotate_head():
    """SSDRotateHead for add_sin_difference / get_direction_target /
    prepare_loss_weights / create_loss and the torch box coders. The CUDA
    iou3d extension and the NMS wrapper are attribute-stubbed; none of the
    tested methods touch them."""
    load_models_utils()
    load_box_coders()
    load_losses()
    load_target_ops()
    install_attr_stub("mmdet.ops.iou3d.iou3d_utils")
    install_attr_stub("mmdet.core.post_processing.bbox_nms")
    install_attr_stub("mmdet.core.utils.misc")
    return load_ref_module(
        "mmdet.models.single_stage_heads.ssd_rotate_head",
        "mmdet/models/single_stage_heads/ssd_rotate_head.py")
