from . import interpolate, sparse, voxelize, warp  # noqa: F401
