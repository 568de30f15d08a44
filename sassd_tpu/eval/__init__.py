from . import kitti_eval, results  # noqa: F401
