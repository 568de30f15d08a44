from . import augment, calib, create_data, kitti, loader, synthetic  # noqa: F401
