from . import backbone, bev, detector, layers, pswarp, ssd_head  # noqa: F401
