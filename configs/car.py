"""KITTI single-class Car config (the flagship; mirrors car_cfg.py)."""
from sassd_tpu.config import car_config

config = car_config()
