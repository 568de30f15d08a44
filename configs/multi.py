"""KITTI three-class Car/Pedestrian/Cyclist config (mirrors multi_cfg.py)."""
from sassd_tpu.config import multi_config

config = multi_config()
