"""Miniature config (full topology, toy shapes) — smoke runs and CI."""
from sassd_tpu.config import tiny_config

config = tiny_config()
