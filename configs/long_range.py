"""Long-range stress config: 0-102.4m range, 4x voxel budget."""
from sassd_tpu.config import long_range_config

config = long_range_config()
