"""Long-range config with the sparse stage spatially sharded.

The 0-102.4m grid has 2x the rows and ~4x the voxel budget of the car
config; its sparse ladder dominates the step. This config runs it banded:
the mesh gets a 'spatial' axis of 4, level-0 voxels are partitioned into 4
y-bands with halo recompute, and the BEV trunk consumes the H-sharded
canvas directly (parallel/sparse_spatial.py). Training AND inference
honor the strategy (tools/train.py, tools/test.py).

Requires a device count divisible by 4 (e.g. the 8-device dryrun mesh
runs 2 data x 4 spatial).
"""
import dataclasses

from sassd_tpu.config import ParallelConfig, long_range_config

config = dataclasses.replace(
    long_range_config(),
    parallel=ParallelConfig(strategy="banded", spatial=4),
)
