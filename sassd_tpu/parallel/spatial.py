"""Spatial (BEV-grid) sharding — the sequence-parallel analog for LiDAR.

The reference has no equivalent (SURVEY 2.7: its only strategy is data
parallel); for long-range configs whose dense BEV stage dominates, the BEV
canvas is sharded along its H (y) axis over the mesh's 'spatial' axis.
XLA SPMD inserts the halo exchanges the 3x3 convolutions need over ICI; the
sparse stage and heads stay replicated (they are voxel-count bound, not
grid bound).
"""
from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sassd_tpu.models import detector


def bev_sharding(mesh: Mesh) -> NamedSharding:
    """Shard [B, H, W, C] BEV tensors along H over the 'spatial' axis."""
    return NamedSharding(mesh, P(None, "spatial", None, None))


def make_spatial_test_step(cfg, anchors, mesh: Mesh, packed_layout=None):
    """Jitted inference with the dense BEV stage spatially sharded."""
    sh = bev_sharding(mesh)
    repl = NamedSharding(mesh, P())

    def step(params, state, batch):
        if packed_layout is not None:
            from sassd_tpu.train.loop import unpack_batch
            batch = unpack_batch(batch, packed_layout)
        return detector.forward_test(params, state, batch, anchors, cfg,
                                     bev_sharding=sh)

    return jax.jit(step, in_shardings=(repl, repl, repl),
                   out_shardings=repl)


def make_spatial_train_step(cfg, anchors, tx, mesh: Mesh,
                            packed_layout=None):
    """Jitted DP x spatial train step: batch on 'data', BEV on 'spatial'.

    ONE step body with make_train_step (train/loop.py) — only the BEV
    sharding constraint differs — so the spatial path keeps the
    non-finite-update guard and the packed-h2d support (VERDICT r3 item 7;
    the guard is asserted under this mesh in tests/test_spatial.py).
    """
    from sassd_tpu.train.loop import make_train_step
    return make_train_step(cfg, anchors, tx, mesh=mesh,
                           packed_layout=packed_layout,
                           bev_shard=bev_sharding(mesh))
