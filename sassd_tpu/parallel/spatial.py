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


def make_spatial_test_step(cfg, anchors, mesh: Mesh):
    """Jitted inference with the dense BEV stage spatially sharded."""
    sh = bev_sharding(mesh)
    repl = NamedSharding(mesh, P())

    def step(params, state, batch):
        return detector.forward_test(params, state, batch, anchors, cfg,
                                     bev_sharding=sh)

    return jax.jit(step, in_shardings=(repl, repl, repl),
                   out_shardings=repl)


def make_spatial_train_step(cfg, anchors, tx, mesh: Mesh):
    """Jitted DP x spatial train step: batch on 'data', BEV on 'spatial'."""
    import optax

    if cfg.model.flat_batch:
        import dataclasses as _dc
        # see make_train_step: flat batching is per-device; under a sharded
        # global batch the vmap path is the correct execution mode
        cfg = _dc.replace(cfg, model=_dc.replace(cfg.model,
                                                 flat_batch=False))

    sh = bev_sharding(mesh)
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))

    def step(params, state, opt_state, batch):
        def loss_fn(p):
            losses, new_state = detector.forward_train(
                p, state, batch, anchors, cfg, bev_sharding=sh)
            total = sum(losses.values())
            return total, (losses, new_state)

        grads, (losses, new_state) = jax.grad(loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        metrics = dict(losses)
        metrics["loss"] = sum(losses.values())
        return new_params, new_state, new_opt, metrics

    return jax.jit(step, in_shardings=(repl, repl, repl, data),
                   out_shardings=(repl, repl, repl, repl),
                   donate_argnums=(0, 1, 2))
