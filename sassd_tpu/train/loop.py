"""Training loop: jitted DP train step, logging, checkpointing, resume.

Equivalent of /root/reference/tools/train_utils/__init__.py:28-116
(batch_processor / train_one_epoch / train_model) with the step — forward,
all losses, target assignment, optimizer update, BN state update — compiled
as ONE jitted function over the device mesh.
"""
from __future__ import annotations

import logging
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from sassd_tpu.config import SASSDConfig
from sassd_tpu.models import detector
from sassd_tpu.parallel import dist
from sassd_tpu.parallel import mesh as mesh_lib
from . import checkpoint as ckpt_lib
from . import optim as optim_lib


# ---------------------------------------------------------------------------
# batch packing: one host->device buffer per dtype
#
# On networked accelerators every h2d transfer is an RPC; a train batch is
# ~28 separate arrays (voxels, coords, masks, 13 rulebook plans, ...) and
# the per-array round trips dominate the step wall time. Packing flattens
# all same-dtype arrays into ONE [B, total] buffer per dtype (4 transfers),
# and the jitted step unpacks with free static slices. The layout is a pure
# function of the batch's (static) shapes, so it is computed once from a
# template and closed over at trace time.
# ---------------------------------------------------------------------------

def batch_pack_layout(template: Dict[str, np.ndarray]):
    """[(dtype_group, key, shape)] layout + per-group order, from one batch."""
    groups: Dict[str, list] = {}
    for k in sorted(template):
        v = template[k]
        g = np.dtype(v.dtype).str
        groups.setdefault(g, []).append((k, tuple(v.shape)))
    return groups


def pack_batch(batch: Dict[str, np.ndarray], layout,
               out: Dict[str, np.ndarray] = None) -> Dict[str, np.ndarray]:
    """Concatenate same-dtype arrays into one [B, total] buffer per dtype.

    out: optional pre-allocated destination buffers (see HostStager) —
    packing then writes in place and transfers reuse pinned host memory.
    """
    dst = {} if out is None else out
    for g, entries in layout.items():
        parts = [np.ascontiguousarray(batch[k]).reshape(batch[k].shape[0], -1)
                 for k, _shape in entries]
        if out is None:
            dst[g] = np.concatenate(parts, axis=1)
        else:
            np.concatenate(parts, axis=1, out=dst[g])
    return dst


class HostStager:
    """Persistent host staging buffers for h2d transfers.

    Reusing the SAME host buffers keeps networked/tunneled PJRT clients
    fast: their per-transfer cost grows with the number of DISTINCT host
    buffers ever transferred (measured on the axon tunnel: fresh 8 MB
    buffers degrade from 10 to ~190 ms/transfer within ~100 calls; one
    reused buffer holds ~6 ms indefinitely).

    Reuse safety depends on the backend's argument-ingestion semantics.
    Accelerator clients copy (or fully stage) arguments at call time —
    verified on the TPU tunnel by overwriting a numpy arg right after an
    async dispatch with 8 in flight, without corruption. The CPU backend,
    however, ZERO-COPY-BORROWS aligned numpy buffers for the duration of
    the computation, so a slot may only be overwritten once every step
    that consumed it has completed. Callers with K async steps in flight
    must therefore use depth >= K+1 (slot for step i+1 was last used by
    step i+1-depth, which a K-bounded dispatch queue has already retired).
    """

    def __init__(self, depth: int = 2):
        self._slots = None
        self._depth = depth
        self._i = 0

    def pack(self, batch: Dict[str, np.ndarray], layout):
        if self._slots is None:
            first = pack_batch(batch, layout)
            self._slots = [
                {g: np.empty_like(b) for g, b in first.items()}
                for _ in range(self._depth)]
            np_copy = self._slots[0]
            for g, b in first.items():
                np.copyto(np_copy[g], b)
            self._i = 1
            return np_copy
        slot = self._slots[self._i % self._depth]
        self._i += 1
        b0 = next(iter(batch.values()))
        if next(iter(slot.values())).shape[0] != b0.shape[0]:
            return pack_batch(batch, layout)  # e.g. last partial batch
        return pack_batch(batch, layout, out=slot)

    def stage(self, packed: Dict[str, np.ndarray]):
        """Copy an already-packed dict into the rotating pinned buffers."""
        if self._slots is None:
            self._slots = [
                {g: np.empty_like(b) for g, b in packed.items()}
                for _ in range(self._depth)]
        slot = self._slots[self._i % self._depth]
        self._i += 1
        for g, b in packed.items():
            if slot[g].shape != b.shape:
                return packed
            np.copyto(slot[g], b)
        return slot


def unpack_batch(packed, layout):
    batch = {}
    for g, entries in layout.items():
        buf = packed[g]
        off = 0
        for k, shape in entries:
            n = int(np.prod(shape[1:]))
            # leading dim from the buffer, not the template: under a
            # multi-process mesh the jitted step sees the GLOBAL batch
            # while the layout was built from a local-batch template
            batch[k] = jax.lax.slice_in_dim(buf, off, off + n,
                                            axis=1).reshape(
                                                (buf.shape[0],) + shape[1:])
            off += n
    return batch


def make_train_step(cfg: SASSDConfig, anchors, tx,
                    mesh=None, packed_layout=None, bev_shard=None,
                    forward_fn=None):
    """Build the jitted train step (donates params/state/opt_state).

    packed_layout: optional batch_pack_layout(...) — the step then takes a
    pack_batch()-ed dict (one buffer per dtype) and unpacks on device.
    bev_shard: optional NamedSharding for the dense BEV stage (spatial
    sharding; parallel/spatial.py wraps this).
    forward_fn: alternative train forward with detector.forward_train's
    signature (the banded spatial sharding hooks in here) — the step body
    (guard, donation, packing) is shared either way."""
    if forward_fn is None:
        forward_fn = detector.forward_train
    if mesh is not None and cfg.model.flat_batch:
        import dataclasses as _dc
        # flat-batch merges the batch axis into conv rows, which under a
        # data-SHARDED global batch makes every plan gather address a
        # row-sharded operand (SPMD inserts all-gathers and reorders
        # reductions). Flat batching is a per-device execution mode; under
        # a mesh the per-device batch runs the vmap path unchanged.
        cfg = _dc.replace(cfg, model=_dc.replace(cfg.model,
                                                 flat_batch=False))

    def step(params, state, opt_state, batch):
        if packed_layout is not None:
            batch = unpack_batch(batch, packed_layout)
        def loss_fn(p):
            losses, new_state = forward_fn(
                p, state, batch, anchors, cfg, bev_sharding=bev_shard)
            total, _ = detector.parse_losses(losses)
            return total, (losses, new_state)

        grads, (losses, new_state) = jax.grad(
            loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        # Skip non-finite updates entirely (params, BN state AND optimizer
        # moments): one pathological batch otherwise poisons the run — inf
        # grads turn into NaN through clip_by_global_norm and every later
        # checkpoint is garbage. The reference has no such guard.
        gnorm = optax.global_norm(grads)
        ok = jnp.isfinite(gnorm) & jnp.isfinite(
            sum(jnp.sum(v) for v in losses.values()))

        def keep_if_ok(new, old):
            return jax.tree_util.tree_map(
                lambda n, o: jnp.where(ok, n, o), new, old)

        new_params = keep_if_ok(new_params, params)
        new_state = keep_if_ok(new_state, state)
        new_opt = keep_if_ok(new_opt, opt_state)
        metrics = dict(losses)
        # parse_losses, NOT sum(values()): the losses dict also carries
        # pure metrics (guided_truncated is a dropped-anchor COUNT) that
        # must not inflate the logged training loss
        metrics["loss"], _ = detector.parse_losses(losses)
        metrics["grad_norm"] = gnorm
        metrics["nonfinite_skips"] = 1.0 - ok.astype(jnp.float32)
        return new_params, new_state, new_opt, metrics

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        return jax.jit(step,
                       in_shardings=(repl, repl, repl, data),
                       out_shardings=(repl, repl, repl, repl),
                       donate_argnums=(0, 1, 2))
    return jax.jit(step, donate_argnums=(0, 1, 2))


def make_strategy_train_step(cfg: SASSDConfig, anchors, tx, mesh=None,
                             packed_layout=None, logger=None):
    """Dispatch the train step on cfg.parallel.strategy (ParallelConfig):
    'data' (pure DP), 'spatial' (dense-BEV H-sharding), or 'banded'
    (sparse-stage y-band sharding). The non-data strategies require a mesh
    whose 'spatial' axis matches cfg.parallel.spatial (tools/train.py
    builds it from the config)."""
    strategy = cfg.parallel.strategy
    if strategy == "data" or cfg.parallel.spatial <= 1:
        if strategy != "data" and (logger or logging.getLogger("sassd")):
            (logger or logging.getLogger("sassd")).warning(
                "parallel.strategy=%r but parallel.spatial=%d; running "
                "pure data-parallel", strategy, cfg.parallel.spatial)
        return make_train_step(cfg, anchors, tx, mesh,
                               packed_layout=packed_layout)
    if mesh is None or "spatial" not in mesh.shape \
            or mesh.shape["spatial"] != cfg.parallel.spatial:
        raise ValueError(
            f"parallel.strategy={strategy!r} needs a mesh with a "
            f"'spatial' axis of size {cfg.parallel.spatial} "
            f"(got {None if mesh is None else dict(mesh.shape)}); build it "
            f"with parallel.mesh.make_mesh(spatial=cfg.parallel.spatial)")
    if strategy == "spatial":
        from sassd_tpu.parallel.spatial import make_spatial_train_step
        return make_spatial_train_step(cfg, anchors, tx, mesh,
                                       packed_layout=packed_layout)
    if strategy == "banded":
        from sassd_tpu.parallel import sparse_spatial as ss
        spec = ss.make_band_spec(cfg, s=cfg.parallel.spatial,
                                 cap_margin=cfg.parallel.band_cap_margin,
                                 halo=cfg.parallel.band_halo)
        return ss.make_banded_train_step(cfg, anchors, tx, mesh, spec,
                                         packed_layout=packed_layout)
    raise ValueError(f"unknown parallel.strategy {strategy!r}")


class LogBuffer:
    """Running averages flushed every `interval` iters (mmcv LogBuffer).

    Sums accumulate as device scalars (async adds, no host sync); the only
    host transfer happens in `averages()` at flush time — on networked
    accelerators a per-step device_get costs a full round trip.
    """

    def __init__(self):
        self.sums: Dict[str, object] = {}
        self.counts: Dict[str, int] = {}

    def update(self, metrics):
        for k, v in metrics.items():
            self.sums[k] = v if k not in self.sums else self.sums[k] + v
            self.counts[k] = self.counts.get(k, 0) + 1

    def averages(self) -> Dict[str, float]:
        host = jax.device_get(self.sums)
        return {k: float(host[k]) / max(self.counts[k], 1) for k in host}

    def clear(self):
        self.sums.clear()
        self.counts.clear()


def train_model(cfg: SASSDConfig, dataset, *, work_dir: Optional[str] = None,
                total_epochs: Optional[int] = None, mesh=None,
                logger: Optional[logging.Logger] = None,
                resume: bool = True, epoch_callback=None,
                eval_interval: Optional[int] = None,
                epochs_per_run: Optional[int] = None):
    """Full training run. Returns (params, state, final_step).

    epoch_callback(epoch, params, state): optional hook run after each
    checkpointed epoch (the analog of the reference's KittiEvalmAPHook,
    eval_hooks.py:190+ — which is bitrotted there); eval_interval gates it.

    epochs_per_run: bound this PROCESS to N epochs and return, while the
    optimizer schedule stays pinned to total_epochs — for preemptible or
    leak-prone hosts, an outer loop relaunches the process and checkpoint
    resume continues exactly where it stopped (the reference has no analog:
    its resume is unwired, train.py:92).
    """
    logger = logger or logging.getLogger("sassd")
    work_dir = work_dir or cfg.work_dir
    total_epochs = total_epochs or cfg.train.total_epochs
    bs = cfg.train.batch_size
    num_hosts, host_id = mesh_lib.host_shard_info()
    if bs % num_hosts:
        raise ValueError(
            f"global batch_size {bs} not divisible by {num_hosts} hosts")
    local_bs = bs // num_hosts
    if num_hosts > 1 and mesh is None:
        raise ValueError("multi-process training requires a device mesh")
    if mesh is not None and bs % mesh.shape["data"]:
        raise ValueError(
            f"global batch_size {bs} not divisible by the mesh's data axis "
            f"({mesh.shape['data']} = devices/spatial); raise batch_size or "
            f"parallel.spatial")
    # epoch_indices pads (by wrapping) to a multiple of the global batch, so
    # every host sees the same number of steps: ceil(N / global_bs).
    steps_per_epoch = max(-(-len(dataset) // bs), 1)
    total_steps = steps_per_epoch * total_epochs

    anchors = jnp.asarray(dataset.anchors)
    params, state = detector.detector_init(
        jax.random.PRNGKey(cfg.train.seed), cfg)
    tx = optim_lib.make_optimizer(cfg.train, total_steps)
    opt_state = tx.init(params)

    start_epoch, step, start_batch = 0, 0, 0
    if cfg.load_from:
        params = ckpt_lib.load_params_only(cfg.load_from, params)
        logger.info("loaded params from %s", cfg.load_from)
    ckpt_path = cfg.resume_from or (
        ckpt_lib.latest_checkpoint(work_dir) if resume else None)
    if ckpt_path:
        params, state, opt_state, start_epoch, step, bidx = ckpt_lib.restore(
            ckpt_path, params, state, opt_state)
        if bidx >= 0:          # mid-epoch save: restart the SAME epoch,
            start_batch = bidx  # fast-forwarding past consumed batches
        else:
            start_epoch += 1
        logger.info("resumed from %s (epoch %d, step %d, batch %d)",
                    ckpt_path, start_epoch, step, start_batch)

    if mesh is not None:
        params, state, opt_state = (mesh_lib.replicate(mesh, t)
                                    for t in (params, state, opt_state))
    # pack each batch into one h2d buffer per dtype (see batch_pack_layout)
    from sassd_tpu.data.loader import collate
    layout = batch_pack_layout(collate([dataset[0]] * local_bs)[0])
    train_step = make_strategy_train_step(cfg, anchors, tx, mesh,
                                          packed_layout=layout,
                                          logger=logger)

    end_epoch = total_epochs
    if epochs_per_run is not None:
        end_epoch = min(total_epochs, start_epoch + epochs_per_run)

    from sassd_tpu.data.loader import iterate_batches
    buf = LogBuffer()
    # Bound the async-dispatch depth. When the host leg is faster than the
    # device step, an unthrottled loop enqueues steps faster than the device
    # retires them; the in-flight queue then grows without bound and the
    # runtime's per-dispatch cost grows with queue depth (measured on the
    # tunneled client: cadence creeping 0.4 -> 2.5 s/step while the blocked
    # step is a steady 0.28 s). Blocking on the (i-K)-th step's loss keeps
    # K steps in flight — full overlap, bounded queue.
    import collections as _collections
    inflight: "_collections.deque" = _collections.deque()
    max_inflight = max(getattr(cfg.train, "max_inflight_steps", 2), 1)
    # depth = K+1: a slot is only rewritten after the step that borrowed
    # it has retired (required on the zero-copy CPU backend; see HostStager)
    stager = HostStager(depth=max_inflight + 1)
    every = getattr(cfg.train, "checkpoint_every_steps", 0) or 0
    for epoch in range(start_epoch, end_epoch):
        t0 = time.time()
        bidx = start_batch
        truncation_warned = False        # warn at most once per epoch
        for batch, _metas in iterate_batches(
                dataset, local_bs, epoch=epoch, seed=cfg.train.seed,
                shuffle=True, num_shards=num_hosts, shard_id=host_id,
                num_workers=cfg.data.num_workers, start_batch=start_batch):
            packed = stager.pack(batch, layout)
            dev_batch = (mesh_lib.shard_batch(mesh, packed)
                         if mesh is not None else packed)
            params, state, opt_state, metrics = train_step(
                params, state, opt_state, dev_batch)
            inflight.append(metrics["loss"])
            if len(inflight) > max_inflight:
                jax.block_until_ready(inflight.popleft())
            step += 1
            bidx += 1
            if every and bidx < steps_per_epoch and step % every == 0:
                if host_id == 0:
                    path = ckpt_lib.save(work_dir, epoch, step,
                                         jax.device_get(params),
                                         jax.device_get(state),
                                         jax.device_get(opt_state),
                                         max_keep=cfg.train.max_ckpt_keep,
                                         batch_idx=bidx)
                    logger.info("saved %s", path)
                dist.barrier(f"ckpt_step_{step}")
            buf.update(metrics)          # device scalars; no per-step sync
            if step % cfg.train.log_interval == 0:
                avg = buf.averages()
                lr, mom = optim_lib.current_hyperparams(opt_state)
                msg = " ".join(f"{k}={v:.4f}" for k, v in sorted(avg.items()))
                logger.info("epoch %d step %d lr %.5f mom %.3f %s",
                            epoch, step, lr, mom, msg)
                # the reference keeps EVERY anchor passing score>thr
                # (ssd_rotate_head.py:307-372); sustained truncation by
                # caps.guided_train diverges from that semantics — surface
                # it loudly, once per epoch (VALIDATION.md measured
                # guided_train=1280 as the zero-truncation setting)
                if (avg.get("guided_truncated", 0.0) > 0.5
                        and not truncation_warned):
                    truncation_warned = True
                    logger.warning(
                        "guided-anchor truncation: %.1f anchors/sample "
                        "dropped by caps.guided_train=%d this window — "
                        "the reference keeps all passing anchors; raise "
                        "guided_train (1280 measured truncation-free on "
                        "KITTI-density scenes, VALIDATION.md) for parity",
                        avg["guided_truncated"], cfg.caps.guided_train)
                buf.clear()
        start_batch = 0                  # fast-forward applies once
        logger.info("epoch %d done in %.1fs", epoch, time.time() - t0)
        if ((epoch + 1) % cfg.train.checkpoint_interval == 0
                or epoch == end_epoch - 1):
            if host_id == 0:   # params are replicated; one writer suffices
                path = ckpt_lib.save(work_dir, epoch, step,
                                     jax.device_get(params),
                                     jax.device_get(state),
                                     jax.device_get(opt_state),
                                     max_keep=cfg.train.max_ckpt_keep)
                logger.info("saved %s", path)
            dist.barrier(f"ckpt_epoch_{epoch}")
        if (epoch_callback is not None
                and (epoch + 1) % (eval_interval or 1) == 0):
            epoch_callback(epoch, params, state)
    return params, state, step
