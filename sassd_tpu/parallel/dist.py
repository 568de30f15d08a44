"""Multi-process (multi-host) runtime: initialization, barriers, gathers.

TPU-native replacement for the reference's NCCL process-group stack
(/root/reference/tools/env.py:12-30 init_dist, tools/dist_train.sh:5
torch.distributed.launch, mmdet/core/utils/dist_utils.py:9-41 coalesced
all-reduce): one `jax.distributed.initialize` call connects the hosts, after
which every collective is compiled by XLA into the jitted step (gradient
psum over ICI/DCN) — there is no hand-written gradient sync to maintain.

Host-side exchange of non-array results (eval annos) uses the filesystem
plus a device barrier, the structured analog of the reference's pkl-file
barrier in DistEvalHook (mmdet/core/evaluation/eval_hooks.py:39-55).
"""
from __future__ import annotations

import os
import pickle
import time
from pathlib import Path
from typing import List, Optional

import jax


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Connect this process to the training job.

    With no arguments, defers to jax.distributed's cluster auto-detection
    (TPU pod metadata / standard env vars). On the CPU backend (tests,
    virtual multi-host), selects the gloo collectives implementation first —
    required for cross-process psum to work off-TPU.
    """
    # NOTE: must not touch the backend here (jax.devices/process_count would
    # initialize XLA and make jax.distributed.initialize fail), so the
    # already-initialized check and the cpu detection are config/env only.
    try:
        if jax.distributed.is_initialized():
            return
    except AttributeError:
        # older jaxlib: no public probe; fall back to the error message of
        # a second initialize() call (caught below)
        pass
    platforms = (jax.config.jax_platforms
                 or os.environ.get("JAX_PLATFORMS", ""))
    if "cpu" in str(platforms):
        # cross-process collectives off-TPU need the gloo implementation
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    kwargs = {}
    if coordinator_address is not None:
        kwargs.update(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:
        if "already initialized" not in str(e):
            raise
        return
    if jax.process_count() > 1:
        # Force the collective-backend context rendezvous NOW, while every
        # process sits at the same startup point. Gloo's context handshake
        # has a fixed ~30 s key-exchange deadline baked into jaxlib; if the
        # first collective instead fires deep inside training (after
        # skewed compile times on loaded hosts) the rendezvous can miss it.
        # The context is cached, so later collectives never re-rendezvous.
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices("sassd_dist_init")


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def is_primary() -> bool:
    return jax.process_index() == 0


def barrier(name: str) -> None:
    """Block until every process reaches this point (device-level sync)."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices(name)


_GATHER_ROUND = 0
_DEFERRED_CLEANUP: List[Path] = []


def _file_barrier(d: Path, name: str, n: int, pid: int,
                  deadline: float) -> None:
    """Barrier over a shared directory with a hard deadline.

    Unlike sync_global_devices, a process that died before reaching the
    barrier makes every OTHER process raise TimeoutError instead of wedging
    the job — the failure propagates (a dead rank can never satisfy the
    file count, and the deadline bounds the wait)."""
    mine = d / f"{name}_rank{pid}.done"
    mine.touch()
    missing = [d / f"{name}_rank{i}.done" for i in range(n) if i != pid]
    while missing:
        missing = [p for p in missing if not p.exists()]
        if missing and time.time() > deadline:
            raise TimeoutError(
                f"barrier {name}: ranks "
                f"{[str(p) for p in missing]} never arrived")
        if missing:
            time.sleep(0.1)


def gather_objects(obj, exchange_dir, tag: str = "gather",
                   timeout: float = 600.0) -> Optional[List]:
    """All-to-primary gather of arbitrary picklables via a shared directory.

    Every process writes its part; the primary reads them back in process
    order and returns the list (other processes return None). `exchange_dir`
    must be on a filesystem visible to all hosts (the work_dir convention,
    as in the reference's DistEvalHook eval_hooks.py:39-55).

    Synchronization uses deadline-protected file barriers, not device
    collectives: if any process dies mid-gather, every surviving rank
    raises TimeoutError after `timeout` seconds rather than blocking
    forever inside sync_global_devices.
    """
    global _GATHER_ROUND
    n, pid = jax.process_count(), jax.process_index()
    if n == 1:
        return [obj]
    # every process calls gather_objects in the same program order, so a
    # local counter yields globally-consistent unique names per round
    # (stale .done files from earlier rounds can't satisfy this barrier)
    rnd = _GATHER_ROUND
    _GATHER_ROUND += 1
    tag = f"{tag}_r{rnd}"
    deadline = time.time() + timeout
    d = Path(exchange_dir)
    d.mkdir(parents=True, exist_ok=True)
    part = d / f"{tag}_part{pid}.pkl"
    tmp = str(part) + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(obj, f)
    os.replace(tmp, part)
    _file_barrier(d, f"{tag}_written", n, pid, deadline)
    out = None
    if pid == 0:
        out = []
        for i in range(n):
            p = d / f"{tag}_part{i}.pkl"
            with open(p, "rb") as f:
                out.append(pickle.load(f))
    _file_barrier(d, f"{tag}_read", n, pid, deadline)
    if pid == 0:
        # safe now: every rank passed the written barrier (proven by the
        # read barrier), so parts and written-markers can't be re-polled.
        # This round's read-markers may STILL be polled by slow ranks —
        # defer their deletion to the next gather (by which time every rank
        # has provably exited this one).
        for i in range(n):
            (d / f"{tag}_part{i}.pkl").unlink(missing_ok=True)
            (d / f"{tag}_written_rank{i}.done").unlink(missing_ok=True)
        for p in _DEFERRED_CLEANUP:
            p.unlink(missing_ok=True)
        _DEFERRED_CLEANUP.clear()
        _DEFERRED_CLEANUP.extend(
            d / f"{tag}_read_rank{i}.done" for i in range(n))
    return out
