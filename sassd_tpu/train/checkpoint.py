"""Checkpoint save / restore with real resume.

Equivalent of checkpoint_state/save_checkpoint/load_params_from_file
(/root/reference/tools/train_utils/__init__.py:103-180) with the reference's
known gap fixed: the reference defines `resume_from` in its configs but
hardcodes start_epoch = it = 0 (train.py:92); here `latest_checkpoint` +
`restore` return the saved (epoch, step) so the one-cycle schedule continues
exactly where it stopped.

Format: one msgpack file per checkpoint (flax.serialization) holding
{params, state, opt_state, epoch, step}; rolling window of the newest
`max_keep` files (train.py:36 --max_ckpt_save_num).
"""
from __future__ import annotations

import os
import re
from pathlib import Path
from typing import Any, Optional, Tuple

import jax
import numpy as np
from flax import serialization

_NAME = re.compile(r"checkpoint_epoch_(\d+)(?:_step_(\d+))?\.msgpack$")


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def _sort_key(path: str):
    """Chronological order: mid-epoch saves of epoch E precede its
    end-of-epoch save."""
    m = _NAME.search(path)
    batch = int(m.group(2)) if m.group(2) else 1 << 30
    return (int(m.group(1)), batch)


def save(work_dir: str, epoch: int, step: int, params, state, opt_state,
         max_keep: int = 10, batch_idx: Optional[int] = None) -> str:
    """Write a checkpoint and prune old ones.

    batch_idx: when given, this is a MID-EPOCH save after `batch_idx`
    batches of `epoch` — resume restarts the same epoch, fast-forwarding
    the (deterministic) loader order past the consumed batches. Without
    it the save marks the epoch complete (resume starts at epoch+1)."""
    Path(work_dir).mkdir(parents=True, exist_ok=True)
    payload = dict(params=_to_host(params), state=_to_host(state),
                   opt_state=serialization.to_state_dict(_to_host(opt_state)),
                   epoch=epoch, step=step,
                   batch_idx=-1 if batch_idx is None else int(batch_idx))
    name = (f"checkpoint_epoch_{epoch}.msgpack" if batch_idx is None
            else f"checkpoint_epoch_{epoch}_step_{batch_idx}.msgpack")
    path = Path(work_dir) / name
    tmp = str(path) + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.msgpack_serialize(payload))
    os.replace(tmp, path)

    ckpts = sorted(list_checkpoints(work_dir), key=lambda p: _sort_key(p[1]))
    # mid-epoch (crash-resilience) saves are superseded the moment any later
    # checkpoint exists: drop them first so the rolling max_keep window holds
    # end-of-epoch snapshots (the AP-curve artifacts), not step files.
    # The file just written is never stale, even when the work_dir already
    # holds chronologically later checkpoints (e.g. --resume_from an older
    # checkpoint in the same dir): deleting it would make this save a no-op
    # and return a path to a nonexistent file.
    latest = _sort_key(ckpts[-1][1])
    stale = [(e, p) for e, p in ckpts
             if _sort_key(p)[1] != 1 << 30 and _sort_key(p) != latest
             and p != str(path)]
    for e, p in stale:
        os.remove(p)
    ckpts = [c for c in ckpts if c not in stale]
    for e, p in ckpts[:-max_keep]:
        if p != str(path):
            os.remove(p)
    return str(path)


def list_checkpoints(work_dir: str):
    out = []
    for p in Path(work_dir).glob("checkpoint_epoch_*.msgpack"):
        m = _NAME.search(str(p))
        if m:
            out.append((int(m.group(1)), str(p)))
    return out


def latest_checkpoint(work_dir: str) -> Optional[str]:
    ckpts = sorted(list_checkpoints(work_dir), key=lambda p: _sort_key(p[1]))
    return ckpts[-1][1] if ckpts else None


def restore(path: str, params_like, state_like, opt_state_like
            ) -> Tuple[Any, Any, Any, int, int, int]:
    """Load a checkpoint into the shape of freshly-initialized pytrees.

    Returns (params, state, opt_state, epoch, step, batch_idx); batch_idx
    is -1 for end-of-epoch checkpoints (see save). Like the reference's
    load_params_from_file (:154-180), parameter shapes are validated by
    construction (from_state_dict fails loudly on mismatch).
    """
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    params = serialization.from_state_dict(params_like, payload["params"])
    state = serialization.from_state_dict(state_like, payload["state"])
    opt_state = serialization.from_state_dict(opt_state_like,
                                              payload["opt_state"])
    return (params, state, opt_state, int(payload["epoch"]),
            int(payload["step"]), int(payload.get("batch_idx", -1)))


def load_params_only(path: str, params_like):
    """Partial load for fine-tuning (load_from semantics)."""
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    return serialization.from_state_dict(params_like, payload["params"])
