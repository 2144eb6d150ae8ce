"""Checkpoint save/restore (orbax) with the reference's layout semantics.

Layout parity (`scripts/finetune.py:332-348`):
  checkpoints/<exp>/checkpoint_<E>/   orbax directory per epoch
  checkpoints/<exp>/checkpoint       symlink to the latest
  checkpoints/<exp>/config.json      experiment config (load-or-create)

Cross-phase transfer parity: ``merge_params`` implements torch's
``load_state_dict(..., strict=False)`` — copy intersecting paths with
matching shapes, keep everything else (used when the temporal phase starts
from a spatial checkpoint, `finetune.py:130-131`).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp
from flax.traverse_util import flatten_dict, unflatten_dict


def merge_params(template: Dict, loaded: Dict, log: bool = False) -> Tuple[Dict, list]:
    """strict=False merge: take `loaded` leaves whose path+shape match `template`."""
    t_flat = flatten_dict(template)
    l_flat = flatten_dict(loaded)
    skipped = []
    out = {}
    for k, v in t_flat.items():
        if k in l_flat and tuple(np.shape(l_flat[k])) == tuple(np.shape(v)):
            out[k] = l_flat[k]
        else:
            out[k] = v
            skipped.append("/".join(map(str, k)))
    return unflatten_dict(out), skipped


def _checkpointer() -> ocp.Checkpointer:
    return ocp.Checkpointer(ocp.PyTreeCheckpointHandler())


def save_checkpoint(ckpt_dir: str, epoch: int, payload: Dict[str, Any]) -> str:
    """Save `payload` under checkpoint_<epoch> and repoint the symlink."""
    ckpt_dir = os.path.abspath(ckpt_dir)
    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(ckpt_dir, f"checkpoint_{epoch}")
    _checkpointer().save(path, payload, force=True)
    link = os.path.join(ckpt_dir, "checkpoint")
    if os.path.islink(link) or os.path.exists(link):
        os.remove(link)
    os.symlink(f"checkpoint_{epoch}", link)
    return path


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    link = os.path.join(os.path.abspath(ckpt_dir), "checkpoint")
    if os.path.exists(link):
        return os.path.realpath(link)
    return None


def restore_checkpoint(path: str, target: Optional[Dict[str, Any]] = None) -> Dict:
    """Restore a checkpoint; `target` provides the abstract structure if given."""
    path = os.path.abspath(path)
    if target is not None:
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, target)
        return _checkpointer().restore(path, item=abstract)
    return _checkpointer().restore(path)
