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


def _lookup_raw(node, key):
    """Navigate one pytree-path step into a raw (dict-shaped) orbax restore.

    Raw restores render NamedTuples/tuples as dicts keyed by field name /
    stringified index, so each jax key type gets a couple of fallbacks.
    Returns ``(found, child)``.
    """
    ku = jax.tree_util
    if isinstance(key, ku.DictKey):
        if isinstance(node, dict):
            for k in (key.key, str(key.key)):
                if k in node:
                    return True, node[k]
        return False, None
    if isinstance(key, ku.SequenceKey):
        if isinstance(node, (list, tuple)) and key.idx < len(node):
            return True, node[key.idx]
        if isinstance(node, dict):
            for k in (key.idx, str(key.idx)):
                if k in node:
                    return True, node[k]
        return False, None
    if isinstance(key, (ku.GetAttrKey, ku.FlattenedIndexKey)):
        name = key.name if isinstance(key, ku.GetAttrKey) else key.key
        if isinstance(node, dict):
            for k in (name, str(name)):
                if k in node:
                    return True, node[k]
        if isinstance(name, str) and hasattr(node, name):
            return True, getattr(node, name)
        return False, None
    return False, None


def merge_restored_tree(target, raw) -> Tuple[Any, list]:
    """strict=False merge of a raw orbax restore into an arbitrary pytree.

    ``merge_params`` only handles plain dict trees; optimizer state is nested
    NamedTuples (optax chains), whose *structure* can change across releases
    of this codebase (e.g. the stateful grad-norm clip added a ``grad_norm``
    leaf where optax's clip had ``EmptyState``). Restoring such a checkpoint
    against the new abstract target would fail with an orbax tree mismatch,
    so resume instead restores the checkpoint raw (dict-shaped) and walks the
    *target* structure here: every target leaf whose path resolves in the raw
    tree with a matching shape is adopted (cast to the target dtype); missing
    or mismatched leaves keep the freshly-initialised target value. Mirrors
    torch's ``load_state_dict(strict=False)`` semantics for the opt_state.

    Returns ``(merged_tree, kept_fresh_paths)``.
    """
    import jax.numpy as jnp

    paths_leaves, treedef = jax.tree_util.tree_flatten_with_path(target)
    out, fresh = [], []
    for path, leaf in paths_leaves:
        node, ok = raw, True
        for key in path:
            ok, node = _lookup_raw(node, key)
            if not ok:
                break
        adopt = (
            ok
            and isinstance(node, (np.ndarray, jax.Array, int, float, np.number))
            and tuple(np.shape(node)) == tuple(np.shape(leaf))
        )
        if adopt:
            if hasattr(leaf, "dtype"):
                out.append(jnp.asarray(node).astype(leaf.dtype))
            else:
                out.append(type(leaf)(node) if leaf is not None else node)
        else:
            out.append(leaf)
            fresh.append(jax.tree_util.keystr(path))
    return jax.tree_util.tree_unflatten(treedef, out), fresh
