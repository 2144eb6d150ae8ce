"""Misc host utilities (parity: `cs_vit/utils/misc.py`, `utils/tensor.py`).

torch-free: device transfer is jax.device_put/shard_batch (parallel.mesh);
memory stats use jax array nbytes.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple, Union

import numpy as np


def brief_dict(output: dict, prefix: str = ""):
    """Print a one-line summary per entry of a (nested) result dict."""
    for k, v in output.items():
        if hasattr(v, "shape"):
            kind = type(v).__name__
            print(f"{prefix}{k}: {kind}, {list(v.shape)}")
        elif isinstance(v, (str, int, float, list, tuple)):
            print(f"{prefix}{k}: {type(v).__name__}, {v}")
        elif v is None:
            print(f"{prefix}{k}: None")
        elif isinstance(v, dict):
            brief_dict(v, f"{prefix}{k}.")
        else:
            print(f"{prefix}{k}: {type(v).__name__}")


def to_tuple(x: Union[Any, Tuple]) -> Tuple:
    return x if isinstance(x, tuple) else (x, x)


def get_array_memory(arr) -> int:
    """Bytes held by one array."""
    if hasattr(arr, "nbytes"):
        return int(arr.nbytes)
    return int(np.asarray(arr).nbytes)


def stat_tree_memory(tree: Dict) -> Dict[str, int]:
    """Total/leaf-count memory stats for a pytree of arrays."""
    import jax

    leaves = jax.tree.leaves(tree)
    total = sum(get_array_memory(x) for x in leaves)
    return {"total_bytes": total, "num_arrays": len(leaves)}


def calculate_gradient_norm(grads, compat: bool = True) -> float:
    """Gradient-norm summary of a pytree.

    ``compat=True`` replicates the reference's logging quirk
    (`cs_vit/utils/tensor.py:10`): sum of squared per-leaf norms times 0.5
    (NOT the square root). ``compat=False`` gives the true global L2 norm.
    """
    import jax
    import jax.numpy as jnp

    sq = sum(float(jnp.sum(jnp.square(g))) for g in jax.tree.leaves(grads))
    if compat:
        return sq * 0.5
    return float(np.sqrt(sq))
