"""Joint-order utilities (pure jax.numpy).

Parity: `cs_vit/utils/joint.py` (reorder via gather; mean bone length used to
denormalize the regressed root depth).
"""

from __future__ import annotations

from functools import lru_cache
from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=None)
def reorder_indices(origin: Tuple[str, ...], target: Tuple[str, ...]) -> np.ndarray:
    """Static index map such that joints[..., idx, :] is in `target` order."""
    if len(origin) != len(target):
        raise ValueError("Origin and target joint lists must have same length")
    if set(origin) != set(target):
        raise ValueError("Origin and target joint lists must contain same joints")
    origin_map = {name: idx for idx, name in enumerate(origin)}
    return np.asarray([origin_map[name] for name in target], dtype=np.int32)


def reorder_joints(
    joints: jnp.ndarray, origin: Sequence[str], target: Sequence[str]
) -> jnp.ndarray:
    """Reorder [..., J, D] joints from `origin` name order to `target` order."""
    idx = reorder_indices(tuple(origin), tuple(target))
    return jnp.take(joints, jnp.asarray(idx), axis=-2)


def mean_connection_length(
    joints: jnp.ndarray, connection: Sequence[Tuple[int, int]]
) -> jnp.ndarray:
    """Mean bone length over `connection` pairs; joints [..., J, 3] -> [...]."""
    conn = np.asarray(connection, dtype=np.int32)
    src = jnp.take(joints, jnp.asarray(conn[:, 0]), axis=-2)
    dst = jnp.take(joints, jnp.asarray(conn[:, 1]), axis=-2)
    return jnp.mean(jnp.linalg.norm(src - dst, axis=-1), axis=-1)
