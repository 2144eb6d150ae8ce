"""Device mesh construction and sharding helpers.

The reference scales with DDP over NCCL (`scripts/finetune.py:133-135`); the
TPU-native equivalent is a 1-D ``data`` mesh with the batch sharded across it
and parameters replicated — XLA inserts the gradient all-reduce over ICI.
A second ``model`` axis is plumbed through for tensor-parallel experiments;
parity only requires data parallelism (SURVEY.md §2.7).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, model) mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model == len(devices), (
        f"mesh {n_data}x{n_model} != {len(devices)} devices"
    )
    arr = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def fitting_mesh(batch_size: int, devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Largest data mesh whose size divides `batch_size` (subset of devices).

    Keeps the jitted step valid for any batch size; with well-chosen batches
    (divisible by device count) this is the full mesh.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    while n > 1 and batch_size % n != 0:
        n -= 1
    return make_mesh(n_data=n, devices=devices[:n])


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Place a host batch dict onto the mesh, sharded along axis 0."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate_state(state: Any, mesh: Mesh) -> Any:
    """Replicate a pytree (params/opt state) across the mesh."""
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), state)


def process_local_batch_slice(global_batch: int) -> slice:
    """Deterministic per-host shard of a global batch (multihost data loading).

    Replaces torch DistributedSampler (`scripts/finetune.py:109`): host i of N
    reads rows [i*B/N, (i+1)*B/N).
    """
    n = jax.process_count()
    i = jax.process_index()
    per = global_batch // n
    return slice(i * per, (i + 1) * per)
