"""Tensor-parallel (model-axis) parameter sharding via GSPMD.

Beyond-reference scaling (SURVEY.md §2.7: the reference only has DDP): the
Poser's big matmuls are sharded Megatron-style over the mesh ``model`` axis
and XLA's GSPMD partitioner inserts the collectives. Column-parallel layers
(q/k/v projections, MLP up-projections) split their output features; the
row-parallel layers that consume them (attention out-proj, MLP
down-projections) split their input features, so one all-reduce per pair
rides the ICI. Everything else (LayerNorms, biases of row-parallel layers,
CPB tables, heads, MANO) stays replicated.

Mechanics: params are ``device_put`` with these shardings and the optimizer
state is created *under jit from the sharded params* (so Adam moments inherit
the layout for free); the plain global-jit train step then compiles to a
tensor-parallel program — GSPMD semantics are global, so no step-code changes
and bitwise-level parity with the single-device step (up to reduction order).
Requires ``attention_impl="xla"``: a ``pallas_call`` has no model-axis
partitioning rule (the fused kernel remains the single-chip/data-parallel
fast path; TP targets memory- and latency-bound serving).
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import MODEL_AXIS

# module names whose Dense kernels split by output features (column-parallel)
_COL = {"query", "key", "value", "intermediate", "fc1"}
# ... and by input features (row-parallel; GSPMD psums their partial outputs)
_ROW = {"proj", "output", "fc2"}


def _path_names(path) -> list:
    out = []
    for k in path:
        out.append(getattr(k, "key", getattr(k, "name", str(k))))
    return out


def poser_param_specs(params: Any, n_model: int) -> Any:
    """PartitionSpec tree for a Poser/SwinV2 param tree.

    Only 2-D kernels (and column-parallel biases) of the known projection
    modules shard, and only when the split dimension is divisible by the
    model-axis size — everything else replicates, which GSPMD handles
    correctly (shardings are layout hints, not semantics).
    """

    def spec(path, leaf):
        names = _path_names(path)
        if len(names) < 2 or not hasattr(leaf, "ndim"):
            return P()
        mod, p = names[-2], names[-1]
        if mod in _COL:
            if p == "kernel" and leaf.ndim == 2 and leaf.shape[1] % n_model == 0:
                return P(None, MODEL_AXIS)
            if p == "bias" and leaf.ndim == 1 and leaf.shape[0] % n_model == 0:
                return P(MODEL_AXIS)
        if mod in _ROW and p == "kernel" and leaf.ndim == 2:
            if leaf.shape[0] % n_model == 0:
                return P(MODEL_AXIS, None)
        return P()

    return jax.tree_util.tree_map_with_path(spec, params)


def shard_params_tp(params: Any, mesh: Mesh) -> Any:
    """Place a param tree on the mesh with Megatron-style model sharding."""
    n_model = mesh.shape.get(MODEL_AXIS, 1)
    specs = poser_param_specs(params, n_model)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def init_opt_state_sharded(tx, params: Any) -> Any:
    """tx.init under jit so Adam moments inherit the params' shardings."""
    return jax.jit(tx.init)(params)


def shard_state_tp(state: Any, tx, mesh: Mesh) -> Any:
    """Re-place a TrainState for tensor-parallel execution on ``mesh``.

    Params get the Megatron shardings; the optimizer state mirrors them (the
    moments of a jit-traced ``tx.init`` over the sharded params inherit their
    layout); scalar leaves (Adam counts, the step counter) and BatchNorm
    stats replicate. Works for both fresh and checkpoint-restored states —
    restored values are ``device_put`` onto the reference layout.
    """
    params = shard_params_tp(state.params, mesh)
    ref_opt = init_opt_state_sharded(tx, params)
    rep = NamedSharding(mesh, P())

    def put(v, r):
        sh = r.sharding
        if not (isinstance(sh, NamedSharding) and sh.mesh == mesh):
            sh = rep  # scalars/counters fall out of jit on the default device
        return jax.device_put(v, sh)

    opt_state = jax.tree.map(put, state.opt_state, ref_opt)
    return state.replace(
        params=params,
        batch_stats=jax.tree.map(
            lambda x: jax.device_put(x, rep), state.batch_stats
        ),
        opt_state=opt_state,
        step=jax.device_put(state.step, rep),
    )
