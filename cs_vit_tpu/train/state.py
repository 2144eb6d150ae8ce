"""Train state container (params + batch stats + optimizer + counters)."""

from __future__ import annotations

from typing import Any, Dict

import flax.struct
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    params: Dict = flax.struct.field(pytree_node=True)
    batch_stats: Dict = flax.struct.field(pytree_node=True)
    opt_state: Any = flax.struct.field(pytree_node=True)
    step: jnp.ndarray = flax.struct.field(pytree_node=True)
    epoch: int = flax.struct.field(pytree_node=False, default=0)

    @classmethod
    def create(cls, variables: Dict, tx: optax.GradientTransformation) -> "TrainState":
        params = variables["params"]
        return cls(
            params=params,
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(params),
            step=jnp.zeros((), jnp.int32),
            epoch=0,
        )
