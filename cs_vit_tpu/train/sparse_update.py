"""Column-random-update optimizer (optax port of `cs_vit/net/optim.py:6-31`).

The reference's sparse-update experiment: before each AdamW step, the
gradient of every 2-D weight is masked to a random subset of its input
columns. Implemented as an optax gradient transformation chained before
AdamW, with the column draw derived from a counter-keyed PRNG (pure, so the
step stays jittable and reproducible).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def mask_random_columns(num_columns_to_update: int, seed: int = 0) -> optax.GradientTransformation:
    """Zero all but `num_columns_to_update` random input-columns of 2D grads."""

    def init_fn(params):
        del params
        return {"count": jnp.zeros((), jnp.int32)}

    def update_fn(updates, state, params=None):
        del params
        count = state["count"]
        leaves, treedef = jax.tree.flatten(updates)

        def mask_leaf(i, g):
            if g.ndim != 2:
                return g
            in_features = g.shape[1]
            k = min(num_columns_to_update, in_features)
            key = jax.random.fold_in(jax.random.key(seed), count * 131071 + i)
            perm = jax.random.permutation(key, in_features)
            chosen = perm[:k]
            mask = jnp.zeros((in_features,), g.dtype).at[chosen].set(1.0)
            return g * mask[None, :]

        new_leaves = [mask_leaf(i, g) for i, g in enumerate(leaves)]
        return jax.tree.unflatten(treedef, new_leaves), {"count": count + 1}

    return optax.GradientTransformation(init_fn, update_fn)


def column_random_update_adamw(
    learning_rate,
    num_columns_to_update: int,
    seed: int = 0,
    **adamw_kwargs,
) -> optax.GradientTransformation:
    """AdamW whose 2-D weights update only a random column subset per step."""
    return optax.chain(
        mask_random_columns(num_columns_to_update, seed),
        optax.adamw(learning_rate, **adamw_kwargs),
    )
