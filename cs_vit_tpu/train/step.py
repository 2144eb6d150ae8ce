"""Jitted data-parallel train/eval steps.

TPU-native replacement for the reference's DDP loop
(`scripts/finetune.py:193-288`): one compiled XLA program per phase that

* computes loss+grads with the batch sharded over the ``data`` mesh axis
  (XLA inserts the gradient all-reduce over ICI),
* skips non-finite losses *inside* the graph via ``lax.cond``
  (ref `finetune.py:221-223` skipped batches host-side),
* clips global grad norm at 5.0 and applies phase-masked AdamW,
* updates BatchNorm running stats only on accepted steps.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from .state import TrainState


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    phase: str,
    donate: bool = True,
    compute_dtype=None,
) -> Callable[[TrainState, Dict, jnp.ndarray], Tuple[TrainState, Dict]]:
    """Build the jitted train step for `phase` ('spatial' | 'temporal').

    ``compute_dtype=jnp.bfloat16`` runs the forward/backward in bf16 (MXU
    native) while master params, optimizer state, the loss and BatchNorm
    statistics stay float32 (mixed precision; bf16's 8-bit exponent needs no
    loss scaling).
    """

    def loss_fn(params, batch_stats, batch, rng):
        d_rng, l_rng = jax.random.split(rng)
        if compute_dtype is not None:
            cast = lambda t: jax.tree.map(  # noqa: E731
                lambda x: x.astype(compute_dtype)
                if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
                else x,
                t,
            )
            params = cast(params)
            batch = {**batch, "patches": batch["patches"].astype(compute_dtype)}
        out, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch,
            phase=phase,
            rngs={"droppath": d_rng, "latent": l_rng},
            mutable=["batch_stats"],
        )
        stats = jax.tree.map(
            lambda x: x.astype(jnp.float32) if hasattr(x, "dtype") else x,
            mutated["batch_stats"],
        )
        return out["loss"].astype(jnp.float32), (out, stats)

    def train_step(state: TrainState, batch: Dict, rng: jnp.ndarray):
        (loss, (out, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, batch, rng)

        finite = jnp.isfinite(loss)

        def do_update(_):
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            return new_params, new_opt, new_stats

        def skip_update(_):
            return state.params, state.opt_state, state.batch_stats

        new_params, new_opt, stats = jax.lax.cond(finite, do_update, skip_update, None)

        new_state = state.replace(
            params=new_params,
            opt_state=new_opt,
            batch_stats=stats,
            step=state.step + finite.astype(jnp.int32),
        )
        grad_norm = optax.global_norm(grads)
        metrics = {
            "loss": loss,
            "grad_norm": grad_norm,
            "skipped": (~finite).astype(jnp.float32),
            "scalar_logs": out["logs"]["scalar"],
            # Predicted camera-space joints for host-side reprojection image
            # logging (ref `scripts/finetune.py:245-255`); tiny [B,T,21,3] and
            # only fetched on logging steps.
            "joint_cam_pred": out["predict"]["joint_cam"].astype(jnp.float32),
        }
        return new_state, metrics

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_eval_step(model, phase: str = "inference") -> Callable:
    """Jitted inference: batch -> predictions dict (ref `scripts/eval.py:259-266`)."""

    @jax.jit
    def eval_step(params, batch_stats, batch):
        return model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["patches"],
            batch["square_bboxes"],
            batch["timestamp"],
            batch["focal"],
            batch["princpt"],
            phase,
            method=model.predict,
        )

    return eval_step
