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

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

from ..parallel.mesh import DATA_AXIS
from .optim import last_grad_norm
from .state import TrainState


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    phase: str,
    donate: bool = True,
    compute_dtype=None,
    mesh: Optional[Mesh] = None,
    nan_skip: bool = True,
    nan_skip_impl: str = "cond",
) -> Callable[[TrainState, Dict, jnp.ndarray], Tuple[TrainState, Dict]]:
    """Build the jitted train step for `phase` ('spatial' | 'temporal').

    ``compute_dtype=jnp.bfloat16`` runs the forward/backward in bf16 (MXU
    native) while master params, optimizer state, the loss and BatchNorm
    statistics stay float32 (mixed precision; bf16's 8-bit exponent needs no
    loss scaling).

    ``mesh`` (data size > 1) switches to an explicit SPMD step via
    ``jax.shard_map``: each device runs the local fwd/bwd on its batch shard
    and gradients/loss/BatchNorm stats are ``pmean``-ed over the ``data``
    axis. This is required for the fused Pallas backbone kernel — under plain
    GSPMD a ``pallas_call`` has no partitioning rule, so XLA silently
    all-gathers the batch and replicates the whole backbone computation on
    every chip. shard_map hands the kernel per-device local shapes instead
    (and matches the reference's DDP gradient semantics,
    ref `scripts/finetune.py:133-135`).
    """
    from ..ops import fused_block as _fb

    if _fb._BF16_SOFTMAX:
        # The flag changes only the Pallas FORWARD; the custom_vjp backward
        # (and the XLA fallback) recompute scores/softmax in f32, so training
        # with it on would take gradients of a different function than the
        # executed forward. It is a serving-only throughput knob.
        raise RuntimeError(
            "FUSED_BLOCK_BF16_SOFTMAX=1 is inference-only: the fused-block "
            "backward recomputes the softmax in f32, so gradients would not "
            "match the executed forward. Unset it for training."
        )

    data_parallel = mesh is not None and mesh.shape.get(DATA_AXIS, 1) > 1

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
        if data_parallel:
            # decorrelate stochastic-depth / latent sampling across shards
            rng = jax.random.fold_in(rng, jax.lax.axis_index(DATA_AXIS))
        (loss, (out, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, batch, rng)

        if data_parallel:
            loss = jax.lax.pmean(loss, DATA_AXIS)
            grads = jax.lax.pmean(grads, DATA_AXIS)
            new_stats = jax.lax.pmean(new_stats, DATA_AXIS)
            out["logs"]["scalar"] = jax.lax.pmean(
                out["logs"]["scalar"], DATA_AXIS
            )

        finite = jnp.isfinite(loss)

        def do_update(_):
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            # The stateful clip already paid the full-tree norm pass; reuse it
            # instead of a second optax.global_norm(grads). This is the
            # pre-clip trainable-subset norm (see optim.py docstring for why
            # the reference's own logged value is not replicated).
            norm = last_grad_norm(new_opt)
            if norm is None:  # tx without the stateful clip (tests)
                norm = optax.global_norm(grads)
            return new_params, new_opt, new_stats, norm

        def skip_update(_):
            # Rare branch (non-finite loss): the clip never ran, compute the
            # diagnostic norm here — over the same trainable subset as
            # do_update's so the grad_norm metric keeps one meaning across
            # skipped and accepted steps.
            from ..models.poser import phase_trainable_mask

            try:
                mask = phase_trainable_mask(grads, phase)
                trainable = jax.tree.map(
                    lambda g, m: g if m else jnp.zeros_like(g), grads, mask
                )
            except Exception:  # non-Poser param trees (tests)
                trainable = grads
            return (
                state.params,
                state.opt_state,
                state.batch_stats,
                optax.global_norm(trainable),
            )

        if nan_skip and nan_skip_impl == "where":
            # Predicated skip: identical state semantics to the lax.cond
            # branch, but expressed as per-leaf selects XLA fuses into the
            # optimizer's own elementwise kernels — no conditional regions
            # plumbing the ~2800-buffer params+opt tree (whose branch-copy
            # cost is what the "cond" impl pays; A/B'd in BASELINE.md r5).
            # Grads are zeroed first so a non-finite loss cannot poison the
            # moments before the select discards them.
            gz = jax.tree.map(
                lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads
            )
            updates, opt_new = tx.update(gz, state.opt_state, state.params)
            params_new = optax.apply_updates(state.params, updates)
            sel = lambda new, old: jax.tree.map(  # noqa: E731
                lambda n, o: jnp.where(finite, n, o), new, old
            )
            new_params = sel(params_new, state.params)
            new_opt = sel(opt_new, state.opt_state)
            stats = sel(new_stats, state.batch_stats)
            norm = last_grad_norm(opt_new)
            if norm is None:  # tx without the stateful clip (tests)
                norm = optax.global_norm(gz)
            # on a skipped step the zeroed grads make the logged norm 0.0
            # (the cond impl reports the non-finite raw norm there; both are
            # diagnostic-only on a skipped step)
            grad_norm = norm
        elif nan_skip:
            new_params, new_opt, stats, grad_norm = jax.lax.cond(
                finite, do_update, skip_update, None
            )
        else:
            # ``nan_skip=False``: unconditional update. Exact skip semantics
            # (state untouched on a non-finite loss) require the branch; this
            # knob exists for benchmarking its cost and for callers that
            # guarantee finite losses.
            new_params, new_opt, stats, grad_norm = do_update(None)

        new_state = state.replace(
            params=new_params,
            opt_state=new_opt,
            batch_stats=stats,
            step=state.step + finite.astype(jnp.int32),
        )
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

    if data_parallel:
        metrics_spec = {
            "loss": P(), "grad_norm": P(), "skipped": P(),
            "scalar_logs": P(),
            "joint_cam_pred": P(DATA_AXIS),
        }
        sharded = jax.shard_map(
            train_step,
            mesh=mesh,
            in_specs=(P(), P(DATA_AXIS), P()),
            out_specs=(P(), metrics_spec),
            check_vma=False,  # pallas_call + custom_vjp defeat VMA tracking
        )
        return jax.jit(sharded, donate_argnums=(0,) if donate else ())

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_eval_step(
    model, phase: str = "inference", mesh: Optional[Mesh] = None
) -> Callable:
    """Jitted inference: batch -> predictions dict (ref `scripts/eval.py:259-266`).

    With a ``mesh`` (data size > 1) the step runs under ``jax.shard_map`` so
    the fused Pallas backbone sees per-device batch shards (see
    ``make_train_step``)."""

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

    if mesh is not None and mesh.shape.get(DATA_AXIS, 1) > 1:
        eval_step = jax.shard_map(
            eval_step,
            mesh=mesh,
            in_specs=(P(), P(), P(DATA_AXIS)),
            out_specs=P(DATA_AXIS),
            check_vma=False,
        )
    return jax.jit(eval_step)
