"""Optimizer + LR schedules.

Parity targets:
* lr scaling sqrt(world*batch/44) — reference `scripts/finetune.py:138-139`
* AdamW with torch defaults (wd=0.01 on ALL params) — `finetune.py:140-143`
* global-norm grad clip 5.0 — `finetune.py:225`
* warmup->cosine->constant schedule — `cs_vit/net/lr_scheduler.py:27-60`
* phase freezing via optimizer masks instead of requires_grad mutation —
  `cs_vit/net/ti_poser.py:339-397` (see models.poser.phase_trainable_mask)
"""

from __future__ import annotations

import math
from typing import Callable, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.poser import phase_trainable_mask


class ClipByGlobalNormState(NamedTuple):
    """State of :func:`clip_by_global_norm_stateful`: the last observed norm."""

    grad_norm: jnp.ndarray


def clip_by_global_norm_stateful(max_norm: float) -> optax.GradientTransformation:
    """``optax.clip_by_global_norm`` that remembers the norm it computed.

    Identical clipping math to optax (``lax.select`` per leaf on
    ``g_norm < max_norm``), but the global norm — a full HBM pass over the
    gradient tree — is stored in the transform state so the train step can
    log it without a second ``optax.global_norm(grads)`` pass.

    Logged-metric note: this is the *pre-clip trainable-subset* grad norm (what
    ``clip_grad_norm_`` returns at ref `scripts/finetune.py:225`), chosen
    deliberately. The reference *discards* that return value and instead logs
    ``calculate_gradient_norm()`` at `finetune.py:263` — which runs after
    ``zero_grad(set_to_none=True)`` (so it sees no grads) and scales by ``*0.5``
    instead of a sqrt (`cs_vit/utils/tensor.py:10`); that buggy value is not
    replicated (the quirky scaling itself lives behind
    ``utils.misc.calculate_gradient_norm(compat=True)`` for anyone who wants it).
    """

    def init_fn(params):
        del params
        return ClipByGlobalNormState(jnp.zeros((), jnp.float32))

    def update_fn(updates, state, params=None):
        del params, state
        g_norm = optax.global_norm(updates)
        trigger = jnp.squeeze(g_norm < max_norm)

        def clip_fn(t):
            return jax.lax.select(
                trigger, t, (t / g_norm.astype(t.dtype)) * max_norm
            )

        updates = jax.tree.map(clip_fn, updates)
        return updates, ClipByGlobalNormState(g_norm.astype(jnp.float32))

    return optax.GradientTransformation(init_fn, update_fn)


def last_grad_norm(opt_state) -> Optional[jnp.ndarray]:
    """Extract the norm stashed by :func:`clip_by_global_norm_stateful`.

    Walks the (possibly nested multi_transform/masked/chain) optimizer state
    and returns the first ``ClipByGlobalNormState.grad_norm`` found, or
    ``None`` if the optimizer has no stateful clip.
    """
    found = []

    def rec(s):
        if found:
            return
        if isinstance(s, ClipByGlobalNormState):
            found.append(s.grad_norm)
        elif isinstance(s, (tuple, list)):
            for c in s:
                rec(c)
        elif isinstance(s, dict):
            for c in s.values():
                rec(c)
        elif hasattr(s, "inner_state"):
            rec(s.inner_state)
        elif hasattr(s, "inner_states"):
            rec(s.inner_states)

    rec(opt_state)
    return found[0] if found else None


def scaled_lr(base_lr: float, world_size: int, batch_size: int) -> float:
    """sqrt((world * per-host batch) / 44) * base_lr."""
    return math.sqrt(world_size * batch_size / 44.0) * base_lr


def warmup_cosine_schedule(
    max_lr: float,
    min_lr: float,
    warmup_epochs: int,
    annealing_epochs: int,
    steps_per_epoch: int,
) -> Callable[[int], float]:
    """Linear warmup -> cosine anneal to min_lr -> constant min_lr."""
    assert warmup_epochs >= 0 and annealing_epochs >= 0
    assert max_lr > min_lr >= 0.0 and steps_per_epoch > 0
    warmup_steps = warmup_epochs * steps_per_epoch
    annealing_steps = annealing_epochs * steps_per_epoch

    def schedule(step):
        import jax.numpy as jnp

        step = jnp.asarray(step, jnp.float32)
        warm = jnp.where(
            warmup_steps == 0, 1.0, step / max(warmup_steps, 1)
        )
        progress = (step - warmup_steps) / max(annealing_steps, 1)
        cosine = 0.5 * (1 + jnp.cos(jnp.pi * jnp.clip(progress, 0.0, 1.0)))
        scaled_min = min_lr / max_lr
        anneal = scaled_min + (1 - scaled_min) * cosine
        factor = jnp.where(
            step < warmup_steps,
            warm,
            jnp.where(step < warmup_steps + annealing_steps, anneal, scaled_min),
        )
        return max_lr * factor

    return schedule


def constant_schedule(lr: float) -> Callable[[int], float]:
    return lambda step: lr


def gen_cosine_scheduler_array(
    base_value, final_value, epochs, niter_per_ep, warmup_epochs=0, start_warmup_value=0
) -> np.ndarray:
    """DINO-style cosine array (ref `lr_scheduler.py:9-24`), host-side."""
    warmup_schedule = np.array([])
    warmup_iters = warmup_epochs * niter_per_ep
    if warmup_epochs > 0:
        warmup_schedule = np.linspace(start_warmup_value, base_value, warmup_iters)
    iters = np.arange(epochs * niter_per_ep - warmup_iters)
    schedule = final_value + 0.5 * (base_value - final_value) * (
        1 + np.cos(np.pi * iters / len(iters))
    )
    schedule = np.concatenate((warmup_schedule, schedule))
    assert len(schedule) == epochs * niter_per_ep
    return schedule


def build_optimizer(
    params: Dict,
    phase: str,
    learning_rate: Callable[[int], float] | float,
    max_grad_norm: float = 5.0,
    weight_decay: float = 0.01,
) -> optax.GradientTransformation:
    """Masked AdamW: frozen-phase params get zero updates (and no moments)."""
    mask = phase_trainable_mask(params, phase)
    labels = jax.tree.map(lambda m: "train" if m else "freeze", mask)
    inner = optax.chain(
        clip_by_global_norm_stateful(max_grad_norm),
        optax.adamw(
            learning_rate=learning_rate,
            b1=0.9,
            b2=0.999,
            eps=1e-8,
            weight_decay=weight_decay,
        ),
    )
    return optax.multi_transform(
        {"train": inner, "freeze": optax.set_to_zero()}, labels
    )
