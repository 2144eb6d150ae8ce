"""Bisect the spatial train step on TPU (batch 64, bf16 by default).

Round-2 state: inference runs at ~46% MFU but the full train step only ~27%.
The backbone fwd+bwd is FLOP-proportional (~3.25x fwd, same MFU as the
forward), so the gap lives in the non-backbone step work. This times nested
subsets of the step so consecutive differences attribute it:

  fwd(loss)            forward incl. criterion
  fwd+bwd (no-FK loss) backward, loss cut before MANO FK / criterion
  fwd+bwd              full loss backward
  full step            + grad-clip + phase-masked AdamW + state update

  python tools/profile_train_parts.py --batch 64
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def marginal(make_body, state0, iters=10):
    """Marginal per-iteration cost of a chained fori_loop body."""

    def chained(s, n):
        return jax.lax.fori_loop(0, n, make_body, s)

    f1 = jax.jit(lambda s: chained(s, 1))
    fk = jax.jit(lambda s: chained(s, iters + 1))
    def get(r):  # fetch the smallest leaf — big-array device_get through
        leaves = jax.tree.leaves(r)  # the tunnel would dominate the timing
        return jax.device_get(min(leaves, key=lambda l: getattr(l, "size", 1)))
    get(f1(state0))
    get(fk(state0))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        get(f1(state0))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        get(fk(state0))
        tk = time.perf_counter() - t0
        best = min(best, max(tk - t1, 1e-9) / iters)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    import optax

    from cs_vit_tpu.cli.common import build_model, init_variables
    from cs_vit_tpu.config import FinetuneConfig
    from cs_vit_tpu.train import TrainState, build_optimizer

    cdt = jnp.bfloat16 if args.dtype == "bfloat16" else None
    cfg = FinetuneConfig(
        exp="prof", backbone="swinv2-base-256", img_size=256,
        phase="spatial", data=["dexycb"], batch_size=args.batch,
    )
    model = build_model(cfg)
    variables = init_variables(model, cfg, seq_len=1)
    B = args.batch
    rng = np.random.default_rng(0)
    batch = {
        "patches": jnp.asarray(
            rng.random((B, 1, 256, 256, 3), np.float32)
        ),
        "square_bboxes": jnp.asarray(
            np.tile(np.array([40.0, 40.0, 200.0, 200.0], np.float32), (B, 1, 1))
        ),
        "timestamp": jnp.zeros((B, 1), jnp.float32),
        "focal": jnp.full((B, 1, 2), 500.0, jnp.float32),
        "princpt": jnp.full((B, 1, 2), 128.0, jnp.float32),
        "joint_cam": jnp.asarray(rng.random((B, 1, 21, 3), np.float32)) * 100,
        "joint_valid": jnp.ones((B, 1, 21, 1), jnp.float32),
        "mano_shape": jnp.zeros((B, 1, 10), jnp.float32),
    }

    def cast_tree(t):
        if cdt is None:
            return t
        return jax.tree.map(
            lambda x: x.astype(cdt)
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
            else x,
            t,
        )

    def full_loss(params, stats, patches, rng_):
        p = cast_tree(params)
        out, mut = model.apply(
            {"params": p, "batch_stats": stats},
            {**batch, "patches": patches.astype(cdt) if cdt else patches},
            phase="spatial",
            rngs={"droppath": rng_},
            mutable=["batch_stats"],
        )
        stats32 = jax.tree.map(lambda x: x.astype(jnp.float32), mut["batch_stats"])
        return out["loss"].astype(jnp.float32), stats32

    def nofk_loss(params, stats, patches, rng_):
        """Loss cut at decode_pose outputs: skips MANO FK + criterion bwd."""
        p = cast_tree(params)
        from cs_vit_tpu.models.poser import sample_persp_dir_vec, sparse_corner_coords

        if model.config.persp_embed_method == "dense":
            dirs = sample_persp_dir_vec(
                16, batch["square_bboxes"], batch["focal"], batch["princpt"]
            )
        else:
            dirs = sparse_corner_coords(
                batch["square_bboxes"], batch["focal"], batch["princpt"]
            )
        (pose_aa, shape, rtn), mut = model.apply(
            {"params": p, "batch_stats": stats},
            patches.astype(cdt) if cdt else patches,
            batch["timestamp"], dirs,
            phase="spatial",
            rngs={"droppath": rng_},
            mutable=["batch_stats"],
            method=model.decode_pose,
        )
        stats32 = jax.tree.map(lambda x: x.astype(jnp.float32), mut["batch_stats"])
        loss = (
            jnp.sum(pose_aa.astype(jnp.float32) ** 2)
            + jnp.sum(shape.astype(jnp.float32) ** 2)
            + jnp.sum(rtn.astype(jnp.float32) ** 2)
        ) / B
        return loss, stats32

    params0 = variables["params"]
    stats0 = variables.get("batch_stats", {})
    tx = build_optimizer(params0, "spatial", 1e-4)
    state0 = TrainState.create({"params": params0, "batch_stats": stats0}, tx)

    def tick_patches(tick):
        return batch["patches"] + (tick * 1e-20).astype(batch["patches"].dtype)

    # 1. forward only
    def body_fwd(i, tick):
        loss, _ = full_loss(
            params0, stats0, tick_patches(tick), jax.random.fold_in(jax.random.key(0), i)
        )
        return loss

    t = marginal(lambda i, s: body_fwd(i, s), jnp.zeros((), jnp.float32))
    print(f"  fwd (full loss)            : {t*1e3:8.2f} ms")

    # 2/3. fwd+bwd with/without FK+criterion
    for name, lfn in (("no-FK loss", nofk_loss), ("full loss", full_loss)):
        def body_grad(i, tick, lfn=lfn):
            (loss, _), grads = jax.value_and_grad(lfn, has_aux=True)(
                params0, stats0, tick_patches(tick),
                jax.random.fold_in(jax.random.key(0), i),
            )
            acc = sum(
                jnp.sum(g.astype(jnp.float32)) for g in jax.tree.leaves(grads)
            )
            return loss + acc * 1e-20

        t = marginal(body_grad, jnp.zeros((), jnp.float32))
        print(f"  fwd+bwd ({name:10s})      : {t*1e3:8.2f} ms")

    # 4. full step (fwd+bwd+clip+masked AdamW)
    def body_step(i, carry):
        state, tick = carry
        (loss, stats), grads = jax.value_and_grad(full_loss, has_aux=True)(
            state.params, state.batch_stats, tick_patches(tick),
            jax.random.fold_in(jax.random.key(0), i),
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (
            state.replace(
                params=new_params, opt_state=new_opt, batch_stats=stats,
                step=state.step + 1,
            ),
            loss,
        )

    t = marginal(body_step, (state0, jnp.zeros((), jnp.float32)))
    print(f"  full step (fwd+bwd+AdamW)  : {t*1e3:8.2f} ms")

    # 5. optimizer alone (grads = tiny constants; measures clip+AdamW+update)
    zgrads = jax.tree.map(lambda x: (x * 1e-20).astype(x.dtype), params0)

    def body_opt(i, carry):
        state, tick = carry
        g = jax.tree.map(
            lambda z: z + (tick * 1e-20).astype(z.dtype), zgrads
        )
        updates, new_opt = tx.update(g, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (
            state.replace(params=new_params, opt_state=new_opt, step=state.step + 1),
            tick + 1.0,
        )

    t = marginal(body_opt, (state0, jnp.zeros((), jnp.float32)))
    print(f"  optimizer only (clip+AdamW): {t*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
