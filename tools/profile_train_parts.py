"""Attribute the non-backbone cost of the spatial train step (TPU).

Round-2 state: full step 160 ms at batch 64 bf16 (400 crops/s) of which
the backbone fwd+bwd Pallas path is a measured 134 ms — FLOP-proportional
to the forward (~3.25x) at the same ~46% MFU. The remaining ~26 ms lives
in small graphs, so instead of recompiling the full model per probe
(20+ min per remote compile), this times the small graphs standalone:

  optimizer            clip-by-global-norm + phase-masked AdamW + update
  fk+criterion f+b     MANO FK -> losses, fwd+bwd wrt decode outputs
  decode-tail f+b      spatial encoder + temporal skip + decoders, fwd+bwd
  params cast          f32 master params -> bf16 compute copy

Known anchors (BASELINE.md): step 160 ms, backbone fwd+bwd 134.1 ms.
step - backbone - (sum of the probes here) = unattributed residue.

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


def marginal(make_body, state0, iters=10, consts=()):
    """Marginal per-iteration cost of a chained fori_loop body.

    The trip count is a traced argument so one compile serves both the
    1-chain and the (iters+1)-chain. Large trees the body needs must come
    in via ``consts`` (jit arguments) — closing over them bakes them into
    the HLO as constants (GBs shipped to the remote compile service).
    ``make_body(i, carry, *consts)``.
    """

    f = jax.jit(
        lambda s, n, *c: jax.lax.fori_loop(
            0, n, lambda i, t: make_body(i, t, *c), s
        )
    )

    def get(r):  # fetch the smallest leaf — big-array device_get through
        leaves = jax.tree.leaves(r)  # the tunnel would dominate the timing
        return jax.device_get(min(leaves, key=lambda l: getattr(l, "size", 1)))

    one = jnp.asarray(1, jnp.int32)
    k = jnp.asarray(iters + 1, jnp.int32)
    get(f(state0, one, *consts))
    get(f(state0, k, *consts))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        get(f(state0, one, *consts))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        get(f(state0, k, *consts))
        tk = time.perf_counter() - t0
        best = min(best, max(tk - t1, 1e-9) / iters)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--fullgrad", action="store_true",
                    help="also probe the full-model fwd+bwd (no optimizer) — "
                         "a 20+ min remote compile on degraded nights")
    ap.add_argument("--skip-small", action="store_true",
                    help="skip the four small probes (their r2 numbers stand: "
                         "opt 5.84 / cast 1.40 / fk ~0 / tail 3.38 ms) and go "
                         "straight to --fullgrad/--combined")
    ap.add_argument("--combined", nargs="*", default=None,
                    choices=["step", "noclip", "cliponly", "sgd"],
                    help="probe fwd+bwd COMPOSED with optimizer variants in "
                         "one graph (r4: step-(fullgrad+opt) residue was "
                         "~16 ms — find where composition loses it). 'step' "
                         "= clip+masked AdamW (the bench anchor), 'noclip' "
                         "= masked AdamW only, 'cliponly' = clip only, "
                         "'sgd' = bare sgd(1e-4)")
    args = ap.parse_args()

    import optax

    from cs_vit_tpu.cli.common import build_model, init_variables
    from cs_vit_tpu.config import FinetuneConfig
    from cs_vit_tpu.train import build_optimizer

    cfg = FinetuneConfig(
        exp="prof", backbone="swinv2-base-256", img_size=256,
        phase="spatial", data=["dexycb"], batch_size=args.batch,
    )
    model = build_model(cfg)
    variables = init_variables(model, cfg, seq_len=1)
    params0 = variables["params"]
    stats0 = variables.get("batch_stats", {})
    B = args.batch
    rng = np.random.default_rng(0)

    # --- 1. optimizer only ---------------------------------------------
    # The loop carry is a single scalar: a loop-carried params+opt tree
    # (~2800 while-loop buffers) is what the degraded remote compiler
    # chokes on (>20 min / broken pipe). The full update still runs per
    # iteration because the output scalar depends on every updated leaf.
    run_small = not args.skip_small
    tx = build_optimizer(params0, "spatial", 1e-4)
    opt0 = tx.init(params0)
    grads0 = jax.tree.map(lambda x: x * 1e-3, params0)

    def body_opt(i, tick, params, opt_in, grads):
        g = jax.tree.map(lambda z: z + (tick * 1e-20).astype(z.dtype), grads)
        updates, opt = tx.update(g, opt_in, params)
        new_params = optax.apply_updates(params, updates)
        acc = sum(
            jnp.sum(l.astype(jnp.float32))
            for t_ in (new_params, opt)
            for l in jax.tree.leaves(t_)
            if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.floating)
        )
        return tick + acc * 1e-20

    if run_small:
        t = marginal(
            body_opt, jnp.zeros((), jnp.float32), consts=(params0, opt0, grads0)
        )
        print(f"  optimizer (clip+masked AdamW): {t*1e3:8.2f} ms")

    # --- 2. params f32 -> bf16 compute cast ----------------------------
    def body_cast(i, tick, params):
        p = jax.tree.map(
            lambda x: (x + (tick * 1e-20).astype(x.dtype)).astype(jnp.bfloat16)
            if jnp.issubdtype(x.dtype, jnp.floating) else x,
            params,
        )
        acc = sum(jnp.sum(l.astype(jnp.float32)) for l in jax.tree.leaves(p))
        return acc * 1e-20 + tick

    if run_small:
        t = marginal(body_cast, jnp.zeros((), jnp.float32), consts=(params0,))
        print(f"  params f32->bf16 cast        : {t*1e3:8.2f} ms")

    # --- 3. FK + criterion fwd+bwd -------------------------------------
    batch = {
        "joint_cam": jnp.asarray(rng.random((B, 1, 21, 3), np.float32)) * 100,
        "joint_valid": jnp.ones((B, 1, 21, 1), jnp.float32),
        "mano_shape": jnp.zeros((B, 1, 10), jnp.float32),
    }
    pose_aa0 = jnp.asarray(rng.random((B, 1, 16, 3), np.float32) * 0.1)
    shape0 = jnp.asarray(rng.random((B, 1, 10), np.float32) * 0.1)
    rtn0 = jnp.asarray(rng.random((B, 1, 3), np.float32) * 0.1)

    def fk_loss(pose_aa, shape, rtn, params):
        jc, vc, rt = model.apply(
            {"params": params, "batch_stats": stats0},
            pose_aa, shape, rtn, method=model.pose_fk,
        )
        predict = {
            "joint_cam": jc, "verts_cam": vc, "root_transl": rt,
            "shape": shape,
        }
        loss, _ = model.apply(
            {"params": params, "batch_stats": stats0},
            predict, batch, "spatial", method=model.criterion,
        )
        return loss

    gfk = jax.grad(fk_loss, argnums=(0, 1, 2))

    def body_fk(i, tick, params):
        g = gfk(
            pose_aa0 + (tick * 1e-20).astype(pose_aa0.dtype), shape0, rtn0,
            params,
        )
        return tick + sum(jnp.sum(x) for x in g) * 1e-20

    if run_small:
        t = marginal(body_fk, jnp.zeros((), jnp.float32), consts=(params0,))
        print(f"  FK+criterion fwd+bwd         : {t*1e3:8.2f} ms")

    # --- 4. decode tail (spatial encoder + decoders) fwd+bwd ------------
    D = model.config.hidden_dim
    patches0 = jnp.asarray(rng.random((B, 64, D), np.float32) * 0.1, jnp.bfloat16)
    query0 = jnp.asarray(rng.random((B, 3, D), np.float32) * 0.1, jnp.bfloat16)

    def tail(patches, query, params):
        def run(m, p, q):
            fused = m.spatial_encoder(q, p, train=False)
            pose_q = fused[:, 0][:, None]
            shape_q = fused[:, 1][:, None]
            root_q = fused[:, 2][:, None]
            pose6 = m.pose_decoder(pose_q)
            sh = m.shape_decoder(shape_q)
            rt = m.root_decoder(root_q)
            return (
                jnp.sum(pose6.astype(jnp.float32))
                + jnp.sum(sh.astype(jnp.float32))
                + jnp.sum(rt.astype(jnp.float32))
            )

        out, _ = model.apply(
            {"params": params, "batch_stats": stats0},
            patches, query, method=run, mutable=["batch_stats"],
        )
        return out

    gtail = jax.grad(tail, argnums=(0, 1))

    def body_tail(i, tick, params):
        g = gtail(
            patches0 + (tick * 1e-20).astype(patches0.dtype), query0, params
        )
        return tick + sum(jnp.sum(x.astype(jnp.float32)) for x in g) * 1e-20

    if run_small:
        t = marginal(body_tail, jnp.zeros((), jnp.float32), consts=(params0,))
        print(f"  decode-tail fwd+bwd          : {t*1e3:8.2f} ms")

    # --- 5. full-model fwd+bwd, no optimizer (opt-in: slow compile) -----
    if not args.fullgrad and not args.combined:
        return

    full_batch = {
        **batch,
        "patches": jnp.asarray(
            rng.random((B, 1, 256, 256, 3), np.float32), jnp.bfloat16
        ),
        "square_bboxes": jnp.asarray(
            np.tile(np.array([40.0, 40.0, 200.0, 200.0], np.float32), (B, 1, 1))
        ),
        "timestamp": jnp.zeros((B, 1), jnp.float32),
        "focal": jnp.full((B, 1, 2), 500.0, jnp.float32),
        "princpt": jnp.full((B, 1, 2), 128.0, jnp.float32),
    }

    def step_loss(params, patches, rng_):
        p = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if jnp.issubdtype(x.dtype, jnp.floating) else x,
            params,
        )
        out, mut = model.apply(
            {"params": p, "batch_stats": stats0},
            {**full_batch, "patches": patches},
            phase="spatial",
            rngs={"droppath": rng_},
            mutable=["batch_stats"],
        )
        return out["loss"].astype(jnp.float32)

    gstep = jax.value_and_grad(step_loss)

    if args.fullgrad:
        def body_full(i, tick, params):
            loss, grads = gstep(
                params,
                full_batch["patches"]
                + (tick * 1e-20).astype(full_batch["patches"].dtype),
                jax.random.fold_in(jax.random.key(0), i),
            )
            acc = sum(
                jnp.sum(g.astype(jnp.float32)) for g in jax.tree.leaves(grads)
            )
            return tick + loss * 0.0 + acc * 1e-20

        t = marginal(body_full, jnp.zeros((), jnp.float32), consts=(params0,))
        print(f"  full fwd+bwd (no optimizer)  : {t*1e3:8.2f} ms")

    # --- 6. fwd+bwd COMPOSED with optimizer variants --------------------
    # Same consts-as-args structure as the small probes, but the body runs
    # grads -> tx.update -> apply in ONE graph (what bench_train measures
    # minus its fori_loop state carry). Discriminates where the ~16 ms
    # step-minus-parts residue lives.
    for variant in (args.combined or ()):
        if variant == "step":
            txv = build_optimizer(params0, "spatial", 1e-4)
        elif variant == "noclip":
            from cs_vit_tpu.train.optim import build_optimizer as _bo

            # masked AdamW without the clip stage: rebuild manually
            from cs_vit_tpu.models.poser import phase_trainable_mask

            mask = phase_trainable_mask(params0, "spatial")
            txv = optax.masked(
                optax.adamw(1e-4, weight_decay=0.01), mask
            )
        elif variant == "cliponly":
            txv = optax.clip_by_global_norm(5.0)
        else:  # sgd
            txv = optax.sgd(1e-4)
        optv = txv.init(params0)

        def body_comb(i, tick, params, opt_in, _txv=txv):
            loss, grads = gstep(
                params,
                full_batch["patches"]
                + (tick * 1e-20).astype(full_batch["patches"].dtype),
                jax.random.fold_in(jax.random.key(0), i),
            )
            updates, opt = _txv.update(grads, opt_in, params)
            new_params = optax.apply_updates(params, updates)
            acc = sum(
                jnp.sum(l.astype(jnp.float32))
                for t_ in (new_params, opt)
                for l in jax.tree.leaves(t_)
                if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.floating)
            )
            return tick + loss * 0.0 + acc * 1e-20

        t = marginal(
            body_comb, jnp.zeros((), jnp.float32), consts=(params0, optv)
        )
        print(f"  fwd+bwd+opt[{variant:8s}]       : {t*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
