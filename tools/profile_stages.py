"""Per-stage SwinV2 timing on TPU: where does the backbone forward go?

Times each stage's block sequence (and patch embed / merges) separately with
the chained-fori_loop method from bench.py (dispatch-only timing is invalid
through the axon tunnel). Compares attention impls side by side.

  python tools/profile_stages.py --batch 64 --impls xla fused
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

from cs_vit_tpu.models.swinv2 import (  # noqa: E402
    PatchMerging,
    SwinV2Block,
    swinv2_base_256,
)


def timeit(fn, *args, iters=10):
    """Marginal cost between 1- and (iters+1)-chained applications."""

    def chained(n, *a):
        def body(_, carry):
            out = fn(*((a[0] + (carry * 1e-20).astype(a[0].dtype),) + a[1:]))
            return jnp.sum(out).astype(jnp.float32)

        return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))

    f1 = jax.jit(lambda *a: chained(1, *a))
    fk = jax.jit(lambda *a: chained(iters + 1, *a))
    jax.device_get(f1(*args))
    jax.device_get(fk(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.device_get(f1(*args))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        jax.device_get(fk(*args))
        tk = time.perf_counter() - t0
        best = min(best, max(tk - t1, 1e-9) / iters)
    return best


def profile_stage(cfg, stage, impl, batch, dtype, train=False):
    res = cfg.image_size // cfg.patch_size // (2 ** stage)
    dim = cfg.embed_dim * (2 ** stage)
    depth = cfg.depths[stage]

    import flax.linen as nn

    class Stage(nn.Module):
        @nn.compact
        def __call__(self, x):
            for i in range(depth):
                x = SwinV2Block(
                    config=cfg, dim=dim, resolution=(res, res),
                    num_heads=cfg.num_heads[stage],
                    shift_size=0 if i % 2 == 0 else cfg.window_size // 2,
                    drop_path_rate=0.0,
                    pretrained_window_size=cfg.pretrained_window_sizes[stage],
                    attention_impl=impl,
                    name=f"b{i}",
                )(x)
            return x

    m = Stage()
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(batch, res * res, dim)), dtype
    )
    params = jax.tree.map(
        lambda v: v.astype(dtype)
        if jnp.issubdtype(v.dtype, jnp.floating) else v,
        m.init(jax.random.key(0), x)["params"],
    )
    if train:
        # fwd + dx + dw for this stage's block stack alone: attributes the
        # train-step backward per stage (stage 3 is the XLA-remat path,
        # _PALLAS_BWD_MAX_DIM in ops/fused_block.py).
        def loss(xx, prm):
            return jnp.sum(m.apply({"params": prm}, xx).astype(jnp.float32) ** 2)

        vg = jax.value_and_grad(loss, argnums=(0, 1))

        def fwdbwd(xx, prm):
            l, (gx, gp) = vg(xx, prm)
            return (
                l
                + jnp.sum(gx.astype(jnp.float32) ** 2)
                + sum(
                    jnp.sum(g.astype(jnp.float32) ** 2)
                    for g in jax.tree.leaves(gp)
                )
            )

        sec = timeit(fwdbwd, x, params)
        return sec, depth
    sec = timeit(lambda xx: m.apply({"params": params}, xx), x)
    return sec, depth


def profile_model(impl, batch, dtype):
    """Backbone-only and full-Poser-predict timings (non-backbone overhead)."""
    from cs_vit_tpu.cli.common import build_model, init_variables
    from cs_vit_tpu.config import FinetuneConfig
    from cs_vit_tpu.models.swinv2 import SwinV2

    cfg = FinetuneConfig(
        exp="prof", backbone="swinv2-base-256", img_size=256,
        phase="inference", data=["dexycb"], batch_size=batch,
        attention_impl=impl,
    )
    model = build_model(cfg)
    variables = init_variables(model, cfg, seq_len=1)
    cast = lambda t: jax.tree.map(  # noqa: E731
        lambda v: v.astype(dtype)
        if jnp.issubdtype(v.dtype, jnp.floating) else v, t,
    )
    params = cast(variables["params"])
    stats = variables.get("batch_stats", {})

    rng = np.random.default_rng(0)
    B, S = batch, 256
    patches = jnp.asarray(rng.uniform(size=(B, 1, S, S, 3)), dtype)
    bbox = jnp.tile(jnp.asarray([80.0, 100.0, 400.0, 420.0], jnp.float32), (B, 1, 1))
    ts = jnp.zeros((B, 1), jnp.float32)
    focal = jnp.full((B, 1, 2), 600.0, jnp.float32)
    princ = jnp.full((B, 1, 2), 320.0, jnp.float32)

    # params/aux must be jit ARGUMENTS: captured constants are inlined into
    # the HLO and blow the remote-compile request-body limit (HTTP 413)
    def full_predict(p, prm, st, bb_, ts_, f_, pp_):
        return model.apply(
            {"params": prm, "batch_stats": st},
            p, bb_, ts_, f_, pp_, "inference", method=model.predict,
        )["joint_cam"]

    t_full = timeit(full_predict, patches, params, stats, bbox, ts, focal, princ)

    bb = SwinV2(model.config.swin_config(), attention_impl=impl)
    bb_params = params["backbone"]
    imgs = patches.reshape(B, S, S, 3)

    t_bb = timeit(lambda x, prm: bb.apply({"params": prm}, x), imgs, bb_params)
    return t_full, t_bb


def profile_decode(impl, batch, dtype):
    """Split the non-backbone predict cost: decode stack vs MANO FK."""
    from cs_vit_tpu.cli.common import build_model, init_variables
    from cs_vit_tpu.config import FinetuneConfig

    cfg = FinetuneConfig(
        exp="prof", backbone="swinv2-base-256", img_size=256,
        phase="inference", data=["dexycb"], batch_size=batch,
        attention_impl=impl,
    )
    model = build_model(cfg)
    variables = init_variables(model, cfg, seq_len=1)
    cast = lambda t: jax.tree.map(  # noqa: E731
        lambda v: v.astype(dtype)
        if jnp.issubdtype(v.dtype, jnp.floating) else v, t,
    )
    params = cast(variables["params"])
    stats = variables.get("batch_stats", {})

    rng = np.random.default_rng(0)
    B, S = batch, 256
    imgs = jnp.asarray(rng.uniform(size=(B, 1, S, S, 3)), dtype)
    ts = jnp.zeros((B, 1), jnp.float32)
    persp = jnp.asarray(rng.normal(size=(B, 1, 16, 16, 2)) * 0.1, jnp.float32)

    def decode(p, prm, st, ts_, pv):
        out = model.apply(
            {"params": prm, "batch_stats": st},
            p, ts_, pv, "inference", method=model.decode_pose,
        )
        return out[0]

    t_dec = timeit(decode, imgs, params, stats, ts, persp)

    pose_aa = jnp.asarray(rng.normal(size=(B, 1, 16, 3)) * 0.1, jnp.float32)
    shape = jnp.asarray(rng.normal(size=(B, 1, 10)) * 0.1, jnp.float32)
    root = jnp.asarray(rng.normal(size=(B, 1, 3)), jnp.float32)

    def fk(pa, prm, st, sh, rt):
        return model.apply(
            {"params": prm, "batch_stats": st},
            pa, sh, rt, method=model.pose_fk,
        )[0]

    t_fk = timeit(fk, pose_aa, params, stats, shape, root)
    print(
        f"  decode_pose (backbone+spatial+heads): {t_dec * 1e3:7.2f} ms | "
        f"pose_fk (MANO): {t_fk * 1e3:6.2f} ms"
    )


def profile_glue(batch, dtype):
    """Non-block backbone pieces: patch embed (+LN), merges, final LN."""
    import flax.linen as nn

    from cs_vit_tpu.models.swinv2 import PatchMerging, swinv2_base_256

    cfg = swinv2_base_256()
    rng = np.random.default_rng(0)

    class Embed(nn.Module):
        @nn.compact
        def __call__(self, x):
            y = nn.Conv(cfg.embed_dim, kernel_size=(4, 4), strides=(4, 4),
                        padding="VALID", name="patch_embed")(x)
            B = x.shape[0]
            H = cfg.image_size // cfg.patch_size
            y = y.reshape(B, H * H, cfg.embed_dim)
            return nn.LayerNorm(epsilon=cfg.layer_norm_eps)(y)

    x = jnp.asarray(rng.uniform(size=(batch, 256, 256, 3)), dtype)
    m = Embed()
    params = jax.tree.map(
        lambda v: v.astype(dtype) if jnp.issubdtype(v.dtype, jnp.floating) else v,
        m.init(jax.random.key(0), x)["params"],
    )
    sec = timeit(lambda xx: m.apply({"params": params}, xx), x)
    print(f"  patch_embed+LN: {sec * 1e3:6.2f} ms")

    res, dim = 64, cfg.embed_dim
    for stage in range(3):
        mm = PatchMerging(dim=dim, resolution=(res, res))
        xx = jnp.asarray(
            rng.normal(size=(batch, res * res, dim)), dtype
        )
        p = jax.tree.map(
            lambda v: v.astype(dtype)
            if jnp.issubdtype(v.dtype, jnp.floating) else v,
            mm.init(jax.random.key(0), xx)["params"],
        )
        sec = timeit(lambda a: mm.apply({"params": p}, a), xx)
        print(f"  merge{stage} ({res}->{res // 2}, C={dim}): {sec * 1e3:6.2f} ms")
        res //= 2
        dim *= 2

    xf = jnp.asarray(rng.normal(size=(batch, 64, 1024)), dtype)
    ln = nn.LayerNorm(epsilon=cfg.layer_norm_eps)
    p = ln.init(jax.random.key(0), xf)["params"]
    sec = timeit(lambda a: ln.apply({"params": p}, a), xf)
    print(f"  final LN: {sec * 1e3:6.2f} ms")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--impls", nargs="+", default=["xla", "fused"])
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--model", action="store_true",
                    help="also time full Poser predict vs backbone alone")
    ap.add_argument("--glue", action="store_true",
                    help="time patch embed, merges, final LN instead of blocks")
    ap.add_argument("--decode", action="store_true",
                    help="split non-backbone predict cost (decode vs MANO FK)")
    ap.add_argument("--train", action="store_true",
                    help="time backbone fwd+bwd per impl instead of fwd-only")
    ap.add_argument("--train-stages", action="store_true",
                    help="per-stage fwd+dx+dw (attributes the backward per "
                         "stage; stage 3 is the XLA-remat path)")
    ap.add_argument("--stages", type=int, nargs="+", default=None,
                    help="restrict per-stage profiling to these stage indices")
    args = ap.parse_args()
    if args.train:
        dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
        from cs_vit_tpu.models.swinv2 import SwinV2

        cfg = swinv2_base_256()
        rng = np.random.default_rng(0)
        imgs = jnp.asarray(rng.uniform(size=(args.batch, 256, 256, 3)), dtype)
        for impl in args.impls:
            bb = SwinV2(cfg, attention_impl=impl)
            params = jax.tree.map(
                lambda v: v.astype(dtype)
                if jnp.issubdtype(v.dtype, jnp.floating) else v,
                bb.init(jax.random.key(0), imgs)["params"],
            )

            def fwd(x, p):
                return jnp.sum(
                    bb.apply({"params": p}, x).astype(jnp.float32) ** 2
                )

            def fwdbwd(x, p):
                l, g = jax.value_and_grad(fwd, argnums=(0,))(x, p)
                return l + sum(jnp.sum(gg.astype(jnp.float32) ** 2)
                               for gg in jax.tree.leaves(g))

            def fullgrad(x, p):
                l, g = jax.value_and_grad(fwd, argnums=(0, 1))(x, p)
                return l + sum(jnp.sum(gg.astype(jnp.float32) ** 2)
                               for gg in jax.tree.leaves(g))

            t_f = timeit(fwd, imgs, params)
            t_fx = timeit(fwdbwd, imgs, params)
            t_fb = timeit(fullgrad, imgs, params)
            print(
                f"  backbone[{impl}] b{args.batch}: fwd {t_f * 1e3:7.2f} ms | "
                f"fwd+dx {t_fx * 1e3:7.2f} | fwd+dx+dw {t_fb * 1e3:7.2f} | "
                f"train-side crops/s {args.batch / t_fb:7.1f}"
            )
        return
    if args.glue:
        dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
        print(f"glue ops, batch {args.batch}, {args.dtype}")
        profile_glue(args.batch, dtype)
        return
    if args.decode:
        dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
        print(f"decode split, batch {args.batch}, {args.dtype}")
        for impl in args.impls:
            profile_decode(impl, args.batch, dtype)
        return
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    cfg = swinv2_base_256()
    print(f"Swin-B 256, batch {args.batch}, {args.dtype}")
    totals = {impl: 0.0 for impl in args.impls}
    for stage in range(cfg.num_layers):
        if args.stages is not None and stage not in args.stages:
            continue
        row = [f"stage{stage} ({cfg.depths[stage]} blocks)"]
        for impl in args.impls:
            sec, depth = profile_stage(
                cfg, stage, impl, args.batch, dtype, train=args.train_stages
            )
            totals[impl] += sec
            row.append(f"{impl}: {sec * 1e3:7.2f} ms ({sec * 1e3 / depth:.2f}/blk)")
        print("  " + " | ".join(row))
    print("  total blocks: " + " | ".join(
        f"{impl}: {totals[impl] * 1e3:7.2f} ms" for impl in args.impls
    ))
    if args.model:
        for impl in args.impls:
            t_full, t_bb = profile_model(impl, args.batch, dtype)
            print(
                f"  model[{impl}]: predict {t_full * 1e3:7.2f} ms | backbone "
                f"{t_bb * 1e3:7.2f} ms | non-backbone {(t_full - t_bb) * 1e3:6.2f} ms"
                f" | {args.batch / t_full:7.1f} crops/s"
            )


if __name__ == "__main__":
    main()
