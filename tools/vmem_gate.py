"""Scoped-VMEM gate for the fused SwinV2 block kernels (VERDICT r3 item 5).

Compiles (no execution) the fused forward and backward Pallas kernels for
every production Swin-B-256 stage geometry at the bench operating points
(predict b256, train b64, bf16) and FAILS if Mosaic cannot schedule them
within the production vmem_limit — the gate that would have caught the
round-3 stage-2 backward OOM (`Used 128.75M of 128.00M`) before the
driver's bench did. Run after ANY change to `ops/fused_block.py`:

  python tools/vmem_gate.py            # compile at production limits
  python tools/vmem_gate.py --measure  # bisect actual scoped usage/margin

`--measure` binary-searches the vmem_limit cliff per kernel (several extra
remote compiles each) and prints a usage/margin table for BASELINE.md.

Needs the TPU tunnel (Mosaic limits are not enforced in CPU interpret mode).
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MB = 2**20

# Swin-B-256 production geometries: (name, res, ws, shift, C, heads).
# Stage 3 (C=1024) backward deliberately runs on XLA-remat
# (fused_block._PALLAS_BWD_MAX_DIM = 512), so its bwd is not gated.
STAGES = [
    ("s0",  64, 16, 0, 128, 4),
    ("s0s", 64, 16, 8, 128, 4),
    ("s1",  32, 16, 0, 256, 8),
    ("s1s", 32, 16, 8, 256, 8),
    ("s2",  16, 16, 0, 512, 16),
    ("s3",   8,  8, 0, 1024, 32),
]
PREDICT_BATCH = 256
TRAIN_BATCH = 64


def build_fns(res, ws, shift, C, heads, B, train):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cs_vit_tpu.models.swinv2 import SwinV2Block, SwinV2Config

    cfg = SwinV2Config(
        image_size=res * 4, patch_size=4, embed_dim=C, depths=(1,),
        num_heads=(heads,), window_size=ws, drop_path_rate=0.0,
    )
    block = SwinV2Block(
        config=cfg, dim=C, resolution=(res, res), num_heads=heads,
        shift_size=shift, drop_path_rate=0.0, attention_impl="fused",
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, res * res, C)), jnp.bfloat16)
    params = jax.tree.map(
        lambda v: v.astype(jnp.bfloat16)
        if jnp.issubdtype(v.dtype, jnp.floating) else v,
        block.init(jax.random.key(0), x),
    )
    if train:
        def f(p, xx):
            y = block.apply(p, xx)
            return jnp.sum(y.astype(jnp.float32) ** 2)

        return jax.jit(jax.grad(f, argnums=(0, 1))), (params, x)
    return jax.jit(block.apply), (params, x)


def try_compile(fn, args) -> tuple[bool, str]:
    try:
        fn.lower(*args).compile()
        return True, ""
    except Exception as e:  # Mosaic OOM surfaces as a compile error
        return False, str(e).splitlines()[0][:200]


def measure_cliff(make, lo_mb=8, hi_mb=128):
    """Bisect the smallest vmem_limit (MB) at which the kernel compiles."""
    from cs_vit_tpu.ops import fused_block as fb

    def fits(limit_mb):
        fb._FWD_VMEM_LIMIT = fb._BWD_VMEM_LIMIT = limit_mb * MB
        import jax

        jax.clear_caches()
        fn, args = make()
        ok, _ = try_compile(fn, args)
        return ok

    if not fits(hi_mb):
        return None  # does not fit at all
    lo, hi = lo_mb, hi_mb  # invariant: fails at lo (or lo==lo_mb), fits at hi
    while hi - lo > 2:
        mid = (lo + hi) // 2
        if fits(mid):
            hi = mid
        else:
            lo = mid
    return hi


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--measure", action="store_true")
    ap.add_argument("--stages", nargs="*", default=None)
    args = ap.parse_args()

    from cs_vit_tpu.ops import fused_block as fb

    prod_fwd, prod_bwd = fb._FWD_VMEM_LIMIT, fb._BWD_VMEM_LIMIT
    failures = []
    for name, res, ws, shift, C, heads in STAGES:
        if args.stages and name not in args.stages:
            continue
        for mode in ("fwd", "bwd"):
            if mode == "bwd" and C > fb._PALLAS_BWD_MAX_DIM:
                continue
            B = TRAIN_BATCH if mode == "bwd" else PREDICT_BATCH
            make = functools.partial(
                build_fns, res, ws, shift, C, heads, B, mode == "bwd"
            )
            fb._FWD_VMEM_LIMIT, fb._BWD_VMEM_LIMIT = prod_fwd, prod_bwd
            import jax

            jax.clear_caches()
            t0 = time.time()
            fn, fargs = make()
            ok, err = try_compile(fn, fargs)
            line = (f"{name:4s} {mode} b{B:<4d} C={C:<5d} "
                    f"compile {'OK' if ok else 'FAIL'} ({time.time()-t0:.0f}s)")
            if not ok:
                failures.append((name, mode, err))
                line += f"  {err}"
            if ok and args.measure:
                cliff = measure_cliff(make)
                prod = (prod_bwd if mode == "bwd" else prod_fwd) // MB
                margin = 100.0 * (prod - cliff) / prod if cliff else 0.0
                line += f"  usage<={cliff}MB of {prod}MB (margin {margin:.0f}%)"
            print(line, flush=True)
    fb._FWD_VMEM_LIMIT, fb._BWD_VMEM_LIMIT = prod_fwd, prod_bwd
    if failures:
        print(f"\nVMEM GATE FAILED: {len(failures)} kernel(s) do not fit")
        sys.exit(1)
    print("\nVMEM GATE OK")


if __name__ == "__main__":
    main()
