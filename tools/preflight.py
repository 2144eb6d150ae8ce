"""Pre-capture gate for bench.py (VERDICT r4 item 5).

Two checks, both on SMALL standalone block graphs (never the full model, so
a degraded remote-compile night costs seconds-to-minutes, not half an hour):

  1. VMEM gate — compile the fused SwinV2 fwd/bwd Pallas kernels for every
     production Swin-B-256 stage geometry at the bench operating points
     within the production scoped-VMEM limits (tools/vmem_gate.py STAGES;
     the r3 stage-2 `Used 128.75M of 128.00M` class of regression).
  2. Parity — execute fused-vs-XLA on representative block geometries
     (shifted stage-0 fwd, stage-3 fwd, shifted stage-1 fwd+bwd grads) and
     require rel err < 2e-2 (fwd) / 5e-2 (bwd), the tolerances
     tools/_tpu_parity_check.py established on real TPU.

Prints ONE JSON line:
  {"status": "ok"|"fail"|"error: ...", "seconds": N,
   "vmem_fail": [...], "parity_fail": [...]}      # or {"cached": true}
Exit 0 ok / 1 kernel fail / 2 infra error. bench.py runs this in a
subprocess (with a timeout) before its timed sections and degrades to
attention_impl=xla on "fail" (status or exit code 1) — a deliberately-
broken kernel fails HERE, visibly, instead of corrupting the driver's
capture.

Needs the TPU tunnel (Mosaic VMEM limits are not enforced in CPU interpret
mode).
"""

from __future__ import annotations

import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)

from vmem_gate import STAGES, PREDICT_BATCH, TRAIN_BATCH, build_fns, try_compile  # noqa: E402

MARKER = os.path.join(os.path.dirname(_HERE), ".preflight_ok")
# Everything the compiled kernels' fit/numerics can depend on: the kernel
# source, the block wrapper that drives it, the gate geometries, this file,
# and the runtime knobs that change what gets compiled.
_HASH_FILES = ("cs_vit_tpu/ops/fused_block.py", "cs_vit_tpu/models/swinv2.py",
               "tools/vmem_gate.py", "tools/preflight.py")
_HASH_ENV = ("FUSED_BLOCK_BF16_SOFTMAX", "FUSED_BLOCK_VARIANT",
             "FUSED_BLOCK_BWD_MAX_DIM")


def digest() -> str:
    import hashlib

    h = hashlib.sha256()
    root = os.path.dirname(_HERE)
    for rel in _HASH_FILES:
        with open(os.path.join(root, rel), "rb") as f:
            h.update(f.read())
    for k in _HASH_ENV:
        h.update(f"{k}={os.environ.get(k, '')};".encode())
    return h.hexdigest()


PARITY_CASES = [
    # (res, ws, shift, dim, heads, B, check_bwd)
    (64, 16, 8, 128, 4, 4, False),   # shifted stage 0 (mask path)
    (32, 16, 8, 256, 8, 4, True),    # shifted stage 1, Pallas bwd covered
    (8, 8, 0, 1024, 32, 8, False),   # stage 3 (fused bwd is XLA-remat)
]
FWD_TOL = 2e-2
BWD_TOL = 5e-2


def check_vmem():
    from cs_vit_tpu.ops import fused_block as fb

    results = []
    for name, res, ws, shift, C, heads in STAGES:
        for mode in ("fwd", "bwd"):
            if mode == "bwd" and C > fb._PALLAS_BWD_MAX_DIM:
                continue
            B = TRAIN_BATCH if mode == "bwd" else PREDICT_BATCH
            t0 = time.time()
            fn, fargs = build_fns(res, ws, shift, C, heads, B, mode == "bwd")
            ok, err = try_compile(fn, fargs)
            results.append({
                "stage": f"{name}:{mode}", "ok": ok,
                "seconds": round(time.time() - t0, 1),
                **({"err": err} if not ok else {}),
            })
            print(f"#   vmem {name}:{mode} {'OK' if ok else 'FAIL ' + err}",
                  flush=True)
    return results


def check_parity():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cs_vit_tpu.models.swinv2 import SwinV2Block, SwinV2Config

    def make(impl, res, ws, shift, dim, heads):
        cfg = SwinV2Config(
            image_size=res * 4, patch_size=4, embed_dim=dim, depths=(1,),
            num_heads=(heads,), window_size=ws, drop_path_rate=0.0,
        )
        return SwinV2Block(
            config=cfg, dim=dim, resolution=(res, res), num_heads=heads,
            shift_size=shift, drop_path_rate=0.0, attention_impl=impl,
        )

    rng = np.random.default_rng(0)
    results = []
    for res, ws, shift, dim, heads, B, check_bwd in PARITY_CASES:
        t0 = time.time()
        x = jnp.asarray(rng.normal(size=(B, res * res, dim)), jnp.float32)
        ref = make("xla", res, ws, shift, dim, heads)
        fus = make("fused", res, ws, shift, dim, heads)
        params = ref.init(jax.random.key(0), x)
        yr = np.asarray(jax.jit(ref.apply)(params, x))
        yf = np.asarray(jax.jit(fus.apply)(params, x))
        fwd_err = float(np.max(np.abs(yr - yf)) / (np.abs(yr).max() + 1e-9))
        entry = {
            "case": f"res{res}_ws{ws}_s{shift}_C{dim}",
            "fwd_rel_err": round(fwd_err, 5),
            "ok": fwd_err < FWD_TOL,
        }
        if check_bwd:
            def loss(mod):
                return jax.jit(jax.grad(
                    lambda p, xx: jnp.sum(
                        mod.apply(p, xx).astype(jnp.float32) ** 2
                    ),
                    argnums=1,
                ))

            gr = np.asarray(loss(ref)(params, x))
            gf = np.asarray(loss(fus)(params, x))
            bwd_err = float(np.max(np.abs(gr - gf)) / (np.abs(gr).max() + 1e-9))
            entry["bwd_rel_err"] = round(bwd_err, 5)
            entry["ok"] = entry["ok"] and bwd_err < BWD_TOL
        entry["seconds"] = round(time.time() - t0, 1)
        results.append(entry)
        print(f"#   parity {entry['case']} "
              f"{'OK' if entry['ok'] else 'FAIL'} {entry}", flush=True)
    return results


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--force", action="store_true",
                    help="re-run even when the cached green marker matches")
    args = ap.parse_args()

    t0 = time.time()
    d = digest()
    if not args.force and os.path.exists(MARKER):
        try:
            with open(MARKER) as f:
                if f.read().strip() == d:
                    print(json.dumps({"status": "ok", "cached": True,
                                      "seconds": 0.0}))
                    sys.exit(0)
        except OSError:
            pass
    try:
        vmem = check_vmem()
        parity = check_parity()
        ok = all(r["ok"] for r in vmem) and all(r["ok"] for r in parity)
        out = {
            "status": "ok" if ok else "fail",
            "seconds": round(time.time() - t0, 1),
            "vmem_fail": [r["stage"] for r in vmem if not r["ok"]],
            "parity_fail": [r["case"] for r in parity if not r["ok"]],
        }
    except Exception as e:  # infra error, not a kernel verdict
        out = {"status": f"error: {type(e).__name__}: {e}"[:200],
               "seconds": round(time.time() - t0, 1)}
    if out["status"] == "ok":
        # green marker: same-digest future runs (the nightly driver bench)
        # skip the ~4-25 min of standalone remote compiles; ANY change to
        # the hashed kernel sources or knobs invalidates it.
        with open(MARKER, "w") as f:
            f.write(d + "\n")
    elif out["status"] == "fail" and os.path.exists(MARKER):
        # a kernel VERDICT invalidates the marker; an infra "error:" (tunnel
        # flake mid-gate) does NOT — the existing marker still certifies the
        # unchanged digest from its own green run.
        os.unlink(MARKER)
    print(json.dumps(out))
    # exit code carries the verdict even if stdout is garbled:
    # 0 ok / 1 kernel fail / 2 infra error (bench degrades only on 1)
    sys.exit(0 if out["status"] == "ok"
             else 1 if out["status"] == "fail" else 2)


if __name__ == "__main__":
    main()
