"""Low-batch serving-latency table (VERDICT r3 item 6).

Measures single-chip Swin-B spatial Poser predict LATENCY (ms/batch) at
serving batch sizes, fused-kernel vs XLA attention, bf16 — the baseline any
tensor-parallel deployment must beat. TP's claimed purpose is memory/
latency-bound serving (`parallel/tp.py:17-20`); on this 1-chip pod-slice the
psum-vs-fusion crossover cannot be measured (BASELINE.md round 3), so this
table establishes the single-chip side of that comparison and documents the
crossover condition: TP-N wins only when fused-latency(b) > TP-split
latency(b) + 2 psums/block, i.e. at batch < n_devices with strict latency
SLOs.

  python tools/profile_serving_latency.py --batches 1 2 4 8 --impls fused xla

Timing: chained fori_loop marginal cost (block_until_ready is a no-op
through the axon tunnel, CLAUDE.md).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="*", default=[1, 2, 4, 8])
    ap.add_argument("--impls", nargs="*", default=["fused", "xla"])
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--backbone", default="swinv2-base-256")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import bench_predict, cast_params, make_batch
    from cs_vit_tpu.cli.common import build_model, init_variables
    from cs_vit_tpu.config import FinetuneConfig

    rng = np.random.default_rng(0)
    results = {}
    for impl in args.impls:
        cfg = FinetuneConfig(
            exp="serve", backbone=args.backbone, img_size=256,
            phase="spatial", data=["dexycb"], batch_size=max(args.batches),
            attention_impl=impl,
        )
        model = build_model(cfg)
        variables = init_variables(model, cfg, seq_len=1)
        params = cast_params(variables["params"], jnp.bfloat16)
        stats = variables.get("batch_stats", {})
        for B in args.batches:
            batch = make_batch(B, 1, 256, rng)
            batch["patches"] = batch["patches"].astype(jnp.bfloat16)
            t = bench_predict(model, params, stats, batch, args.iters)
            ms = t * 1e3
            results[f"{impl}_b{B}"] = round(ms, 3)
            print(f"  {impl:5s} b{B:<3d}: {ms:7.2f} ms/batch "
                  f"({B / t:7.1f} crops/s)", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
