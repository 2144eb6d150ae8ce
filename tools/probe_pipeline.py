"""End-to-end input-pipeline overlap proof on the TPU (BASELINE goal:
"input pipeline overlapped so the MXU never waits on preprocessing").

Measures, with the REAL production pieces (synthetic 640x480-JPEG DexYCB
fixture -> threaded `DataLoader` -> `device_prefetch` -> the jitted
train/eval step on Swin-B):

  host  : loader-only crops/s (decode + aug + C fast-crop + collate)
  device: step-only crops/s (preloaded batch, sequential donated chain)
  piped : full loader->prefetch->step wall-clock crops/s

and reports ``overlap_efficiency = piped / min(host, device)`` — 1.0 means
the pipeline runs at the slower stage's rate (perfect overlap); a serial
pipeline would sit at ``1/(1/host + 1/device)``. Whether `min()` is the host
or the device is a core-count question: at ~60-100 crops/s/core the host
needs ~ceil(device/host_per_core) loader cores to keep one chip fed (the
number is printed).

    python tools/probe_pipeline.py --mode train --batch 64 --steps 8
    python tools/probe_pipeline.py --mode eval  --batch 128 --steps 8

Matches the reference's dataloader-worker overlap design
(`scripts/finetune.py:103-111,209-231`).
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def build(args):
    from cs_vit_tpu.cli.common import build_model, init_variables
    from cs_vit_tpu.config import FinetuneConfig
    from cs_vit_tpu.data import DataLoader, DexYCB
    from cs_vit_tpu.data.fixtures import make_synthetic_dexycb

    root = args.fixture_root or tempfile.mkdtemp(prefix="probe_pipe_")
    split = "train" if args.mode == "train" else "test"
    if not os.path.exists(os.path.join(root, "s1_train.h5")):
        need = args.batch * (args.steps + 2)
        seq_len = 40
        make_synthetic_dexycb(
            root,
            num_seqs=max(2, math.ceil(need / seq_len)),
            seq_len=seq_len,
            img_hw=(480, 640),
            splits=("train", "test"),
        )
    ds = DexYCB(root, 1, "s1", split, img_size=256)
    loader = DataLoader(
        ds, batch_size=args.batch, shuffle=(split == "train"), drop_last=True,
        num_workers=args.workers, prefetch=4,
    )

    impl = "fused" if jax.default_backend() == "tpu" else "xla"
    cfg = FinetuneConfig(
        exp="probe_pipe", backbone=args.backbone, img_size=256,
        phase="spatial" if args.mode == "train" else "inference",
        data=["dexycb"], batch_size=args.batch, attention_impl=impl,
        dtype="bfloat16",
    )
    model = build_model(cfg)
    variables = init_variables(model, cfg, seq_len=1)
    return root, loader, model, variables, cfg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["train", "eval"], default="train")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--workers", type=int, default=os.cpu_count() or 1)
    ap.add_argument("--backbone", default="swinv2-base-256")
    ap.add_argument("--fixture_root", default=None,
                    help="reuse an existing synthetic DexYCB root")
    args = ap.parse_args()

    from cs_vit_tpu.parallel import fitting_mesh, replicate_state, shard_batch
    from cs_vit_tpu.parallel.prefetch import device_prefetch
    from cs_vit_tpu.train import TrainState, build_optimizer, make_eval_step, make_train_step

    root, loader, model, variables, cfg = build(args)
    mesh = fitting_mesh(args.batch)
    n_batches = min(args.steps, len(loader))
    assert n_batches >= 3, f"fixture too small: {len(loader)} batches"

    # --- 1. host-only loader rate (second epoch: page cache warm) ---------
    for _ in loader:
        break  # touch files once
    t0 = time.perf_counter()
    seen = 0
    for i, b in enumerate(loader):
        seen += b["patches"].shape[0]
        if i + 1 >= n_batches:
            break
    host_cps = seen / (time.perf_counter() - t0)

    # --- 2. device-only step rate (preloaded batch, donated chain) --------
    drop = ("imgs_path", "flip")
    host_batch = next(iter(loader))
    dev_batch = shard_batch({k: v for k, v in host_batch.items() if k not in drop}, mesh)

    if args.mode == "train":
        tx = build_optimizer(variables["params"], "spatial", 1e-4)
        state = TrainState.create(
            {"params": variables["params"],
             "batch_stats": variables.get("batch_stats", {})}, tx,
        )
        state = replicate_state(state, mesh)
        # donate=False: the probe reruns from the same state several times
        step = make_train_step(
            model, tx, "spatial", donate=False, compute_dtype=jnp.bfloat16,
            mesh=mesh if mesh.shape.get("data", 1) > 1 else None,
        )

        def run_device_only(n):
            s = state
            rng = jax.random.key(0)
            for i in range(n):
                rng, k = jax.random.split(rng)
                s, metrics = step(s, dev_batch, k)
            jax.device_get(metrics["loss"])  # force the whole chain

        def run_pipelined(n):
            s = state
            rng = jax.random.key(0)
            metrics = None
            # bf16 patches on the wire: the step casts in-graph anyway, so
            # compute is bit-identical and H2D bytes halve (the link is the
            # bottleneck on this rig: 42 MB/s tunnel, BASELINE.md round 4)
            for i, batch in enumerate(
                device_prefetch(loader, mesh, patches_dtype=jnp.bfloat16)
            ):
                rng, k = jax.random.split(rng)
                s, metrics = step(s, batch, k)
                if i + 1 >= n:
                    break
            jax.device_get(metrics["loss"])
    else:
        eval_step = make_eval_step(
            model, mesh=mesh if mesh.shape.get("data", 1) > 1 else None
        )
        params = variables["params"]
        stats = variables.get("batch_stats", {})

        def run_device_only(n):
            outs = []
            for _ in range(n):
                outs.append(eval_step(params, stats, dev_batch)["joint_cam"])
            jax.device_get([o.sum() for o in outs])

        def run_pipelined(n):
            # the software-pipelined eval pattern (cli/evaluate.py:105-116):
            # dispatch batch i, then fetch batch i-1 while i computes
            pending = None
            got = []
            for i, batch in enumerate(device_prefetch(loader, mesh)):
                pred = eval_step(params, stats, batch)["joint_cam"]
                if pending is not None:
                    got.append(np.asarray(jax.device_get(pending)).mean())
                pending = pred
                if i + 1 >= n:
                    break
            got.append(np.asarray(jax.device_get(pending)).mean())

    # compile + warm
    run_device_only(1)
    run_device_only(1)
    t0 = time.perf_counter()
    run_device_only(n_batches)
    dev_cps = n_batches * args.batch / (time.perf_counter() - t0)

    run_pipelined(2)  # warm the pipelined path
    t0 = time.perf_counter()
    run_pipelined(n_batches)
    piped_cps = n_batches * args.batch / (time.perf_counter() - t0)

    bound = min(host_cps, dev_cps)
    serial = 1.0 / (1.0 / host_cps + 1.0 / dev_cps)
    host_cores = args.workers
    cores_needed = math.ceil(dev_cps / max(host_cps / host_cores, 1e-9))
    print(json.dumps({
        "metric": f"pipeline_overlap_{args.mode}",
        "value": round(piped_cps, 1),
        "unit": "crops/s",
        "extra": {
            "mode": args.mode,
            "batch": args.batch,
            "steps": n_batches,
            "workers": args.workers,
            "host_crops_per_sec": round(host_cps, 1),
            "device_crops_per_sec": round(dev_cps, 1),
            "piped_crops_per_sec": round(piped_cps, 1),
            "overlap_efficiency": round(piped_cps / bound, 3),
            "serial_would_be": round(serial, 1),
            "bound_by": "host" if host_cps < dev_cps else "device",
            "loader_cores_to_feed_one_chip": cores_needed,
        },
    }))


if __name__ == "__main__":
    main()
