"""Component-level timing of the non-backbone decode path (TPU).

Times each decode component standalone — and each at f32 vs bf16
activations — plus the composed decode_pose/predict, to find where the
time (and any silent f32 promotion) lives.

Measured (v5e, batch 256, bf16, post in-kernel-roll kernels): predict
127.1 ms ≈ decode_pose 126.3 ms — i.e. everything outside the backbone
(spatial encoder 1.2 ms, MANO FK / persp sampling / decoders ≲0.01 ms
each) totals ~2 ms. The earlier "predict = backbone + 27 ms" split was
the f32-normalization promotion, since fixed in Poser.decode_pose.

  python tools/profile_decode_parts.py --batch 256
"""

from __future__ import annotations

import argparse
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.profile_stages import timeit  # noqa: E402
from cs_vit_tpu.models.poser import sample_persp_dir_vec  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    args = ap.parse_args()

    from cs_vit_tpu.cli.common import build_model, init_variables
    from cs_vit_tpu.config import FinetuneConfig

    cfg = FinetuneConfig(
        exp="prof", backbone="swinv2-base-256", img_size=256,
        phase="inference", data=["dexycb"], batch_size=args.batch,
    )
    model = build_model(cfg)
    variables = init_variables(model, cfg, seq_len=1)
    params_bf = jax.tree.map(
        lambda v: v.astype(jnp.bfloat16)
        if jnp.issubdtype(v.dtype, jnp.floating) else v,
        variables["params"],
    )
    stats = variables.get("batch_stats", {})
    B = args.batch
    D = model.config.hidden_dim
    rng = np.random.default_rng(0)

    def run(name, method, *xs):
        for dt, tag in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
            cast = [
                x.astype(dt) if jnp.issubdtype(x.dtype, jnp.floating) else x
                for x in xs
            ]

            def f(x0, prm, st, *rest):
                out = model.apply(
                    {"params": prm, "batch_stats": st}, x0, *rest,
                    method=method,
                )
                # timeit sums the result — collapse dict/tuple outputs
                return sum(
                    jnp.sum(leaf.astype(jnp.float32))
                    for leaf in jax.tree.leaves(out)
                )

            t = timeit(f, cast[0], params_bf, stats, *cast[1:])
            print(f"  {name:28s} [{tag:4s}]: {t * 1e3:7.2f} ms")

    persp = jnp.asarray(rng.normal(size=(B, 512)) * 0.1)
    run("perspective_mlp", lambda m, x: m.perspective_mlp(x, train=False), persp)

    q = jnp.asarray(rng.normal(size=(B, 3, D)) * 0.1)
    ctx = jnp.asarray(rng.normal(size=(B, 64, D)) * 0.1)
    run(
        "spatial_encoder (ctx 64)",
        lambda m, qq, cc: m.spatial_encoder(qq, cc, train=False),
        q, ctx,
    )

    tq = jnp.asarray(rng.normal(size=(B, 1, D)) * 0.1)
    run(
        "temporal_encoder (T=1) x1",
        lambda m, x: m.pose_temporal_encoder(x, train=False),
        tq,
    )

    run("pose_decoder", lambda m, x: m.pose_decoder(x), tq)

    pose6 = jnp.asarray(rng.normal(size=(B, 1, 16, 6)) * 0.1)

    def rots(m, p6):
        from cs_vit_tpu.core.geometry import (
            matrix_to_axis_angle,
            rotation_6d_to_matrix,
        )

        return matrix_to_axis_angle(rotation_6d_to_matrix(p6))

    run("rot6d->matrix->aa", rots, pose6)

    # --- the predict-path glue the component list above misses ---

    pose_aa = jnp.asarray(rng.normal(size=(B, 1, 16, 3)) * 0.1)
    shape = jnp.asarray(rng.normal(size=(B, 1, 10)) * 0.1)
    rtn = jnp.asarray(rng.normal(size=(B, 1, 3)) * 0.1)
    run(
        "pose_fk (MANO LBS)",
        lambda m, p, s, r: m.pose_fk(p, s, r),
        pose_aa, shape, rtn,
    )

    bboxes = jnp.asarray(
        np.tile(np.array([40.0, 40.0, 200.0, 200.0]), (B, 1, 1))
    )
    focal = jnp.full((B, 1, 2), 500.0)
    princpt = jnp.full((B, 1, 2), 128.0)
    run(
        "sample_persp_dir_vec (dense16)",
        lambda m, bb, f, p: sample_persp_dir_vec(16, bb, f, p),
        bboxes, focal, princpt,
    )

    img = jnp.asarray(rng.normal(size=(B, 1, 256, 256, 3)) * 0.2 + 0.5)
    ts = jnp.zeros((B, 1))
    if model.config.persp_embed_method == "dense":
        dirs = sample_persp_dir_vec(16, bboxes, focal, princpt)
    else:
        from cs_vit_tpu.models.poser import sparse_corner_coords

        dirs = sparse_corner_coords(bboxes, focal, princpt)
    run(
        "decode_pose (backbone incl.)",
        lambda m, im, t, d: m.decode_pose(im, t, d, phase="inference"),
        img, ts, dirs,
    )
    run(
        "predict (full)",
        lambda m, im, bb, t, f, p: m.predict(im, bb, t, f, p),
        img, bboxes, ts, focal, princpt,
    )


if __name__ == "__main__":
    main()
