"""Inference demo (parity: reference `notebook/demo.ipynb`).

Loads a Poser checkpoint, runs predict on an image (or a synthetic one),
draws the reprojected skeleton on the crop, writes a PNG, and prints the
camera-space joints.

  python tools/demo.py --ckpt checkpoints/exp/checkpoint \
      --config checkpoints/exp/config.json [--image img.jpg --bbox x1 y1 x2 y2]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import cv2
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", default=None)
    p.add_argument("--config", default=None)
    p.add_argument("--image", default=None)
    p.add_argument("--bbox", type=float, nargs=4, default=None, help="tight xyxy")
    p.add_argument("--focal", type=float, nargs=2, default=[600.0, 600.0])
    p.add_argument("--princpt", type=float, nargs=2, default=None)
    p.add_argument("--out", default="demo_out.png")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from cs_vit_tpu.cli.common import build_model, init_variables
    from cs_vit_tpu.config import FinetuneConfig
    from cs_vit_tpu.evaluation import reproject_pinhole
    from cs_vit_tpu.ops.resample import crop_with_square_box_np
    from cs_vit_tpu.train import merge_params, restore_checkpoint
    from cs_vit_tpu.utils.vis import reprojection_grid

    cfg = (
        FinetuneConfig.from_json_file(args.config)
        if args.config
        else FinetuneConfig(exp="demo", backbone="swinv2-tiny-256", phase="inference")
    )
    model = build_model(cfg)
    variables = init_variables(model, cfg, seq_len=1)
    params, stats = variables["params"], variables.get("batch_stats", {})
    if args.ckpt:
        loaded = restore_checkpoint(args.ckpt)
        params, _ = merge_params(params, loaded.get("params", loaded))
        if "batch_stats" in loaded:
            stats, _ = merge_params(stats, loaded["batch_stats"])
        print(f"loaded {args.ckpt}")

    S = cfg.img_size
    if args.image:
        img = cv2.cvtColor(cv2.imread(args.image), cv2.COLOR_BGR2RGB)
        img = img.astype(np.float32) / 255.0
        bbox = np.asarray(
            args.bbox
            or [img.shape[1] * 0.25, img.shape[0] * 0.25,
                img.shape[1] * 0.75, img.shape[0] * 0.75],
            np.float32,
        )
        princpt = np.asarray(
            args.princpt or [img.shape[1] / 2, img.shape[0] / 2], np.float32
        )
    else:
        print("no --image given; running on a synthetic frame")
        img = np.random.default_rng(0).uniform(size=(480, 640, 3)).astype(np.float32)
        bbox = np.asarray([200.0, 140.0, 440.0, 380.0], np.float32)
        princpt = np.asarray([320.0, 240.0], np.float32)

    patch, _, square = crop_with_square_box_np(
        img[None], bbox[None], cfg.expansion_ratio, S
    )
    batch = dict(
        img_tensor=jnp.asarray(patch[None]),                      # [1,1,S,S,3]
        square_bboxes=jnp.asarray(square[None]),                  # [1,1,4]
        timestamp=jnp.zeros((1, 1)),
        focal=jnp.asarray(np.asarray(args.focal, np.float32)[None, None]),
        princpt=jnp.asarray(princpt[None, None]),
    )
    predict = model.apply(
        {"params": params, "batch_stats": stats},
        batch["img_tensor"], batch["square_bboxes"], batch["timestamp"],
        batch["focal"], batch["princpt"], "inference",
        method=model.predict,
    )
    joints = np.asarray(predict["joint_cam"][0, 0])
    print("joint_cam (mm), wrist:", joints[0], "| mean depth:", joints[:, 2].mean())

    reproj = reproject_pinhole(
        np.asarray(predict["joint_cam"]),
        np.asarray(batch["focal"]),
        np.asarray(batch["princpt"]),
    )[0]
    grid = reprojection_grid(patch, square, reproj)
    cv2.imwrite(args.out, cv2.cvtColor((grid * 255).astype(np.uint8), cv2.COLOR_RGB2BGR))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
