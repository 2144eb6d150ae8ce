"""Distributed evaluation -> HDF5 dump (parity: `scripts/eval.py`).

python -m cs_vit_tpu.cli.evaluate --exp myexp --data dexycb --eval_ckpt <path>
"""

from __future__ import annotations

import argparse
import os
from datetime import datetime

import jax
import numpy as np

from ..config import FinetuneConfig
from ..evaluation import (
    EvalH5Writer,
    gather_strings_to_host0,
    gather_to_host0,
    reproject_pinhole,
)
from ..parallel import fitting_mesh, replicate_state, shard_batch
from ..train import make_eval_step, merge_params, restore_checkpoint
from ..utils.logging import nop, wrap_prefix_print
from .common import (
    build_datasets,
    build_loader,
    build_model,
    init_variables,
    maybe_init_distributed,
)


def main(cfg: FinetuneConfig, ckpt_root: str = "./checkpoints", h5_path: str | None = None):
    # eval protocol guard (ref `eval.py:198-201`)
    assert (
        cfg.phase == "temporal" and cfg.temporal_supervision == "realtime"
    ) or cfg.phase == "spatial", "eval supports spatial or temporal+realtime"

    is_main = jax.process_index() == 0
    print_ = wrap_prefix_print(f"[{jax.process_index()}] ") if is_main else nop

    if h5_path is None:
        date_str = datetime.now().strftime("%Y%m%d")
        h5_path = os.path.join(
            ckpt_root, cfg.exp,
            f"eval_{cfg.data if isinstance(cfg.data, str) else cfg.data[0]}_"
            f"{cfg.phase}_{cfg.temporal_supervision}_{date_str}.h5",
        )
        os.makedirs(os.path.dirname(h5_path), exist_ok=True)

    dataset = build_datasets(cfg, "test")
    loader = build_loader(cfg, dataset, shuffle=False)

    # latent constraints are train-only; eval drops them (ref `eval.py:146`)
    cfg.num_latent_layer = None
    model = build_model(cfg)
    seq_len = 1 if cfg.phase == "spatial" else (cfg.seq_len or 7)
    variables = init_variables(model, cfg, seq_len)
    params, batch_stats = variables["params"], variables.get("batch_stats", {})
    if cfg.eval_ckpt:
        loaded = restore_checkpoint(cfg.eval_ckpt)
        params, skipped = merge_params(params, loaded.get("params", loaded))
        if "batch_stats" in loaded:
            batch_stats, _ = merge_params(batch_stats, loaded["batch_stats"])
        print_(f"loaded eval ckpt ({len(skipped)} unmatched leaves)")

    if cfg.tp > 1:
        from ..parallel import make_mesh, shard_params_tp

        mesh = make_mesh(n_model=cfg.tp)
        params = shard_params_tp(params, mesh)
        batch_stats = replicate_state(batch_stats, mesh)
        eval_step = make_eval_step(model, phase="inference")  # global GSPMD jit
    else:
        mesh = fitting_mesh(cfg.batch_size)
        params = replicate_state(params, mesh)
        batch_stats = replicate_state(batch_stats, mesh)
        eval_step = make_eval_step(model, phase="inference", mesh=mesh)

    writer = EvalH5Writer(h5_path)
    print_("evaluation starts")

    def flush(host_batch, imgs_path, predict_dev):
        """device_get + reproject + gather + H5 append for one batch."""
        predict = jax.device_get(predict_dev)
        joint_cam_pred = predict["joint_cam"]            # [B,T',21,3]
        focal = host_batch["focal"][:, -joint_cam_pred.shape[1]:]
        princpt = host_batch["princpt"][:, -joint_cam_pred.shape[1]:]
        reproj_pred = reproject_pinhole(joint_cam_pred, focal, princpt)

        joint_cam_gt = host_batch["joint_cam"][:, -1]
        joint_reproj_gt = host_batch["joint_img"][:, -1]

        writer.append(
            gather_strings_to_host0(imgs_path),
            gather_to_host0(joint_cam_gt),
            gather_to_host0(joint_cam_pred[:, -1]),
            gather_to_host0(joint_reproj_gt),
            gather_to_host0(reproj_pred[:, -1]),
        )

    # software-pipelined loop: dispatch is async, so batch N's host work
    # (device_get + reprojection + H5 append) overlaps batch N+1's device
    # compute instead of idling the chip between steps
    pending = None
    for host_batch in loader:
        imgs_path = [p[-1] for p in host_batch.pop("imgs_path")]
        host_batch.pop("flip", None)
        batch = shard_batch(host_batch, mesh)
        predict_dev = eval_step(params, batch_stats, batch)
        if pending is not None:
            flush(*pending)
        pending = (host_batch, imgs_path, predict_dev)
    if pending is not None:
        flush(*pending)
    writer.close()
    print_(f"eval dump written to {h5_path}")
    return h5_path


def cli(argv=None):
    """Console entry point (`csvit-evaluate`), same surface as `python -m`."""
    maybe_init_distributed()
    p = argparse.ArgumentParser(prog="cs_vit_tpu eval")
    p.add_argument("--exp", type=str, required=True)
    p.add_argument("--data", type=str, required=True,
                   choices=["interhand26m", "ho3d", "dexycb"])
    p.add_argument("--seq_len", type=int, default=1)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--eval_ckpt", type=str, required=True)
    args = p.parse_args(argv)

    cfg_path = os.path.join("./checkpoints", args.exp, "config.json")
    assert os.path.exists(cfg_path), f"missing {cfg_path}"
    cfg = FinetuneConfig.from_json_file(cfg_path)
    cfg.update(vars(args))
    np.random.seed(42)
    main(cfg)


if __name__ == "__main__":
    cli()
