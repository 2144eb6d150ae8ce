"""Training entry point (parity: `scripts/finetune.py`).

python -m cs_vit_tpu.cli.finetune --exp myexp --phase spatial \
    --temporal_supervision full --backbone swinv2-tiny-256 --data dexycb ...

TPU-native loop: sharded batches over a 1-D data mesh, one jitted train step
per phase with in-graph NaN skip + grad clip, orbax checkpoint per epoch with
a ``checkpoint`` symlink, auto-resume, and warmup-cosine LR.
"""

from __future__ import annotations

import argparse
import datetime
import os
import time

import jax
import numpy as np

from ..config import FinetuneConfig
from ..parallel import fitting_mesh, replicate_state
from ..parallel.prefetch import device_prefetch
from ..train import (
    TrainState,
    build_optimizer,
    constant_schedule,
    latest_checkpoint,
    make_train_step,
    merge_params,
    restore_checkpoint,
    save_checkpoint,
    scaled_lr,
    warmup_cosine_schedule,
)
from ..utils.logging import TBLogger, nop, print_grouped_losses, wrap_prefix_print
from ..utils.profiling import StepTimer
from .common import (
    build_datasets,
    build_loader,
    build_model,
    init_variables,
    load_or_create_config,
    maybe_init_distributed,
)


def main(cfg: FinetuneConfig, ckpt_root: str = "./checkpoints", log_every: int = 20):
    is_main = jax.process_index() == 0
    print_ = wrap_prefix_print(f"[{jax.process_index()}] ") if is_main else nop
    exp_dir = os.path.join(ckpt_root, cfg.exp)

    # 1. data
    dataset = build_datasets(cfg, "train")
    loader = build_loader(cfg, dataset, shuffle=True)
    steps_per_epoch = len(loader)

    # 2. model
    model = build_model(cfg)
    seq_len = 1 if cfg.phase == "spatial" else (cfg.seq_len or 7)
    variables = init_variables(model, cfg, seq_len)
    params, batch_stats = variables["params"], variables.get("batch_stats", {})

    # pretrained HF backbone weights when --backbone is a checkpoint dir
    if cfg.backbone and os.path.isdir(cfg.backbone):
        from .common import load_backbone_params, poser_config_from

        loaded_bb = load_backbone_params(cfg.backbone, poser_config_from(cfg).swin_config())
        if loaded_bb is not None:
            import jax.numpy as jnp

            params = dict(params)
            params["backbone"] = jax.tree.map(jnp.asarray, loaded_bb)
            print_(f"loaded pretrained backbone from {cfg.backbone}")

    # temporal phase: start from the spatial checkpoint, strict=False
    if cfg.phase == "temporal" and cfg.spatial_ckpt:
        loaded = restore_checkpoint(cfg.spatial_ckpt)
        params, skipped = merge_params(params, loaded.get("params", loaded))
        print_(f"loaded spatial ckpt ({len(skipped)} unmatched leaves kept fresh)")

    # 3. optimizer + schedule
    world = jax.process_count()
    max_lr = scaled_lr(cfg.lr, world, cfg.batch_size)
    min_lr = scaled_lr(cfg.lr_min, world, cfg.batch_size)
    if cfg.lr_scheduler == "warmup":
        schedule = warmup_cosine_schedule(
            max_lr, min_lr, cfg.warmup_epoch, cfg.cooldown_epoch, steps_per_epoch
        )
    else:
        schedule = constant_schedule(max_lr)
    tx = build_optimizer(params, cfg.phase, schedule)
    state = TrainState.create({"params": params, "batch_stats": batch_stats}, tx)

    # 4. resume
    start_epoch = 1
    latest = latest_checkpoint(exp_dir)
    if latest:
        print_(f"found checkpoints, resuming from {latest}")
        target = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": state.step,
            "epoch": 0,
        }
        # Restore raw + lenient merge rather than against the abstract target:
        # the opt_state pytree structure can differ from the one the checkpoint
        # was saved with (e.g. the stateful-clip grad_norm leaf), and a strict
        # orbax restore would reject the whole checkpoint over it.
        from ..train import merge_restored_tree

        restored, fresh = merge_restored_tree(target, restore_checkpoint(latest))
        if fresh:
            print_(f"resume: {len(fresh)} opt/state leaves kept fresh (structure migration)")
        state = state.replace(
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
            step=restored["step"],
        )
        start_epoch = int(restored["epoch"]) + 1

    # 5. mesh + jitted step
    import jax.numpy as jnp

    compute_dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else None
    if cfg.tp > 1:
        # tensor parallel: Megatron-style param sharding over the model axis;
        # the plain global-jit step compiles to a TP program under GSPMD
        from ..parallel import make_mesh, shard_state_tp

        mesh = make_mesh(n_model=cfg.tp)
        assert cfg.batch_size % mesh.shape["data"] == 0, (
            f"batch {cfg.batch_size} not divisible by data axis "
            f"{mesh.shape['data']}"
        )
        state = shard_state_tp(state, tx, mesh)
        train_step = make_train_step(
            model, tx, cfg.phase, compute_dtype=compute_dtype
        )
    else:
        mesh = fitting_mesh(cfg.batch_size)
        state = replicate_state(state, mesh)
        train_step = make_train_step(
            model, tx, cfg.phase, compute_dtype=compute_dtype, mesh=mesh
        )
    tb = TBLogger(os.path.join(exp_dir, "tb_logs") if is_main else None, is_main)

    rng = jax.random.key(42 + jax.process_index())

    for epoch in range(start_epoch, cfg.epoch + 1):
        t0 = datetime.datetime.now()
        print_(f"training for epoch {epoch}/{cfg.epoch}, start {t0:%Y-%m-%d_%H:%M:%S}")
        loader.set_epoch(epoch)
        t_log = time.monotonic()
        meter = StepTimer(warmup=2)
        for it, batch in enumerate(
            device_prefetch(loader, mesh, patches_dtype=compute_dtype)
        ):
            rng, step_rng = jax.random.split(rng)
            state, metrics = train_step(state, batch, step_rng)
            meter.update(cfg.batch_size)

            if (it + 1) % log_every == 0:
                loss = float(metrics["loss"])
                if metrics["skipped"]:
                    print_("loss is nan, skipped batch")
                global_step = epoch * steps_per_epoch + it + 1
                lr_now = float(schedule(int(state.step)))
                tb.scalars(jax.device_get(metrics["scalar_logs"]), global_step)
                tb.scalar("train/lr", lr_now, global_step)
                tb.scalar("train/grad", float(metrics["grad_norm"]), global_step)
                if tb.writer is not None:
                    # reprojection image grid (ref `finetune.py:245-255`)
                    from ..utils.vis import training_reprojection_image

                    k = min(4, cfg.batch_size)
                    host = jax.device_get(
                        {
                            "patches": batch["patches"][:k],
                            "square_bboxes": batch["square_bboxes"][:k],
                            "focal": batch["focal"][:k],
                            "princpt": batch["princpt"][:k],
                            "pred": metrics["joint_cam_pred"][:k],
                            "gt2d": batch["joint_img"][:k]
                            if "joint_img" in batch else None,
                        }
                    )
                    grid = training_reprojection_image(
                        np.asarray(host["patches"], np.float32),
                        host["square_bboxes"],
                        host["focal"],
                        host["princpt"],
                        host["pred"],
                        host["gt2d"],
                    )
                    tb.image("train/reprojection", grid, global_step)
                iter_time = (time.monotonic() - t_log) / log_every
                print_grouped_losses(
                    epoch, it, steps_per_epoch, iter_time, lr_now,
                    jax.device_get(metrics["scalar_logs"]), print_,
                )
                t_log = time.monotonic()

        t1 = datetime.datetime.now()
        print_(
            f"epoch {epoch} ends at {t1:%Y-%m-%d_%H:%M:%S}, cost {t1 - t0}"
            f" ({meter.samples_per_sec:.1f} samples/s)"
        )

        if is_main:
            print_(f"writing checkpoint for epoch {epoch}")
            save_checkpoint(
                exp_dir,
                epoch,
                {
                    "params": jax.device_get(state.params),
                    "batch_stats": jax.device_get(state.batch_stats),
                    "opt_state": jax.device_get(state.opt_state),
                    "step": jax.device_get(state.step),
                    "epoch": epoch,
                },
            )
    tb.close()
    return state


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="cs_vit_tpu finetune")
    p.add_argument("--exp", type=str, required=True)
    p.add_argument("--epoch", type=int, default=30)
    p.add_argument("--phase", type=str, required=True,
                   choices=["spatial", "temporal", "inference"])
    p.add_argument("--spatial_ckpt", type=str, default=None)
    p.add_argument("--temporal_supervision", type=str, required=True,
                   choices=["full", "realtime"])
    p.add_argument("--backbone", type=str, required=True)
    p.add_argument("--global_positioning", type=str, default="direct",
                   choices=["direct", "orientation"])
    p.add_argument("--num_latent_layer", type=int, default=None)
    p.add_argument("--spatial_layer_type", type=str, default="decoder",
                   choices=["decoder", "encoder"])
    p.add_argument("--temporal_init_method", type=str, default="zero",
                   choices=["zero", "random"])
    p.add_argument("--persp_embed_method", type=str, default="dense",
                   choices=["dense", "sparse"])
    p.add_argument("--persp_decorate", type=str, default="query",
                   choices=["query", "patch"])
    p.add_argument("--data", type=str, required=True, nargs="+",
                   choices=["interhand26m", "ho3d", "dexycb"])
    p.add_argument("--seq_len", type=int, default=7)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--lr_min", type=float, default=1e-6)
    p.add_argument("--lr_scheduler", type=str, default="warmup",
                   choices=["warmup", "constant"])
    p.add_argument("--img_size", type=int, default=256)
    p.add_argument("--ih26mseq_root", type=str, default=None)
    p.add_argument("--ho3d_root", type=str, default=None)
    p.add_argument("--dexycb_root", type=str, default=None)
    p.add_argument("--mano_model_dir", type=str, default=None)
    p.add_argument("--dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--remat", action="store_true", default=False)
    p.add_argument("--num_workers", type=int, default=None,
                   help="host loader threads (default: config, 8)")
    p.add_argument("--tp", type=int, default=None,
                   help="tensor-parallel size (model mesh axis; forces xla attention)")
    return p


def cli(argv=None):
    """Console entry point (`csvit-finetune`), same surface as `python -m`."""
    maybe_init_distributed()
    args = build_argparser().parse_args(argv)
    np.random.seed(42)
    arg_dict = {k: v for k, v in vars(args).items() if v is not None}
    cfg = load_or_create_config(args.exp, arg_dict)
    main(cfg)


if __name__ == "__main__":
    cli()
