"""TI self-supervised pretraining entry point.

The reference ships the TI models library-only (SURVEY.md §2.1: no committed
pretraining script); this CLI completes the workflow:

  python -m cs_vit_tpu.cli.pretrain_ti --exp ti0 --mode tivit \
      --data_root /data/coco2017 --dataset coco --epochs 10 --batch_size 64

Modes:
  tivit  — TI_ViT latent-isomorphism (+ optional MAE reconstruction) training
  dino   — TI-DINO stage 'dino' (student MLPs via APLA mask, EMA teacher)
  ti     — TI-DINO stage 'ti' (trains only the latent transformation group)
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.base import DataLoader
from ..data.pretrain import COCO2017, Ego4DHandImage, HIntHandImage
from ..models.dinov2 import Dinov2Config
from ..models.ti import (
    TIDinoTransGroup,
    TIDinoViT,
    TIViT,
    dino_forward,
    dino_stage_mask,
    ti_forward,
    ti_stage_mask,
    update_teacher,
)
from ..models.vit import ViTConfig
from ..parallel import fitting_mesh, replicate_state, shard_batch
from ..train.checkpoint import save_checkpoint
from ..utils.logging import wrap_prefix_print


def _stack_images(items):
    """Collates bare [S,S,3] images into a [B,S,S,3] stack."""
    return np.stack(items)


def build_dataset(name: str, root: str, img_size: int):
    if name == "coco":
        return COCO2017(root, img_size=img_size)
    if name == "ego4d":
        return Ego4DHandImage(root, img_size=img_size)
    if name == "hint":
        return HIntHandImage(root, img_size=img_size, parts=["ego4d", "epick", "newdays"])
    raise ValueError(name)


def main(args):
    print_ = wrap_prefix_print(f"[{jax.process_index()}] ")
    dataset = build_dataset(args.dataset, args.data_root, args.img_size)
    loader = DataLoader(
        dataset, batch_size=args.batch_size, shuffle=True, drop_last=True,
        collate_fn=_stack_images,
        num_shards=jax.process_count(), shard_index=jax.process_index(),
    )
    mesh = fitting_mesh(args.batch_size)
    exp_dir = os.path.join("./checkpoints", args.exp)

    if args.mode == "tivit":
        vit_cfg = ViTConfig(image_size=args.img_size, patch_size=args.patch_size,
                            hidden_size=args.hidden_size,
                            num_hidden_layers=args.num_layers,
                            num_attention_heads=args.num_heads,
                            intermediate_size=4 * args.hidden_size)
        model = TIViT(vit_cfg, decoder_config=None, ti_loss=True,
                      lora_rank=args.lora_rank or None)
        imgs0 = jnp.zeros((1, args.img_size, args.img_size, 3))
        variables = model.init(
            {"params": jax.random.key(0), "latent": jax.random.key(1)}, imgs0
        )
        params = variables["params"]
        stats = variables.get("batch_stats", {})
        tx = optax.adamw(args.lr)
        opt_state = tx.init(params)
        params, stats, opt_state = (
            replicate_state(x, mesh) for x in (params, stats, opt_state)
        )

        @jax.jit
        def step(params, stats, opt_state, images, rng):
            def loss_fn(p):
                out, mut = model.apply(
                    {"params": p, "batch_stats": stats}, images, train=True,
                    rngs={"latent": rng}, mutable=["batch_stats"],
                )
                return out["loss"], (out["logs"]["scalar"], mut["batch_stats"])

            (loss, (logs, new_stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params)
            updates, new_opt = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), new_stats, new_opt, loss, logs

        rng = jax.random.key(7)
        for epoch in range(1, args.epochs + 1):
            loader.set_epoch(epoch)
            for it, images in enumerate(loader):
                rng, k = jax.random.split(rng)
                batch = shard_batch({"x": images.astype(np.float32)}, mesh)["x"]
                params, stats, opt_state, loss, logs = step(
                    params, stats, opt_state, batch, k
                )
                if (it + 1) % args.log_every == 0:
                    print_(f"E{epoch} it{it + 1} loss={float(loss):.4f} "
                           f"latent={float(logs['latent']):.4f}")
            if jax.process_index() == 0:
                save_checkpoint(exp_dir, epoch, {
                    "params": jax.device_get(params),
                    "batch_stats": jax.device_get(stats),
                    "epoch": epoch,
                })
        return

    # --- TI-DINO modes ---
    dcfg = Dinov2Config(
        image_size=args.img_size, patch_size=args.patch_size,
        hidden_size=args.hidden_size, num_hidden_layers=args.num_layers,
        num_attention_heads=args.num_heads,
    )
    student = TIDinoViT(dcfg)
    imgs0 = jnp.zeros((1, args.img_size, args.img_size, 3))
    svars = student.init(jax.random.key(0), imgs0)
    teacher_params = jax.tree.map(lambda x: x, svars["params"])
    num_p = args.img_size // args.patch_size
    trans = TIDinoTransGroup(
        embed_dim=args.hidden_size, num_heads=args.num_heads, num_p=num_p
    )
    patches0 = student.apply(svars, imgs0)
    tvars = trans.init(jax.random.key(1), patches0, jnp.ones(1), jnp.zeros(1))
    center = jnp.zeros((num_p * num_p, args.hidden_size))

    if args.mode == "dino":
        mask = dino_stage_mask(svars["params"])
        labels = jax.tree.map(lambda m: "t" if m else "f", mask)
        tx = optax.multi_transform(
            {"t": optax.adamw(args.lr), "f": optax.set_to_zero()}, labels
        )
        opt_state = tx.init(svars["params"])

        @jax.jit
        def step(sparams, tparams, opt_state, center, images, rng):
            def loss_fn(p):
                loss, logs, new_center = dino_forward(
                    student, trans, {"params": p}, tparams, tvars, center,
                    images, rng,
                )
                return loss, (logs, new_center)

            (loss, (logs, new_center)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(sparams)
            updates, new_opt = tx.update(grads, opt_state, sparams)
            sparams = optax.apply_updates(sparams, updates)
            tparams = update_teacher(tparams, sparams, args.teacher_momentum)
            return sparams, tparams, new_opt, new_center, loss, logs

        sparams = svars["params"]
        rng = jax.random.key(11)
        for epoch in range(1, args.epochs + 1):
            loader.set_epoch(epoch)
            for it, images in enumerate(loader):
                rng, k = jax.random.split(rng)
                sparams, teacher_params, opt_state, center, loss, logs = step(
                    sparams, teacher_params, opt_state, center,
                    jnp.asarray(images, jnp.float32), k,
                )
                if (it + 1) % args.log_every == 0:
                    print_(f"E{epoch} it{it + 1} dino={float(logs['dino']):.4f}")
            if jax.process_index() == 0:
                save_checkpoint(exp_dir, epoch, {
                    "student": jax.device_get(sparams),
                    "teacher": jax.device_get(teacher_params),
                    "trans": jax.device_get(tvars["params"]),
                    "center": jax.device_get(center),
                    "epoch": epoch,
                })
    elif args.mode == "ti":
        tx = optax.adamw(args.lr)
        tparams_trans = tvars["params"]
        opt_state = tx.init(tparams_trans)

        @jax.jit
        def step(trans_params, opt_state, images, rng):
            def loss_fn(tp):
                full = dict(tvars)
                full["params"] = tp
                loss, logs = ti_forward(
                    student, trans, teacher_params, full, images, rng
                )
                return loss, logs

            (loss, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                trans_params
            )
            updates, new_opt = tx.update(grads, opt_state, trans_params)
            return optax.apply_updates(trans_params, updates), new_opt, loss, logs

        rng = jax.random.key(13)
        for epoch in range(1, args.epochs + 1):
            loader.set_epoch(epoch)
            for it, images in enumerate(loader):
                rng, k = jax.random.split(rng)
                tparams_trans, opt_state, loss, logs = step(
                    tparams_trans, opt_state, jnp.asarray(images, jnp.float32), k
                )
                if (it + 1) % args.log_every == 0:
                    print_(f"E{epoch} it{it + 1} ti={float(loss):.4f}")
            if jax.process_index() == 0:
                save_checkpoint(exp_dir, epoch, {
                    "trans": jax.device_get(tparams_trans), "epoch": epoch,
                })


def build_argparser():
    p = argparse.ArgumentParser(prog="cs_vit_tpu TI pretraining")
    p.add_argument("--exp", required=True)
    p.add_argument("--mode", required=True, choices=["tivit", "dino", "ti"])
    p.add_argument("--dataset", default="coco", choices=["coco", "ego4d", "hint"])
    p.add_argument("--data_root", required=True)
    p.add_argument("--img_size", type=int, default=224)
    p.add_argument("--patch_size", type=int, default=16)
    p.add_argument("--hidden_size", type=int, default=768)
    p.add_argument("--num_layers", type=int, default=12)
    p.add_argument("--num_heads", type=int, default=12)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--lora_rank", type=int, default=0)
    p.add_argument("--teacher_momentum", type=float, default=0.996)
    p.add_argument("--log_every", type=int, default=20)
    return p


def cli(argv=None):
    """Console entry point (`csvit-pretrain-ti`), same surface as `python -m`."""
    main(build_argparser().parse_args(argv))


if __name__ == "__main__":
    cli()
