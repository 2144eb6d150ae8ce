"""Transformation-isomorphic (TI) self-supervised pretraining, TPU-native.

Parity targets: `cs_vit/net/ti_vit.py` —
* :class:`TIViT` (ref ``TI_ViT`` :49-278): ViT-MAE encoder, optional MAE
  reconstruction decoder, latent isomorphism loss between backbone(transformed
  image) and trans_grp(backbone(image)), plus the margin :func:`support_loss`.
* :class:`TIDinoViT` (ref ``TI_DinoViT`` :281-338): DINOv2 patch encoder.
* :class:`TIDino` helpers (ref ``TI_Dino`` :341-583): student/teacher DINO
  with TI cross-view terms. TPU-native state handling: the teacher params and
  the DINO center are explicit pytrees threaded through pure step functions
  — the center's cross-host mean and teacher broadcast fall out of jit over
  the data mesh instead of NCCL all_reduce/broadcast (ref :491-501, 577-583).

Stage freezing (ref ``prepare_grad_for_stage``/``init_apla`` :381-402) maps to
optimizer masks: :func:`dino_stage_mask` trains only the student block MLPs
(APLA), :func:`ti_stage_mask` trains only the transformation group.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..constants import IMAGENET_MEAN, IMAGENET_STD
from ..ops.resample import scale_rotate_img
from .dinov2 import Dinov2Backbone, Dinov2Config
from .latent import ScaleRotComplexEmbedTransformationGroup, ScaleRotTransformationGroup
from .vit import ViTConfig, ViTEncoder, ViTMAEDecoderConfig, ViTMAEDecoderNoMask


def support_loss(tokens_delta: jnp.ndarray, support: float, alpha: float = 1e-3) -> jnp.ndarray:
    """Margin loss keeping mean token displacement near `support` (ref :26-42)."""
    mean_norm = jnp.mean(jnp.linalg.norm(tokens_delta, axis=-1))
    delta = support - mean_norm
    quad = alpha * delta**2
    log_term = -delta * jnp.log(jnp.maximum(mean_norm / support, 1e-12))
    return jnp.where(delta > -1e-6, quad, log_term)


def _normalize_imagenet(images: jnp.ndarray) -> jnp.ndarray:
    mean = jnp.asarray(IMAGENET_MEAN, images.dtype)
    std = jnp.asarray(IMAGENET_STD, images.dtype)
    return (images - mean) / std


class TIViT(nn.Module):
    """TI pretraining on a ViT-MAE encoder (ref ``TI_ViT``)."""

    vit_config: ViTConfig
    decoder_config: Optional[ViTMAEDecoderConfig] = None
    ti_loss: bool = True
    lora_rank: Optional[int] = None
    compat_scale: bool = True

    def setup(self):
        cfg = self.vit_config
        self.backbone = ViTEncoder(cfg, lora_rank=self.lora_rank, name="backbone")
        self.num_p = cfg.image_size // cfg.patch_size
        self.num_patches = self.num_p**2
        if self.decoder_config is not None:
            self.decoder = ViTMAEDecoderNoMask(
                self.decoder_config, self.num_patches, name="decoder"
            )
        else:
            self.decoder = None
        self.trans_grp = ScaleRotTransformationGroup(
            embed_dim=cfg.hidden_size,
            num_heads=cfg.num_attention_heads,
            compat_scale=self.compat_scale,
            name="trans_grp",
        )
        self.support_distant = math.sqrt(cfg.hidden_size)

    def encode(self, images: jnp.ndarray) -> jnp.ndarray:
        """images [B,H,W,3] in [0,1] -> CLS-stripped patches [B,L,D] (ref :267-278)."""
        tokens = self.backbone(_normalize_imagenet(images))
        return tokens[:, 1:]

    def __call__(
        self, images: jnp.ndarray, *, train: bool = False
    ) -> Dict[str, Any]:
        cfg = self.vit_config
        B = images.shape[0]
        images_norm = _normalize_imagenet(images)
        tokens = self.backbone(images_norm, deterministic=not train)
        patches_origin = tokens[:, 1:]

        # --- reconstruction loss (ref :186-197) ---
        loss_recons = jnp.zeros(())
        recons = None
        if self.decoder is not None:
            recons = self.decoder(tokens, deterministic=not train)  # [B,L,p*p*3]
            p = cfg.patch_size
            target = images_norm.reshape(
                B, self.num_p, p, self.num_p, p, 3
            ).transpose(0, 1, 3, 2, 4, 5).reshape(B, self.num_patches, -1)
            loss_recons = jnp.mean(jnp.abs(recons - target))

        # --- latent isomorphism loss (ref :199-225) ---
        if self.ti_loss:
            rng = self.make_rng("latent")
            k1, k2 = jax.random.split(rng)
            scale_coef = jnp.clip(jax.random.normal(k1, (B,)), -0.5, 0.5) + 1.0
            angle_rad = jax.random.uniform(k2, (B,)) * 2 * jnp.pi
            images_trans = scale_rotate_img(
                images_norm, scale_coef, angle_rad / jnp.pi * 180.0
            )
            patches_of_trans = self.backbone(
                images_trans, deterministic=not train
            )[:, 1:]
            trans_patches = self.trans_grp(
                patches_origin, scale_coef, angle_rad, train=train
            )
            loss_latent = jnp.mean(
                jnp.linalg.norm(trans_patches - patches_of_trans, ord=1, axis=-1)
            )
            loss_support = support_loss(
                patches_origin - patches_of_trans, self.support_distant
            )
            loss = loss_latent + 1e-3 * loss_support + loss_recons
        else:
            loss_latent = loss_support = jnp.zeros(())
            loss = loss_recons

        return {
            "loss": loss,
            "logs": {
                "scalar": {
                    "total": loss,
                    "latent": loss_latent,
                    "support": loss_support,
                    "recons": loss_recons,
                },
            },
            "recons": recons,
        }


class TIDinoViT(nn.Module):
    """DINOv2 patch encoder with ImageNet normalization (ref ``TI_DinoViT``)."""

    config: Dinov2Config
    normalize: bool = True

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        x = _normalize_imagenet(images) if self.normalize else images
        return Dinov2Backbone(self.config, name="backbone")(x)


class TIDinoTransGroup(nn.Module):
    """The latent group used by TI-DINO (complex-embed variant, 6 layers)."""

    embed_dim: int
    num_heads: int
    num_p: int
    compat_scale: bool = True

    @nn.compact
    def __call__(self, patches, scale_ratio, angle_rad, *, train: bool = False):
        return ScaleRotComplexEmbedTransformationGroup(
            num_layers=6,
            embed_dim=self.embed_dim,
            num_heads=self.num_heads,
            num_p=self.num_p,
            num_q=self.num_p,
            compat_scale=self.compat_scale,
            name="trans_grp",
        )(patches, scale_ratio, angle_rad, train=train)


def dino_forward(
    student: TIDinoViT,
    trans: TIDinoTransGroup,
    student_vars: Dict,
    teacher_params: Dict,
    trans_vars: Dict,
    center: jnp.ndarray,           # [L, D]
    images: jnp.ndarray,           # [B,H,W,3]
    rng: jnp.ndarray,
    student_temp: float = 0.1,
    teacher_temp: float = 0.04,
    center_momentum: float = 0.9,
) -> Tuple[jnp.ndarray, Dict, jnp.ndarray]:
    """DINO + TI-DINO losses and center EMA (ref ``dino_forward`` :410-512).

    Returns (loss, scalar_logs, new_center). Under jit with the batch sharded
    over the data mesh, ``teacher_output.mean(0)`` is already the global mean
    (the reference needed an explicit NCCL all_reduce).
    """
    B = images.shape[0]
    k1, k2 = jax.random.split(rng)
    scale_coef = jnp.clip(jax.random.normal(k1, (B,)), -0.3, 0.3) + 1.0
    angle_rad = jax.random.uniform(k2, (B,)) * 2 * jnp.pi
    images_trans = scale_rotate_img(images, scale_coef, angle_rad / jnp.pi * 180.0)
    images_input = jnp.concatenate([images, images_trans], axis=0)

    student_out = student.apply(student_vars, images_input)
    # Reference computes the transformed student views under torch.no_grad
    # (ref :444-452), so the TI term carries NO gradient to the student in the
    # dino stage — it only trains via loss_dino. Replicated via stop_gradient.
    s_out_1 = jax.lax.stop_gradient(
        trans.apply(trans_vars, student_out[:B], scale_coef, angle_rad)
    )
    s_out_2 = jax.lax.stop_gradient(
        trans.apply(trans_vars, student_out[B:], 1.0 / scale_coef, -angle_rad)
    )

    teacher_out = jax.lax.stop_gradient(
        student.apply({"params": teacher_params}, images_input)
    )
    t1, t2 = teacher_out[:B], teacher_out[B:]

    def ce(teacher_logits, student_logits):
        t = jax.nn.softmax((teacher_logits - center[None]) / teacher_temp, axis=-1)
        ls = jax.nn.log_softmax(student_logits / student_temp, axis=-1)
        return jnp.mean(jnp.sum(-t * ls, axis=-1))

    loss_dino = ce(teacher_out[:B], student_out[:B])
    loss_ti = ce(t1, s_out_2) + ce(t2, s_out_1)
    loss = loss_dino + 0.5 * loss_ti

    global_mean = jnp.mean(teacher_out, axis=0)
    new_center = center * center_momentum + global_mean * (1 - center_momentum)

    logs = {"total": loss, "dino": loss_dino, "ti": loss_ti}
    return loss, logs, new_center


def ti_forward(
    student: TIDinoViT,
    trans: TIDinoTransGroup,
    teacher_params: Dict,
    trans_vars: Dict,
    images: jnp.ndarray,
    rng: jnp.ndarray,
    teacher_temp: float = 0.04,
) -> Tuple[jnp.ndarray, Dict]:
    """TI stage: train only the latent group (ref ``ti_foward`` :514-570)."""
    B = images.shape[0]
    k1, k2 = jax.random.split(rng)
    scale_coef = jnp.clip(jax.random.normal(k1, (B,)), -0.3, 0.3) + 1.0
    angle_rad = jax.random.uniform(k2, (B,)) * 2 * jnp.pi
    images_trans = scale_rotate_img(images, scale_coef, angle_rad / jnp.pi * 180.0)
    images_input = jnp.concatenate([images, images_trans], axis=0)

    teacher_out = jax.lax.stop_gradient(
        student.apply({"params": teacher_params}, images_input)
    )
    t1, t2 = teacher_out[:B], teacher_out[B:]
    t1_to_2, _ = trans.apply(
        trans_vars, t1, scale_coef, angle_rad, train=True, mutable=["batch_stats"]
    )
    t2_to_1, _ = trans.apply(
        trans_vars, t2, 1.0 / scale_coef, -angle_rad, train=True,
        mutable=["batch_stats"],
    )

    def ce(t, s):
        return jnp.mean(
            jnp.sum(
                -jax.nn.softmax(t / teacher_temp, axis=-1)
                * jax.nn.log_softmax(s / teacher_temp, axis=-1),
                axis=-1,
            )
        )

    loss_ti = ce(t1, t2_to_1) + ce(t2, t1_to_2)
    return loss_ti, {"total": loss_ti, "ti": loss_ti}


def update_teacher(teacher_params: Dict, student_params: Dict, momentum: float) -> Dict:
    """EMA teacher update (ref :572-575)."""
    return jax.tree.map(
        lambda t, s: t * momentum + (1 - momentum) * s, teacher_params, student_params
    )


def dino_stage_mask(student_params: Dict) -> Dict:
    """APLA: only the MLP (fc1/fc2 or swiglu) leaves of each block train
    (ref ``init_apla`` :381-386)."""

    def walk(tree, path=()):
        if isinstance(tree, dict):
            return {k: walk(v, path + (k,)) for k, v in tree.items()}
        trainable = any(
            p in ("fc1", "fc2", "weights_in", "weights_out") for p in path
        )
        return trainable

    return walk(student_params)


def ti_stage_mask(trans_params: Dict) -> Dict:
    """Everything in the transformation group trains during the TI stage."""
    return jax.tree.map(lambda _: True, trans_params)
