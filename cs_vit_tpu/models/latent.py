"""Latent transformation groups (scale/rotation acting on patch tokens).

Parity targets: `cs_vit/net/latent_transformers.py`. The variant actually used
by the Poser is :class:`ScaleRotComplexEmbedTransformationGroup`
(`ti_poser.py:256-265`): 2D-RoPE the patch grid, then modulate
``scale_emb * patches + angle_emb`` and run N encoder blocks.

Reference quirk replicated (flagged): the scale and angle embedders are
SWAPPED at `latent_transformers.py:331-332` — the angle goes through
``scale_embedder``'s MLP chain and vice versa. Checkpoints bake this in, so
``compat_swap=True`` is the default.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from .modules import (
    ContinuousAngleEmbedding,
    EncoderBlock,
    RoPE2DPositionalEncoding,
)


class MLP3(nn.Module):
    """Linear-ReLU-Linear-ReLU-Linear, dim-preserving."""

    dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.relu(nn.Dense(self.dim, name="fc1")(x))
        x = nn.relu(nn.Dense(self.dim, name="fc2")(x))
        return nn.Dense(self.dim, name="fc3")(x)


class ImageLatentTransformerGroup(nn.Module):
    """Legacy latent group {horizontal-flip, center-rotation, flip+rotation}.

    Reference `latent_transformers.py:11-163`: each op is a stack of encoder
    blocks; rotation ops prepend an angle-embedding token and strip it after.
    The algebraic composition law lives in :func:`compose_hf_cr_hr`.
    """

    num_layers: int = 1
    embed_dim: int = 768
    num_heads: int = 12
    compat_scale: bool = True

    def setup(self):
        self.angle_embedder = ContinuousAngleEmbedding(
            output_dim=self.embed_dim, num_freq=32, name="angle_embedder"
        )
        for op in ("hf", "cr", "hr"):
            setattr(
                self,
                f"{op}_layers",
                [
                    EncoderBlock(
                        self.embed_dim, self.num_heads, self.compat_scale,
                        name=f"{op}{i}",
                    )
                    for i in range(self.num_layers)
                ],
            )

    def _run(self, layers, x, *, train: bool):
        for layer in layers:
            x = layer(x, train=train)
        return x

    def do_hf(self, patches: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        return self._run(self.hf_layers, patches, train=train)

    def do_cr(
        self, patches: jnp.ndarray, angle_rad: Optional[jnp.ndarray] = None,
        *, train: bool = False,
    ) -> jnp.ndarray:
        if angle_rad is None:
            angle_rad = jnp.zeros((patches.shape[0],), patches.dtype)
        emb = self.angle_embedder(angle_rad)
        x = jnp.concatenate([emb[:, None], patches], axis=1)
        return self._run(self.cr_layers, x, train=train)[:, 1:]

    def do_hr(
        self, patches: jnp.ndarray, angle_rad: Optional[jnp.ndarray] = None,
        *, train: bool = False,
    ) -> jnp.ndarray:
        if angle_rad is None:
            angle_rad = jnp.zeros((patches.shape[0],), patches.dtype)
        emb = self.angle_embedder(angle_rad)
        x = jnp.concatenate([emb[:, None], patches], axis=1)
        return self._run(self.hr_layers, x, train=train)[:, 1:]

    def __call__(self, patches, angle_rad=None, op: str = "init", *, train: bool = False):
        if op == "init":  # trace every op so init() creates the full tree
            out = self.do_cr(patches, angle_rad, train=train)
            self.do_hf(patches, train=train)
            self.do_hr(patches, angle_rad, train=train)
            return out
        return {"hf": self.do_hf, "cr": self.do_cr, "hr": self.do_hr}[op](
            patches, **({} if op == "hf" else {"angle_rad": angle_rad}), train=train
        )


# Composition law for the legacy group (ref `latent_transformers.py:43-53`):
# (first_op, second_op) -> (result_op, factor1, factor2) applied to angles.
_HF_CR_HR_LAW = {
    ("hf", "hf"): ("cr", 0, 0),
    ("hf", "cr"): ("hr", 0, 1),
    ("hf", "hr"): ("cr", 0, 1),
    ("cr", "hf"): ("hr", -1, 0),
    ("cr", "cr"): ("cr", 1, 1),
    ("cr", "hr"): ("hr", -1, 1),
    ("hr", "hf"): ("cr", -1, 0),
    ("hr", "cr"): ("hr", 1, 1),
    ("hr", "hr"): ("cr", -1, 1),
}


def compose_hf_cr_hr(op1: str, angle1, op2: str, angle2):
    """Compose two legacy latent ops -> (op, angle)."""
    result_op, f1, f2 = _HF_CR_HR_LAW[(op1, op2)]
    if angle1 is None and angle2 is None:
        return result_op, None
    a1 = 0.0 if angle1 is None else f1 * angle1
    a2 = 0.0 if angle2 is None else f2 * angle2
    return result_op, a1 + a2


class ScaleRotTransformationGroup(nn.Module):
    """Token-prepend variant: [scale_emb, angle_emb, patches] -> blocks -> strip.

    Reference `latent_transformers.py:166-245`. Group law:
    compose((s1, r1), (s2, r2)) = (s1*s2, r1+r2).
    """

    num_layers: int = 1
    embed_dim: int = 768
    num_heads: int = 12
    compat_scale: bool = True

    @nn.compact
    def __call__(
        self,
        patches: jnp.ndarray,       # [N, L, D]
        scale_ratio: jnp.ndarray,   # [N]
        angle_rad: jnp.ndarray,     # [N]
        *,
        train: bool = False,
    ) -> jnp.ndarray:
        angle_emb = ContinuousAngleEmbedding(
            output_dim=self.embed_dim, num_freq=32, name="angle_embedder"
        )(angle_rad)
        scale_emb = ContinuousAngleEmbedding(
            output_dim=self.embed_dim, num_freq=32, name="scale_embedder"
        )(scale_ratio)
        x = jnp.concatenate(
            [scale_emb[:, None], angle_emb[:, None], patches], axis=1
        )
        for i in range(self.num_layers):
            x = EncoderBlock(
                self.embed_dim, self.num_heads, self.compat_scale, name=f"sr{i}"
            )(x, train=train)
        return x[:, 2:]


class ScaleRotComplexEmbedTransformationGroup(nn.Module):
    """RoPE2D + multiplicative/additive scale-angle modulation + encoder stack.

    Reference `latent_transformers.py:248-365` (``do_sr``).
    """

    num_layers: int = 1
    embed_dim: int = 768
    num_heads: int = 12
    num_p: int = 16
    num_q: int = 16
    compat_scale: bool = True
    compat_swap: bool = True  # replicate the swapped embedder quirk

    @nn.compact
    def __call__(
        self,
        patches: jnp.ndarray,       # [N, L, D], L = num_p * num_q
        scale_ratio: jnp.ndarray,   # [N]
        angle_rad: jnp.ndarray,     # [N]
        *,
        train: bool = False,
        truncate: Optional[int] = None,
    ) -> jnp.ndarray:
        x = RoPE2DPositionalEncoding(
            self.embed_dim, self.num_p, self.num_q, 32, name="rope2d"
        )(patches)

        angle_raw = ContinuousAngleEmbedding(
            output_dim=self.embed_dim, num_freq=32, name="angle_embedder"
        )(angle_rad)
        scale_raw = ContinuousAngleEmbedding(
            output_dim=self.embed_dim, num_freq=32, name="scale_embedder"
        )(scale_ratio)

        scale_mlp = MLP3(self.embed_dim, name="scale_linear")
        angle_mlp = MLP3(self.embed_dim, name="angle_linear")
        if self.compat_swap:
            # reference: angle_embeds = scale_linear(angle_embedder(angle)),
            #            scale_embeds = angle_linear(scale_embedder(scale))
            angle_emb = scale_mlp(angle_raw)
            scale_emb = angle_mlp(scale_raw)
        else:
            angle_emb = angle_mlp(angle_raw)
            scale_emb = scale_mlp(scale_raw)

        x = scale_emb[:, None] * x + angle_emb[:, None]

        n = self.num_layers if truncate is None else max(1, min(truncate, self.num_layers))
        for i in range(self.num_layers):
            if i < n:
                x = EncoderBlock(
                    self.embed_dim, self.num_heads, self.compat_scale, name=f"sr{i}"
                )(x, train=train)
        return x


def compose_sr(s1, r1, s2, r2):
    """Group law for scale-rotation latent ops: scales multiply, angles add."""
    return s1 * s2, r1 + r2
