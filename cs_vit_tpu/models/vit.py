"""ViT encoder (MAE-style, CLS token) + ViT-MAE decoder in flax, with LoRA.

Parity targets:
* ``ViTModelFromMAE`` (reference `transformer_module.py:523-527`): HF ViTModel
  with the pooler removed — here :class:`ViTEncoder`, numerically matching
  `transformers.ViTModel` so MAE-pretrained encoders convert directly.
* ``ViTMAEDecoder_NoMask`` (reference `transformer_module.py:383-519`): the HF
  ViT-MAE decoder with masking stripped — :class:`ViTMAEDecoderNoMask`, with
  the same fixed 2D sin-cos position embeddings.
* PEFT LoRA on q/k/v (reference `ti_vit.py:51-95`): :class:`LoRADense` adds
  ``(alpha/r) * B @ A`` deltas; :func:`merge_lora_params` folds them into the
  base kernels (peft ``merge_and_unload`` semantics).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from flax.traverse_util import flatten_dict, unflatten_dict


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    image_size: int = 224
    patch_size: int = 16
    num_channels: int = 3
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    layer_norm_eps: float = 1e-12

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2


@dataclasses.dataclass(frozen=True)
class ViTMAEDecoderConfig:
    hidden_size: int = 768           # encoder dim feeding the decoder
    decoder_hidden_size: int = 512
    decoder_num_hidden_layers: int = 8
    decoder_num_attention_heads: int = 16
    decoder_intermediate_size: int = 2048
    patch_size: int = 16
    num_channels: int = 3
    layer_norm_eps: float = 1e-12


def get_2d_sincos_pos_embed(embed_dim: int, grid_size: int, add_cls_token: bool = False) -> np.ndarray:
    """Fixed 2D sin-cos position embedding (MAE convention)."""
    grid_h = np.arange(grid_size, dtype=np.float32)
    grid_w = np.arange(grid_size, dtype=np.float32)
    grid = np.meshgrid(grid_w, grid_h)  # w goes first (MAE convention)
    grid = np.stack(grid, axis=0).reshape([2, 1, grid_size, grid_size])

    def _1d(dim, pos):
        omega = np.arange(dim // 2, dtype=np.float32) / (dim / 2.0)
        omega = 1.0 / 10000**omega
        out = np.einsum("m,d->md", pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    emb_h = _1d(embed_dim // 2, grid[0])
    emb_w = _1d(embed_dim // 2, grid[1])
    pos = np.concatenate([emb_h, emb_w], axis=1)
    if add_cls_token:
        pos = np.concatenate([np.zeros([1, embed_dim]), pos], axis=0)
    return pos.astype(np.float32)


class LoRADense(nn.Module):
    """Dense with optional LoRA delta: y = x W + b + (alpha/r) * (x A^T) B^T.

    peft layout: A [r, in], B [out, r]; dropout on the LoRA input branch.
    """

    features: int
    use_bias: bool = True
    lora_rank: Optional[int] = None
    lora_alpha: float = 32.0
    lora_dropout: float = 0.1

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, deterministic: bool = True) -> jnp.ndarray:
        y = nn.Dense(self.features, use_bias=self.use_bias, name="base")(x)
        if self.lora_rank:
            in_dim = x.shape[-1]
            A = self.param(
                "lora_A",
                nn.initializers.kaiming_uniform(),
                (self.lora_rank, in_dim),
            )
            B = self.param("lora_B", nn.initializers.zeros, (self.features, self.lora_rank))
            h = x
            if self.lora_dropout > 0 and not deterministic:
                h = nn.Dropout(self.lora_dropout, deterministic=False)(h)
            y = y + (self.lora_alpha / self.lora_rank) * (h @ A.T @ B.T)
        return y


def merge_lora_params(params: dict, lora_alpha: float = 32.0) -> dict:
    """Fold every {base, lora_A, lora_B} triple into a plain kernel.

    Returns a param tree where LoRADense nodes look like vanilla nn.Dense
    ('base' kernels updated, lora_* removed) — peft merge_and_unload.
    """
    flat = flatten_dict(params)
    out = dict(flat)
    for key in list(flat):
        if key[-1] == "lora_A":
            prefix = key[:-1]
            A = np.asarray(flat[prefix + ("lora_A",)])
            B = np.asarray(flat[prefix + ("lora_B",)])
            kernel_key = prefix + ("base", "kernel")
            r = A.shape[0]
            delta = (lora_alpha / r) * (B @ A)  # [out, in]
            out[kernel_key] = np.asarray(flat[kernel_key]) + delta.T
            del out[prefix + ("lora_A",)]
            del out[prefix + ("lora_B",)]
    return unflatten_dict(out)


class ViTSelfAttention(nn.Module):
    hidden_size: int
    num_heads: int
    lora_rank: Optional[int] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, deterministic: bool = True) -> jnp.ndarray:
        hd = self.hidden_size // self.num_heads
        B, L, _ = x.shape

        def proj(name):
            return LoRADense(self.hidden_size, lora_rank=self.lora_rank, name=name)(
                x, deterministic=deterministic
            )

        q = proj("query").reshape(B, L, self.num_heads, hd).transpose(0, 2, 1, 3)
        k = proj("key").reshape(B, L, self.num_heads, hd).transpose(0, 2, 1, 3)
        v = proj("value").reshape(B, L, self.num_heads, hd).transpose(0, 2, 1, 3)
        attn = jax.nn.softmax(
            jnp.einsum("bhld,bhsd->bhls", q, k) / jnp.sqrt(hd).astype(x.dtype), axis=-1
        )
        out = jnp.einsum("bhls,bhsd->bhld", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, L, self.hidden_size)
        return nn.Dense(self.hidden_size, name="output")(out)


class ViTBlock(nn.Module):
    """Pre-norm transformer block (HF ViTLayer semantics)."""

    hidden_size: int
    num_heads: int
    intermediate_size: int
    eps: float = 1e-12
    lora_rank: Optional[int] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, deterministic: bool = True) -> jnp.ndarray:
        y = nn.LayerNorm(epsilon=self.eps, name="layernorm_before")(x)
        y = ViTSelfAttention(
            self.hidden_size, self.num_heads, self.lora_rank, name="attention"
        )(y, deterministic=deterministic)
        x = x + y
        y = nn.LayerNorm(epsilon=self.eps, name="layernorm_after")(x)
        y = nn.Dense(self.intermediate_size, name="intermediate")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.hidden_size, name="output")(y)
        return x + y


class ViTEncoder(nn.Module):
    """HF ViTModel (pooler-less): images [B,H,W,3] -> tokens [B, 1+L, D]."""

    config: ViTConfig
    lora_rank: Optional[int] = None

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray, *, deterministic: bool = True) -> jnp.ndarray:
        cfg = self.config
        B = pixel_values.shape[0]
        x = nn.Conv(
            cfg.hidden_size,
            kernel_size=(cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size),
            padding="VALID",
            name="patch_embed",
        )(pixel_values)
        x = x.reshape(B, -1, cfg.hidden_size)
        cls = self.param(
            "cls_token", nn.initializers.truncated_normal(0.02), (1, 1, cfg.hidden_size)
        )
        x = jnp.concatenate([jnp.broadcast_to(cls, (B, 1, cfg.hidden_size)), x], axis=1)
        pos = self.param(
            "position_embeddings",
            nn.initializers.truncated_normal(0.02),
            (1, cfg.num_patches + 1, cfg.hidden_size),
        )
        x = x + pos
        for i in range(cfg.num_hidden_layers):
            x = ViTBlock(
                cfg.hidden_size,
                cfg.num_attention_heads,
                cfg.intermediate_size,
                cfg.layer_norm_eps,
                self.lora_rank,
                name=f"block{i}",
            )(x, deterministic=deterministic)
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="layernorm")(x)


class ViTMAEDecoderNoMask(nn.Module):
    """MAE decoder without mask shuffling (reference NoMask variant).

    tokens [B, 1+L, D_enc] -> per-patch pixel logits [B, L, p*p*3].
    """

    config: ViTMAEDecoderConfig
    num_patches: int

    @nn.compact
    def __call__(self, tokens: jnp.ndarray, *, deterministic: bool = True) -> jnp.ndarray:
        cfg = self.config
        x = nn.Dense(cfg.decoder_hidden_size, name="decoder_embed")(tokens)
        pos = jnp.asarray(
            get_2d_sincos_pos_embed(
                cfg.decoder_hidden_size, int(self.num_patches**0.5), add_cls_token=True
            )
        )
        x = x + pos[None]
        for i in range(cfg.decoder_num_hidden_layers):
            x = ViTBlock(
                cfg.decoder_hidden_size,
                cfg.decoder_num_attention_heads,
                cfg.decoder_intermediate_size,
                cfg.layer_norm_eps,
                name=f"block{i}",
            )(x, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="decoder_norm")(x)
        x = nn.Dense(
            cfg.patch_size**2 * cfg.num_channels, name="decoder_pred"
        )(x)
        return x[:, 1:]  # strip CLS


# ---------------------------------------------------------------------------
# HF conversion
# ---------------------------------------------------------------------------


def convert_hf_vit_state_dict(state_dict: dict, config: ViTConfig) -> dict:
    """Map `transformers.ViTModel` weights to :class:`ViTEncoder` params."""

    def get(name):
        for k in (name, "vit." + name):
            if k in state_dict:
                return np.asarray(state_dict[k])
        raise KeyError(name)

    def lin(name, bias=True):
        out = {"kernel": get(name + ".weight").T}
        if bias:
            out["bias"] = get(name + ".bias")
        return out

    def ln(name):
        return {"scale": get(name + ".weight"), "bias": get(name + ".bias")}

    p = {
        "patch_embed": {
            "kernel": get("embeddings.patch_embeddings.projection.weight").transpose(2, 3, 1, 0),
            "bias": get("embeddings.patch_embeddings.projection.bias"),
        },
        "cls_token": get("embeddings.cls_token"),
        "position_embeddings": get("embeddings.position_embeddings"),
        "layernorm": ln("layernorm"),
    }
    for i in range(config.num_hidden_layers):
        base = f"encoder.layer.{i}"
        p[f"block{i}"] = {
            "attention": {
                "query": {"base": lin(base + ".attention.attention.query")},
                "key": {"base": lin(base + ".attention.attention.key")},
                "value": {"base": lin(base + ".attention.attention.value")},
                "output": lin(base + ".attention.output.dense"),
            },
            "layernorm_before": ln(base + ".layernorm_before"),
            "layernorm_after": ln(base + ".layernorm_after"),
            "intermediate": lin(base + ".intermediate.dense"),
            "output": lin(base + ".output.dense"),
        }
    return p


def convert_hf_mae_decoder_state_dict(state_dict: dict, config: ViTMAEDecoderConfig) -> dict:
    """Map HF ViTMAEDecoder weights to :class:`ViTMAEDecoderNoMask` params."""

    def get(name):
        for k in (name, "decoder." + name):
            if k in state_dict:
                return np.asarray(state_dict[k])
        raise KeyError(name)

    def lin(name, bias=True):
        out = {"kernel": get(name + ".weight").T}
        if bias:
            out["bias"] = get(name + ".bias")
        return out

    def ln(name):
        return {"scale": get(name + ".weight"), "bias": get(name + ".bias")}

    p = {
        "decoder_embed": lin("decoder_embed"),
        "decoder_norm": ln("decoder_norm"),
        "decoder_pred": lin("decoder_pred"),
    }
    for i in range(config.decoder_num_hidden_layers):
        base = f"decoder_layers.{i}"
        p[f"block{i}"] = {
            "attention": {
                "query": {"base": lin(base + ".attention.attention.query")},
                "key": {"base": lin(base + ".attention.attention.key")},
                "value": {"base": lin(base + ".attention.attention.value")},
                "output": lin(base + ".attention.output.dense"),
            },
            "layernorm_before": ln(base + ".layernorm_before"),
            "layernorm_after": ln(base + ".layernorm_after"),
            "intermediate": lin(base + ".intermediate.dense"),
            "output": lin(base + ".output.dense"),
        }
    return p
