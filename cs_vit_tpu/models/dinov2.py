"""DINOv2 backbone in flax (for TI_DinoViT, ref `ti_vit.py:281-338`).

Numerically matches `transformers.Dinov2Backbone` (the reference's student /
teacher encoder): CLS+patch embedding with bicubic position-embedding
interpolation, pre-norm blocks with LayerScale, and the backbone head that
layernorms the last hidden state and returns CLS-stripped patch features.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class Dinov2Config:
    image_size: int = 518
    patch_size: int = 14
    num_channels: int = 3
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    mlp_ratio: int = 4
    layer_norm_eps: float = 1e-6
    layerscale_value: float = 1.0
    use_swiglu_ffn: bool = False

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2


class Dinov2Block(nn.Module):
    cfg: Dinov2Config

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        hd = cfg.hidden_size // cfg.num_attention_heads
        B, L, _ = x.shape

        y = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="norm1")(x)
        q = nn.Dense(cfg.hidden_size, name="query")(y)
        k = nn.Dense(cfg.hidden_size, name="key")(y)
        v = nn.Dense(cfg.hidden_size, name="value")(y)
        q = q.reshape(B, L, cfg.num_attention_heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(B, L, cfg.num_attention_heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(B, L, cfg.num_attention_heads, hd).transpose(0, 2, 1, 3)
        attn = jax.nn.softmax(
            jnp.einsum("bhld,bhsd->bhls", q, k) / jnp.sqrt(hd).astype(x.dtype), axis=-1
        )
        o = jnp.einsum("bhls,bhsd->bhld", attn, v).transpose(0, 2, 1, 3).reshape(B, L, -1)
        o = nn.Dense(cfg.hidden_size, name="attn_output")(o)
        ls1 = self.param(
            "layer_scale1",
            lambda key: jnp.full((cfg.hidden_size,), cfg.layerscale_value),
        )
        x = x + o * ls1

        y = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="norm2")(x)
        if cfg.use_swiglu_ffn:
            hidden = int(cfg.hidden_size * cfg.mlp_ratio * 2 / 3)
            hidden = (hidden + 7) // 8 * 8
            h12 = nn.Dense(2 * hidden, name="weights_in")(y)
            h1, h2 = jnp.split(h12, 2, axis=-1)
            y = nn.Dense(cfg.hidden_size, name="weights_out")(nn.silu(h1) * h2)
        else:
            y = nn.Dense(cfg.hidden_size * cfg.mlp_ratio, name="fc1")(y)
            y = nn.gelu(y, approximate=False)
            y = nn.Dense(cfg.hidden_size, name="fc2")(y)
        ls2 = self.param(
            "layer_scale2",
            lambda key: jnp.full((cfg.hidden_size,), cfg.layerscale_value),
        )
        return x + y * ls2


class Dinov2Backbone(nn.Module):
    """images [B,H,W,3] -> layernormed CLS-stripped patches [B, L, D]."""

    config: Dinov2Config

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        B, H, W, _ = pixel_values.shape
        x = nn.Conv(
            cfg.hidden_size,
            kernel_size=(cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size),
            padding="VALID",
            name="patch_embed",
        )(pixel_values)
        h, w = x.shape[1], x.shape[2]
        x = x.reshape(B, h * w, cfg.hidden_size)

        cls = self.param(
            "cls_token", nn.initializers.truncated_normal(0.02), (1, 1, cfg.hidden_size)
        )
        x = jnp.concatenate([jnp.broadcast_to(cls, (B, 1, cfg.hidden_size)), x], axis=1)

        pos = self.param(
            "position_embeddings",
            nn.initializers.truncated_normal(0.02),
            (1, cfg.num_patches + 1, cfg.hidden_size),
        )
        grid0 = int(cfg.num_patches**0.5)
        if (h, w) != (grid0, grid0):
            # bicubic interpolation of patch position embeddings (HF behavior)
            patch_pos = pos[:, 1:].reshape(1, grid0, grid0, cfg.hidden_size)
            patch_pos = jax.image.resize(
                patch_pos, (1, h, w, cfg.hidden_size), method="bicubic"
            ).reshape(1, h * w, cfg.hidden_size)
            pos = jnp.concatenate([pos[:, :1], patch_pos], axis=1)
        x = x + pos

        for i in range(cfg.num_hidden_layers):
            x = Dinov2Block(cfg, name=f"block{i}")(x)

        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="layernorm")(x)
        return x[:, 1:]  # strip CLS, keep [B, L, D]


def convert_hf_dinov2_state_dict(state_dict: dict, config: Dinov2Config) -> dict:
    """Map `transformers.Dinov2Backbone`/`Dinov2Model` weights to flax params."""

    def get(name):
        for k in (name, "dinov2." + name):
            if k in state_dict:
                return np.asarray(state_dict[k])
        raise KeyError(name)

    def lin(name):
        return {"kernel": get(name + ".weight").T, "bias": get(name + ".bias")}

    def ln(name):
        return {"scale": get(name + ".weight"), "bias": get(name + ".bias")}

    p = {
        "patch_embed": {
            "kernel": get(
                "embeddings.patch_embeddings.projection.weight"
            ).transpose(2, 3, 1, 0),
            "bias": get("embeddings.patch_embeddings.projection.bias"),
        },
        "cls_token": get("embeddings.cls_token"),
        "position_embeddings": get("embeddings.position_embeddings"),
        "layernorm": ln("layernorm"),
    }
    for i in range(config.num_hidden_layers):
        base = f"encoder.layer.{i}"
        blk = {
            "norm1": ln(base + ".norm1"),
            "norm2": ln(base + ".norm2"),
            "query": lin(base + ".attention.attention.query"),
            "key": lin(base + ".attention.attention.key"),
            "value": lin(base + ".attention.attention.value"),
            "attn_output": lin(base + ".attention.output.dense"),
            "layer_scale1": get(base + ".layer_scale1.lambda1"),
            "layer_scale2": get(base + ".layer_scale2.lambda1"),
        }
        if config.use_swiglu_ffn:
            blk["weights_in"] = lin(base + ".mlp.weights_in")
            blk["weights_out"] = lin(base + ".mlp.weights_out")
        else:
            blk["fc1"] = lin(base + ".mlp.fc1")
            blk["fc2"] = lin(base + ".mlp.fc2")
        p[f"block{i}"] = blk
    return p
