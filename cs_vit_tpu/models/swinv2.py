"""SwinV2 encoder in flax — TPU-native backbone for the Poser.

Numerically matches `transformers.Swinv2Model` (the backbone the reference
loads at `cs_vit/net/ti_poser.py:246`) so released HF checkpoints convert
directly, while being laid out for XLA/TPU:

* NHWC everywhere; window partition/reverse are pure reshapes+transposes that
  XLA fuses away.
* All shift masks, relative-position indices and log-CPB coordinate tables
  are static numpy constants baked at trace time (zero per-step host work).
* Cosine window attention runs as batched einsums over [B*nW, L, d] blocks —
  MXU-shaped; the Pallas fused kernel in ``cs_vit_tpu.ops`` can be swapped in
  via ``attention_impl="pallas"``.

Key SwinV2 semantics replicated (see HF `modeling_swinv2.py`):
  - cosine attention: softmax(normalize(q) @ normalize(k)^T * exp(clamp(logit_scale, max=ln 100)) + 16*sigmoid(CPB))
  - q,v have bias, k has none
  - residual-POST-norm: x + LN(attn(x)), x + LN(mlp(x))
  - per-stage window/shift clamped to input resolution
  - patch merging concat order (0,0),(1,0),(0,1),(1,1) -> Linear(4C->2C, no bias) -> LN
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class SwinV2Config:
    image_size: int = 256
    patch_size: int = 4
    num_channels: int = 3
    embed_dim: int = 96
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    window_size: int = 16
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_path_rate: float = 0.1
    layer_norm_eps: float = 1e-5
    pretrained_window_sizes: Tuple[int, ...] = (0, 0, 0, 0)
    remat: bool = False  # rematerialize blocks (trade FLOPs for HBM in training)

    @property
    def num_layers(self) -> int:
        return len(self.depths)

    @property
    def num_features(self) -> int:
        return int(self.embed_dim * 2 ** (self.num_layers - 1))


def swinv2_tiny_256(window_size: int = 16, **kw) -> SwinV2Config:
    """microsoft/swinv2-tiny-patch4-window16-256."""
    return SwinV2Config(
        embed_dim=96, depths=(2, 2, 6, 2), num_heads=(3, 6, 12, 24),
        window_size=window_size, **kw,
    )


def swinv2_base_256(window_size: int = 16, **kw) -> SwinV2Config:
    """microsoft/swinv2-base-patch4-window16-256."""
    return SwinV2Config(
        embed_dim=128, depths=(2, 2, 18, 2), num_heads=(4, 8, 16, 32),
        window_size=window_size, **kw,
    )


def _compute_window_shift(
    resolution: Tuple[int, int], window: int, shift: int
) -> Tuple[int, int]:
    """Clamp window to resolution; zero the shift when clamped (HF behavior)."""
    ws = min(resolution[0], resolution[1], window)
    sh = 0 if min(resolution) <= window else shift
    return ws, sh


def _relative_coords_table(window_size: int, pretrained_window_size: int) -> np.ndarray:
    """Log-spaced continuous relative coordinates, [(2w-1)^2, 2]."""
    rng = np.arange(-(window_size - 1), window_size, dtype=np.float32)
    table = np.stack(np.meshgrid(rng, rng, indexing="ij"), axis=-1)  # [2w-1,2w-1,2]
    denom = (pretrained_window_size - 1) if pretrained_window_size > 0 else (window_size - 1)
    if denom > 0:
        table = table / denom
    table = table * 8.0
    table = np.sign(table) * np.log2(np.abs(table) + 1.0) / math.log2(8.0)
    return table.reshape(-1, 2)


def _relative_position_index(window_size: int) -> np.ndarray:
    """Pairwise relative-position lookup indices, [w*w, w*w]."""
    coords = np.stack(
        np.meshgrid(np.arange(window_size), np.arange(window_size), indexing="ij")
    ).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += window_size - 1
    rel[:, :, 1] += window_size - 1
    rel[:, :, 0] *= 2 * window_size - 1
    return rel.sum(-1).astype(np.int32)


def _shift_attn_mask(height: int, width: int, window_size: int, shift: int) -> np.ndarray:
    """Additive mask [nW, w*w, w*w] for shifted-window attention (-100 off-region)."""
    img_mask = np.zeros((height, width), dtype=np.float32)
    h_slices = (slice(0, -window_size), slice(-window_size, -shift), slice(-shift, None))
    w_slices = (slice(0, -window_size), slice(-window_size, -shift), slice(-shift, None))
    count = 0
    for hs in h_slices:
        for ws_ in w_slices:
            img_mask[hs, ws_] = count
            count += 1
    nh, nw = height // window_size, width // window_size
    mw = img_mask.reshape(nh, window_size, nw, window_size)
    mw = mw.transpose(0, 2, 1, 3).reshape(-1, window_size * window_size)
    diff = mw[:, None, :] - mw[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def window_partition(x: jnp.ndarray, window_size: int) -> jnp.ndarray:
    """[B, H, W, C] -> [B*nW, ws, ws, C], windows in row-major grid order."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // window_size, window_size, W // window_size, window_size, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window_size, window_size, C)


def window_reverse(windows: jnp.ndarray, window_size: int, H: int, W: int) -> jnp.ndarray:
    """[B*nW, ws, ws, C] -> [B, H, W, C]."""
    C = windows.shape[-1]
    B = windows.shape[0] // ((H // window_size) * (W // window_size))
    x = windows.reshape(B, H // window_size, W // window_size, window_size, window_size, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H, W, C)


class DenseParams(nn.Module):
    """``nn.Dense``-compatible layer whose weights are setup-declared.

    Identical param tree (``kernel`` [in, out], optional ``bias``), identical
    initializers and promotion semantics — but the raw weights are plain
    attributes, so the fused whole-block Pallas kernel can consume them
    directly without tracing a flax call per matmul.
    """

    in_features: int
    features: int
    use_bias: bool = True

    def setup(self):
        self.kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (self.in_features, self.features)
        )
        if self.use_bias:
            self.bias = self.param("bias", nn.initializers.zeros, (self.features,))

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = x @ self.kernel
        if self.use_bias:
            y = y + self.bias
        return y


class LayerNormParams(nn.Module):
    """``nn.LayerNorm``-compatible (scale/bias tree, f32 statistics)."""

    dim: int
    eps: float = 1e-5

    def setup(self):
        self.scale = self.param("scale", nn.initializers.ones, (self.dim,))
        self.bias = self.param("bias", nn.initializers.zeros, (self.dim,))

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dtype = jnp.promote_types(x.dtype, self.scale.dtype)
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.maximum(jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean, 0.0)
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        return (y.astype(dtype) * self.scale.astype(dtype) + self.bias.astype(dtype))


class DropPath(nn.Module):
    """Stochastic depth: drops the whole residual branch per-sample."""

    rate: float

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool) -> jnp.ndarray:
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("droppath")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape).astype(x.dtype)
        return x * mask / keep


class WindowAttention(nn.Module):
    """SwinV2 cosine attention over pre-partitioned windows."""

    dim: int
    num_heads: int
    window_size: int
    pretrained_window_size: int = 0
    qkv_bias: bool = True
    attention_impl: str = "xla"

    def setup(self):
        self.logit_scale = self.param(
            "logit_scale",
            lambda key: jnp.full((self.num_heads, 1, 1), math.log(10.0), jnp.float32),
        )
        self.cpb1 = nn.Dense(512, name="cpb1")
        self.cpb2 = nn.Dense(self.num_heads, use_bias=False, name="cpb2")
        self.query = DenseParams(self.dim, self.dim, use_bias=self.qkv_bias, name="query")
        self.key = DenseParams(self.dim, self.dim, use_bias=False, name="key")
        self.value = DenseParams(self.dim, self.dim, use_bias=self.qkv_bias, name="value")
        self.proj = DenseParams(self.dim, self.dim, name="proj")

        self._coords_table = jnp.asarray(
            _relative_coords_table(self.window_size, self.pretrained_window_size)
        )
        self._rel_index = jnp.asarray(_relative_position_index(self.window_size))

    def relative_position_bias(self) -> jnp.ndarray:
        """CPB-MLP bias, [num_heads, L, L] with L = window_size**2."""
        table = self.cpb2(nn.relu(self.cpb1(self._coords_table)))  # [(2w-1)^2, nH]
        L = self.window_size * self.window_size
        bias = table[self._rel_index.reshape(-1)].reshape(L, L, self.num_heads)
        bias = bias.transpose(2, 0, 1)
        return 16.0 * jax.nn.sigmoid(bias)

    def __call__(
        self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        """x: [B_, L, C] window tokens; mask: [nW, L, L] additive or None."""
        B_, L, C = x.shape
        H, hd = self.num_heads, C // self.num_heads

        q = self.query(x).reshape(B_, L, H, hd).transpose(0, 2, 1, 3)
        k = self.key(x).reshape(B_, L, H, hd).transpose(0, 2, 1, 3)
        v = self.value(x).reshape(B_, L, H, hd).transpose(0, 2, 1, 3)

        scale = jnp.exp(jnp.minimum(self.logit_scale, math.log(100.0)))
        rel_bias = self.relative_position_bias()  # [H, L, L]

        if self.attention_impl == "pallas":
            from ..ops.window_attention import fused_window_attention

            if mask is not None:
                bias = rel_bias[None] + mask[:, None]  # [nW, H, L, L]
            else:
                bias = rel_bias[None]                  # [1, H, L, L]
            out = fused_window_attention(
                q, k, v, bias, scale.reshape(-1),
                interpret=jax.default_backend() != "tpu",
            )
            out = out.transpose(0, 2, 1, 3).reshape(B_, L, C)
            return self.proj(out)

        qn = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
        kn = k / jnp.maximum(jnp.linalg.norm(k, axis=-1, keepdims=True), 1e-12)
        attn = jnp.einsum("bhld,bhsd->bhls", qn, kn) * scale

        attn = attn + rel_bias[None]

        if mask is not None:
            nW = mask.shape[0]
            attn = attn.reshape(B_ // nW, nW, H, L, L) + mask[None, :, None]
            attn = attn.reshape(B_, H, L, L)

        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhls,bhsd->bhld", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B_, L, C)
        return self.proj(out)


class SwinV2Block(nn.Module):
    config: SwinV2Config
    dim: int
    resolution: Tuple[int, int]
    num_heads: int
    shift_size: int
    drop_path_rate: float
    pretrained_window_size: int = 0
    attention_impl: str = "xla"

    def setup(self):
        ws, sh = _compute_window_shift(
            self.resolution, self.config.window_size, self.shift_size
        )
        self._ws, self._sh = ws, sh
        impl = self.attention_impl
        # Whole-block Pallas fusion: qkv->attn->proj->LN->res->MLP->LN->res in
        # one kernel, weights VMEM-resident (the kernel raises its scoped-VMEM
        # limit to 100 MB, so even stage 3 of Swin-B — 48 MB f32 weights —
        # fits). Blocks whose worst-case (f32) weights would not fit fall back
        # to the XLA path.
        weight_bytes = 4 * (
            4 * self.dim * self.dim
            + 2 * self.dim * int(self.dim * self.config.mlp_ratio)
        )
        self._fused = impl == "fused" and weight_bytes <= 64 * 2**20
        if impl == "fused":
            impl = "xla"  # fallback path for blocks over the VMEM budget
        if impl == "hybrid":
            # Measured on v5e: the fused Pallas kernel wins ~2.2x when an
            # image splits into many windows (small-batch-per-window einsums
            # and softmax HBM traffic dominate the XLA path); XLA's batched
            # einsum wins at single-window stages. Pick per block.
            n_windows = (self.resolution[0] // ws) * (self.resolution[1] // ws)
            impl = "pallas" if n_windows > 1 else "xla"
        self.attn = WindowAttention(
            dim=self.dim,
            num_heads=self.num_heads,
            window_size=ws,
            pretrained_window_size=self.pretrained_window_size,
            qkv_bias=self.config.qkv_bias,
            attention_impl=impl,
            name="attn",
        )
        eps = self.config.layer_norm_eps
        hidden = int(self.dim * self.config.mlp_ratio)
        self.layernorm_before = LayerNormParams(self.dim, eps, name="layernorm_before")
        self.layernorm_after = LayerNormParams(self.dim, eps, name="layernorm_after")
        self.intermediate = DenseParams(self.dim, hidden, name="intermediate")
        self.output = DenseParams(hidden, self.dim, name="output")
        self.drop_path = DropPath(self.drop_path_rate)
        if sh > 0:
            self._mask = jnp.asarray(
                _shift_attn_mask(self.resolution[0], self.resolution[1], ws, sh)
            )
        else:
            self._mask = None

    def __call__(self, x: jnp.ndarray, *, deterministic: bool = True) -> jnp.ndarray:
        """x: [B, H*W, C]."""
        H, W = self.resolution
        B, _, C = x.shape
        ws, sh = self._ws, self._sh
        if self._fused:
            dp = None
            if not deterministic and self.drop_path_rate > 0.0:
                # stochastic depth in-kernel: per-image keep/scale factors
                # for the two residual branches (matches DropPath semantics)
                keep = 1.0 - self.drop_path_rate
                rng = self.make_rng("droppath")
                dp = (
                    jax.random.bernoulli(rng, keep, (B, 2)).astype(jnp.float32)
                    / keep
                )
            return self._fused_forward(x, B, C, dp)
        shortcut = x

        x = x.reshape(B, H, W, C)
        if sh > 0:
            x = jnp.roll(x, shift=(-sh, -sh), axis=(1, 2))
        windows = window_partition(x, ws).reshape(-1, ws * ws, C)
        attn_out = self.attn(windows, self._mask)
        x = window_reverse(attn_out.reshape(-1, ws, ws, C), ws, H, W)
        if sh > 0:
            x = jnp.roll(x, shift=(sh, sh), axis=(1, 2))
        x = x.reshape(B, H * W, C)

        # residual-post-norm (SwinV2)
        x = shortcut + self.drop_path(self.layernorm_before(x), deterministic)

        y = self.output(nn.gelu(self.intermediate(x), approximate=False))
        x = x + self.drop_path(self.layernorm_after(y), deterministic)
        return x

    def _fused_forward(
        self, x: jnp.ndarray, B: int, C: int, droppath_keep=None
    ) -> jnp.ndarray:
        """Whole-block Pallas kernel path (see ``cs_vit_tpu.ops.fused_block``)."""
        from ..ops.fused_block import fused_swin_block

        H, W = self.resolution
        ws, sh = self._ws, self._sh
        a = self.attn

        rel_bias = a.relative_position_bias()  # [heads, L, L]
        scale = jnp.exp(
            jnp.minimum(self.attn.logit_scale, math.log(100.0))
        ).reshape(-1)

        # Uniform compute dtype = nn.Dense promotion of (input, params).
        dt = jnp.promote_types(x.dtype, a.query.kernel.dtype)
        zero_b = jnp.zeros((C,), dt)
        wqkv = jnp.concatenate(
            [a.query.kernel, a.key.kernel, a.value.kernel], axis=1
        ).astype(dt)
        bqkv = jnp.concatenate([
            a.query.bias if self.config.qkv_bias else zero_b,
            zero_b,  # SwinV2 key has no bias
            a.value.bias if self.config.qkv_bias else zero_b,
        ]).astype(dt)

        xi = x.reshape(B, H, W, C).astype(dt)
        y = fused_swin_block(
            xi,
            wqkv, bqkv,
            a.proj.kernel.astype(dt), a.proj.bias.astype(dt),
            self.layernorm_before.scale.astype(dt), self.layernorm_before.bias.astype(dt),
            self.intermediate.kernel.astype(dt), self.intermediate.bias.astype(dt),
            self.output.kernel.astype(dt), self.output.bias.astype(dt),
            self.layernorm_after.scale.astype(dt), self.layernorm_after.bias.astype(dt),
            rel_bias.astype(dt),
            scale,
            mask=None if self._mask is None else self._mask.astype(dt),
            droppath_keep=droppath_keep,
            window_size=ws,
            num_heads=self.num_heads,
            eps=self.config.layer_norm_eps,
            interpret=jax.default_backend() != "tpu",
            shift=sh,
        )
        return y.reshape(B, H * W, C)


class PatchMerging(nn.Module):
    dim: int
    resolution: Tuple[int, int]
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        H, W = self.resolution
        B, _, C = x.shape
        # Same math as the reference's strided-slice + concat + Dense
        # (gather 2x2 neighborhoods into 4C, then project to 2C), expressed
        # as a 2x2 stride-2 conv: the four strided slices lower to sublane
        # relayout passes on TPU (measured 3.66 ms for the stage-0 merge at
        # batch 256 vs ~0.4 ms of conv FLOPs).  The param keeps the
        # reference's ``reduction/kernel`` [4C, 2C] tree for checkpoint
        # compatibility; concat segment s = 2*dw + dh maps to kernel tap
        # [dh, dw].
        w = DenseParams(4 * C, 2 * self.dim, use_bias=False, name="reduction").kernel
        kernel = w.reshape(2, 2, C, 2 * self.dim).transpose(1, 0, 2, 3)
        y = jax.lax.conv_general_dilated(
            x.reshape(B, H, W, C),
            kernel.astype(x.dtype),
            window_strides=(2, 2),
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ).reshape(B, (H // 2) * (W // 2), 2 * self.dim)
        return nn.LayerNorm(epsilon=self.eps, name="norm")(y)


class SwinV2(nn.Module):
    """Full SwinV2 encoder: images [B, H, W, 3] -> tokens [B, (H/32)^2, D]."""

    config: SwinV2Config
    attention_impl: str = "xla"

    @nn.compact
    def __call__(
        self, pixel_values: jnp.ndarray, *, deterministic: bool = True
    ) -> jnp.ndarray:
        cfg = self.config
        B = pixel_values.shape[0]
        # Patch embedding: conv stride=patch_size, then LN.
        x = nn.Conv(
            cfg.embed_dim,
            kernel_size=(cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size),
            padding="VALID",
            name="patch_embed",
        )(pixel_values)
        H = cfg.image_size // cfg.patch_size
        x = x.reshape(B, H * H, cfg.embed_dim)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="patch_norm")(x)

        total_depth = sum(cfg.depths)
        dpr = np.linspace(0, cfg.drop_path_rate, total_depth)

        res = H
        dim = cfg.embed_dim
        block_idx = 0
        block_cls = (
            nn.remat(SwinV2Block, static_argnums=()) if cfg.remat else SwinV2Block
        )
        for stage in range(cfg.num_layers):
            for i in range(cfg.depths[stage]):
                x = block_cls(
                    config=cfg,
                    dim=dim,
                    resolution=(res, res),
                    num_heads=cfg.num_heads[stage],
                    shift_size=0 if i % 2 == 0 else cfg.window_size // 2,
                    drop_path_rate=float(dpr[block_idx]),
                    pretrained_window_size=cfg.pretrained_window_sizes[stage],
                    attention_impl=self.attention_impl,
                    name=f"stage{stage}_block{i}",
                )(x, deterministic=deterministic)
                block_idx += 1
            if stage < cfg.num_layers - 1:
                x = PatchMerging(
                    dim=dim, resolution=(res, res), eps=cfg.layer_norm_eps,
                    name=f"stage{stage}_downsample",
                )(x)
                res //= 2
                dim *= 2

        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="layernorm")(x)


# ---------------------------------------------------------------------------
# HF torch checkpoint conversion
# ---------------------------------------------------------------------------


def convert_hf_swinv2_state_dict(state_dict: dict, config: SwinV2Config) -> dict:
    """Map a `transformers.Swinv2Model` state_dict (numpy values) to flax params.

    Accepts keys with or without the leading ``swinv2.`` prefix. Linear weights
    are transposed [out,in]->[in,out]; the patch conv becomes HWIO.
    """

    def get(name):
        for k in (name, "swinv2." + name):
            if k in state_dict:
                return np.asarray(state_dict[k])
        raise KeyError(name)

    p: dict = {}
    p["patch_embed"] = {
        "kernel": get("embeddings.patch_embeddings.projection.weight").transpose(2, 3, 1, 0),
        "bias": get("embeddings.patch_embeddings.projection.bias"),
    }
    p["patch_norm"] = {
        "scale": get("embeddings.norm.weight"),
        "bias": get("embeddings.norm.bias"),
    }

    def lin(name, bias=True):
        out = {"kernel": get(name + ".weight").T}
        if bias:
            out["bias"] = get(name + ".bias")
        return out

    def ln(name):
        return {"scale": get(name + ".weight"), "bias": get(name + ".bias")}

    for s in range(config.num_layers):
        for b in range(config.depths[s]):
            base = f"encoder.layers.{s}.blocks.{b}"
            attn = {
                "logit_scale": get(base + ".attention.self.logit_scale"),
                "cpb1": lin(base + ".attention.self.continuous_position_bias_mlp.0"),
                "cpb2": lin(base + ".attention.self.continuous_position_bias_mlp.2", bias=False),
                "query": lin(base + ".attention.self.query", bias=config.qkv_bias),
                "key": lin(base + ".attention.self.key", bias=False),
                "value": lin(base + ".attention.self.value", bias=config.qkv_bias),
                "proj": lin(base + ".attention.output.dense"),
            }
            p[f"stage{s}_block{b}"] = {
                "attn": attn,
                "layernorm_before": ln(base + ".layernorm_before"),
                "layernorm_after": ln(base + ".layernorm_after"),
                "intermediate": lin(base + ".intermediate.dense"),
                "output": lin(base + ".output.dense"),
            }
        if s < config.num_layers - 1:
            p[f"stage{s}_downsample"] = {
                "reduction": lin(f"encoder.layers.{s}.downsample.reduction", bias=False),
                "norm": ln(f"encoder.layers.{s}.downsample.norm"),
            }

    p["layernorm"] = ln("layernorm")
    return p
