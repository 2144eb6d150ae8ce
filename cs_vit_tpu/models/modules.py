"""Transformer building blocks for the Poser head, in flax.linen.

Functional parity targets (reference `cs_vit/net/transformer_module.py`),
including two intentional quirks that released checkpoints were trained with:

* ``MHA`` divides attention scores by ``1/sqrt(head_dim)`` — i.e. it
  MULTIPLIES by sqrt(head_dim) (reference :273). Controlled by
  ``compat_scale`` (default True to stay checkpoint-compatible).
* Block norms are **BatchNorm1d over channels** (stats across batch and
  sequence), not LayerNorm (reference :306-317). Train/eval mode changes the
  statistics used, so every block threads ``use_running_average``.

Attention here operates on tiny sequences (3 query tokens, 64 patch tokens,
T<=7 temporal steps), so plain XLA einsum attention is already MXU-bound once
batched; the Pallas kernels in ``cs_vit_tpu.ops`` are reserved for the SwinV2
backbone where the FLOPs live.
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class TorchBatchNorm(nn.Module):
    """BatchNorm matching torch.nn.BatchNorm1d semantics on [..., C] inputs.

    Stats are computed over all axes but the last. Running variance is updated
    with the *unbiased* batch variance (torch behavior) while normalization in
    training uses the biased one. ``momentum`` follows torch convention:
    ``running = (1 - m) * running + m * batch``.
    """

    momentum: float = 0.1
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray, use_running_average: bool) -> jnp.ndarray:
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros(C))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones(C))

        # Stats and the affine run in f32, but the output keeps the caller's
        # dtype: the f32 running-stat variables would otherwise promote bf16
        # activations to f32 at the first norm and drag every downstream
        # dense/attention op in the block off the bf16 MXU path.
        xf = x.astype(jnp.float32)
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            reduce_axes = tuple(range(x.ndim - 1))
            n = float(np.prod([x.shape[a] for a in reduce_axes]))
            mean = jnp.mean(xf, axis=reduce_axes)
            var = jnp.mean((xf - mean) ** 2, axis=reduce_axes)
            if not self.is_initializing():
                unbiased = var * (n / max(n - 1.0, 1.0))
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased

        y = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
        return y.astype(x.dtype)


def _gelu(x: jnp.ndarray) -> jnp.ndarray:
    """Exact (erf) GELU, matching torch.nn.GELU's default."""
    return nn.gelu(x, approximate=False)


class MHA(nn.Module):
    """Multi-head cross/self attention with the reference's score scaling.

    ``compat_scale=True`` multiplies QK^T by sqrt(head_dim) (the reference's
    inverted scaling at `transformer_module.py:273`); ``False`` uses standard
    1/sqrt(head_dim).
    """

    embed_dim: int
    num_heads: int
    compat_scale: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, ctx: jnp.ndarray) -> jnp.ndarray:
        assert self.embed_dim % self.num_heads == 0
        head_dim = self.embed_dim // self.num_heads
        B, L, _ = x.shape
        S = ctx.shape[1]

        q = nn.Dense(self.embed_dim, name="query")(x)
        k = nn.Dense(self.embed_dim, name="key")(ctx)
        v = nn.Dense(self.embed_dim, name="value")(ctx)

        q = q.reshape(B, L, self.num_heads, head_dim).transpose(0, 2, 1, 3)
        k = k.reshape(B, S, self.num_heads, head_dim).transpose(0, 2, 1, 3)
        v = v.reshape(B, S, self.num_heads, head_dim).transpose(0, 2, 1, 3)

        scale = math.sqrt(head_dim) if self.compat_scale else 1.0 / math.sqrt(head_dim)
        scores = jnp.einsum("bhld,bhsd->bhls", q, k) * scale
        # f32 softmax regardless of the activation dtype (tiny [L,S] grids;
        # keeps bf16 runs numerically close to the f32 reference)
        weights = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(v.dtype)
        out = jnp.einsum("bhls,bhsd->bhld", weights, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, L, self.embed_dim)
        return nn.Dense(self.embed_dim, name="output")(out)


class LoraCompatibleMHA(nn.Module):
    """Deprecated q/k/v-projected attention (ref `transformer_module.py:209-232`).

    The reference pre-projects q/k/v with separate Linears and feeds a
    STANDARD ``torch.nn.MultiheadAttention`` (1/sqrt(d_h) scaling — it does
    NOT have the :class:`MHA` sqrt-multiply quirk): a fused in-projection,
    per-head softmax attention, and an out-projection. Deprecated in the
    reference in favor of :class:`MHA` and kept here only so old checkpoints
    load; constructing it warns, as the reference does.
    """

    embed_dim: int
    num_heads: int

    @nn.compact
    def __call__(
        self, query: jnp.ndarray, key: jnp.ndarray, value: jnp.ndarray
    ) -> jnp.ndarray:
        import warnings

        warnings.warn(
            "LoraCompatibleMHA has been deprecated. Use MHA instead.",
            DeprecationWarning,
            stacklevel=2,
        )
        assert self.embed_dim % self.num_heads == 0
        head_dim = self.embed_dim // self.num_heads
        B, L, _ = query.shape
        S = key.shape[1]

        q = nn.Dense(self.embed_dim, name="q_proj")(query)
        k = nn.Dense(self.embed_dim, name="k_proj")(key)
        v = nn.Dense(self.embed_dim, name="v_proj")(value)
        # torch nn.MultiheadAttention: fused in-projection then out-projection
        q = nn.Dense(self.embed_dim, name="in_q")(q)
        k = nn.Dense(self.embed_dim, name="in_k")(k)
        v = nn.Dense(self.embed_dim, name="in_v")(v)

        q = q.reshape(B, L, self.num_heads, head_dim).transpose(0, 2, 1, 3)
        k = k.reshape(B, S, self.num_heads, head_dim).transpose(0, 2, 1, 3)
        v = v.reshape(B, S, self.num_heads, head_dim).transpose(0, 2, 1, 3)

        scores = jnp.einsum("bhld,bhsd->bhls", q, k) / math.sqrt(head_dim)
        weights = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(v.dtype)
        out = jnp.einsum("bhls,bhsd->bhld", weights, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, L, self.embed_dim)
        return nn.Dense(self.embed_dim, name="out")(out)


class FeedForwardNetwork(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = nn.Dense(4 * self.dim, name="fc1")(x)
        y = _gelu(y)
        return nn.Dense(self.dim, name="fc2")(y)


class EncoderBlock(nn.Module):
    dim: int
    num_heads: int
    compat_scale: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        y = TorchBatchNorm(name="norm1")(x, use_running_average=not train)
        y = MHA(self.dim, self.num_heads, self.compat_scale, name="attn")(y, y)
        x = x + y
        y = TorchBatchNorm(name="norm2")(x, use_running_average=not train)
        y = FeedForwardNetwork(self.dim, name="ffn")(y)
        return x + y


class DecoderBlock(nn.Module):
    dim: int
    num_heads: int
    compat_scale: bool = True

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, ref: jnp.ndarray, *, train: bool = False
    ) -> jnp.ndarray:
        y = TorchBatchNorm(name="norm1")(x, use_running_average=not train)
        y = MHA(self.dim, self.num_heads, self.compat_scale, name="self_atten")(y, y)
        x = x + y
        y = TorchBatchNorm(name="norm2")(x, use_running_average=not train)
        y = MHA(self.dim, self.num_heads, self.compat_scale, name="cross_atten")(y, ref)
        x = x + y
        y = TorchBatchNorm(name="norm3")(x, use_running_average=not train)
        y = FeedForwardNetwork(self.dim, name="ffn")(y)
        return x + y


class CrossAttnDecoder(nn.Module):
    dim: int
    num_heads: int
    compat_scale: bool = True

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, ref: jnp.ndarray, *, train: bool = False
    ) -> jnp.ndarray:
        y = TorchBatchNorm(name="norm1")(x, use_running_average=not train)
        y = MHA(self.dim, self.num_heads, self.compat_scale, name="cross_atten")(y, ref)
        x = x + y
        y = TorchBatchNorm(name="norm2")(x, use_running_average=not train)
        y = FeedForwardNetwork(self.dim, name="ffn")(y)
        return x + y


def rope_rotate_pairs(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Rotate adjacent feature pairs: x viewed as [..., d/2, 2]."""
    x2 = x.reshape(*x.shape[:-1], -1, 2)
    x1, xb = x2[..., 0], x2[..., 1]
    r1 = x1 * cos - xb * sin
    r2 = x1 * sin + xb * cos
    return jnp.stack([r1, r2], axis=-1).reshape(x.shape)


class PositionalEncoding(nn.Module):
    """PE with modes: 'absolute' (learned), 'trope' (continuous-time RoPE).

    'trope' rotates token *values* (not q/k) by phase ``(t_last - t) * f_i``
    with the standard 10000^(-2i/d) frequency bank — reference
    `transformer_module.py:29-33, 54-81`.
    """

    d_model: int
    max_len: int = 512
    mode: str = "absolute"

    @nn.compact
    def __call__(self, x: jnp.ndarray, t: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        if self.mode == "absolute":
            pe = self.param(
                "pe",
                nn.initializers.normal(1.0),
                (self.max_len, self.d_model),
            )
            seq_len = x.shape[1]
            return x + pe[None, :seq_len]
        elif self.mode == "trope":
            if t is None:
                raise ValueError("t must be provided for 'trope' mode")
            if self.d_model % 2 != 0:
                raise ValueError("d_model must be even for RoPE")
            inv_freq = 1.0 / (
                10000.0 ** (np.arange(0, self.d_model, 2, dtype=np.float32) / self.d_model)
            )
            t_processed = t[:, -1:] - t  # [B, T]
            freqs = t_processed[..., None].astype(jnp.float32) * jnp.asarray(inv_freq)
            # f32 phase tables must not promote bf16 activations
            return rope_rotate_pairs(
                x, jnp.cos(freqs), jnp.sin(freqs)
            ).astype(x.dtype)
        else:
            raise ValueError(f"Unsupported position mode: {self.mode}")


class RoPE2DPositionalEncoding(nn.Module):
    """2D polar RoPE over a patch grid (reference `transformer_module.py:84-158`).

    Adds a learned radial embedding (32 anchors, linearly interpolated by
    normalized distance from the grid center), then rotates feature pairs by
    angle theta(p,q)=atan2(dq, dp) scaled by a log-spaced frequency bank.
    """

    embed_dim: int
    num_p: int
    num_q: int
    num_point: int = 32
    freq_base: float = 10000.0

    def setup(self):
        self.embedding = self.param(
            "embedding", nn.initializers.normal(1.0), (self.num_point, self.embed_dim)
        )
        p, q = np.meshgrid(
            np.arange(self.num_p), np.arange(self.num_q), indexing="ij"
        )
        center_p = (self.num_p - 1) / 2
        center_q = (self.num_q - 1) / 2
        dp = p.astype(np.float32) - center_p
        dq = q.astype(np.float32) - center_q
        dist = np.sqrt(dp**2 + dq**2)
        max_dist = math.sqrt(center_p**2 + center_q**2)
        norm_dist = np.clip(dist / max_dist, 0.0, 1.0)
        sample = norm_dist * (self.num_point - 1)

        theta = np.arctan2(dq, dp)
        half = self.embed_dim // 2
        freq = 1.0 / (self.freq_base ** (np.arange(half, dtype=np.float32) / half))
        pos_theta = np.einsum("pq,d->pqd", theta, freq)

        self._cos = jnp.asarray(np.cos(pos_theta))  # [p,q,half]
        self._sin = jnp.asarray(np.sin(pos_theta))
        self._floor = jnp.asarray(np.clip(np.floor(sample), 0, self.num_point - 1).astype(np.int32))
        self._ceil = jnp.asarray(np.clip(np.ceil(sample), 0, self.num_point - 1).astype(np.int32))
        self._alpha = jnp.asarray((sample - np.floor(sample)).astype(np.float32))[..., None]

    def __call__(self, patches: jnp.ndarray) -> jnp.ndarray:
        B = patches.shape[0]
        x = patches.reshape(B, self.num_p, self.num_q, self.embed_dim)
        emb_f = self.embedding[self._floor]   # [p,q,D]
        emb_c = self.embedding[self._ceil]
        dist_emb = emb_f * (1 - self._alpha) + emb_c * self._alpha
        encoded = x + dist_emb[None]
        # rotation matrix applied as in reference: einsum("pqdrc,bpqdc->bpqdr")
        # with rot = [[cos, -sin], [sin, cos]] over feature pairs.
        e2 = encoded.reshape(B, self.num_p, self.num_q, -1, 2)
        x1, x2 = e2[..., 0], e2[..., 1]
        cos, sin = self._cos[None], self._sin[None]
        r1 = cos * x1 - sin * x2
        r2 = sin * x1 + cos * x2
        rotated = jnp.stack([r1, r2], axis=-1)
        return rotated.reshape(B, self.num_p * self.num_q, self.embed_dim)


class ContinuousAngleEmbedding(nn.Module):
    """Fourier features of a scalar with a learnable log-spaced freq bank.

    Reference `transformer_module.py:161-206`.
    """

    output_dim: int = 64
    num_freq: int = 16
    max_angle: float = 2 * math.pi

    @nn.compact
    def __call__(self, angles: jnp.ndarray) -> jnp.ndarray:
        freq_base = self.param(
            "freq_base",
            lambda key: jnp.asarray(np.logspace(0, 1, self.num_freq, base=10.0), jnp.float32),
        )
        a = jnp.mod(angles, self.max_angle)
        a = a / self.max_angle * (2 * math.pi)
        scaled = a[..., None] * freq_base
        raw = jnp.concatenate([jnp.sin(scaled), jnp.cos(scaled)], axis=-1)
        y = nn.Dense(self.output_dim, name="proj")(raw)
        y = _gelu(y)
        return nn.LayerNorm(epsilon=1e-5, name="norm")(y)
