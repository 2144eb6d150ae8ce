"""Fused SwinV2 cosine window attention as a Pallas TPU kernel.

The hot op of the backbone: for every (window, head) it computes

  softmax( normalize(q) @ normalize(k)^T * exp(clamp(logit_scale)) + bias ) @ v

entirely in VMEM. Window lengths are tiny (L = window_size^2 <= 256), so the
whole L x L score tile fits on-chip — the win over the XLA path is never
round-tripping the [B*nW, H, L, L] attention tensor through HBM (≈1 GB per
stage-0 layer at batch 64 on Swin-B/256).

The relative-position bias (CPB-MLP output) and the shift mask are combined
OUTSIDE the kernel into one [nW or 1, H, L, L] tensor — they are batch-
independent and computed once per forward.

Grid: (B_, H). Blocks: q/k/v [L, hd] VMEM, bias [L, L] VMEM indexed by
(window-in-image, head), scale [1, 1] SMEM-like VMEM scalar per head.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_window_attention(
    q: jnp.ndarray,        # [B_, H, L, hd]
    k: jnp.ndarray,        # [B_, H, L, hd]
    v: jnp.ndarray,        # [B_, H, L, hd]
    bias: jnp.ndarray,     # [nW or 1, H, L, L] (rel-pos bias + shift mask)
    logit_scale: jnp.ndarray,  # [H] already exp(clamp(...))
    interpret: bool = False,
) -> jnp.ndarray:
    B_, H, L, hd = q.shape
    nW = bias.shape[0]
    assert B_ % nW == 0, "window batch must be images * windows-per-image"
    B_img = B_ // nW

    scale2d = logit_scale.reshape(H, 1).astype(jnp.float32)

    # Head chunking keeps the double-buffered VMEM blocks under budget
    # (stage 2 of Swin-B has H=16, L=256: a full-head bias block would be
    # 4 MB x 2 buffers on top of q/k/v/out — over the 16 MB VMEM).
    Hc = H
    while Hc > 1 and (Hc * L * L * 4 > 1 << 21 or Hc * L * hd * 4 * 8 > 1 << 21):
        Hc //= 2
    n_hc = H // Hc

    # Grid (w, hc, i): one program computes a chunk of heads of one window
    # instance. The innermost axis walks images while (w, hc) — and therefore
    # the bias block index — stay constant, so Mosaic keeps the [Hc, L, L]
    # bias resident in VMEM instead of re-fetching it for every program (it
    # is batch-independent and the single largest input).
    grid = (nW, n_hc, B_img)
    qkv_spec = pl.BlockSpec(
        (1, Hc, L, hd), lambda w, hc, i: (i * nW + w, hc, 0, 0),
        memory_space=pltpu.VMEM,
    )
    bias_spec = pl.BlockSpec(
        (1, Hc, L, L), lambda w, hc, i: (w, hc, 0, 0), memory_space=pltpu.VMEM
    )
    scale_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec(
        (1, Hc, L, hd), lambda w, hc, i: (i * nW + w, hc, 0, 0),
        memory_space=pltpu.VMEM,
    )

    def kernel(q_ref, k_ref, v_ref, bias_ref, scale_ref, out_ref):
        hc0 = pl.program_id(1) * Hc
        for h in range(Hc):  # static unroll over the head chunk
            qh = q_ref[0, h].astype(jnp.float32)
            kh = k_ref[0, h].astype(jnp.float32)
            vh = v_ref[0, h]
            bh = bias_ref[0, h].astype(jnp.float32)
            scale = scale_ref[hc0 + h, 0]

            qn = qh * jax.lax.rsqrt(jnp.sum(qh * qh, axis=-1, keepdims=True) + 1e-24)
            kn = kh * jax.lax.rsqrt(jnp.sum(kh * kh, axis=-1, keepdims=True) + 1e-24)
            s = jax.lax.dot_general(
                qn, kn, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            s = s * scale + bh
            s = s - jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            out = jnp.dot(
                p.astype(vh.dtype), vh, preferred_element_type=jnp.float32
            )
            out_ref[0, h] = out.astype(out_ref.dtype)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[qkv_spec, qkv_spec, qkv_spec, bias_spec, scale_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((B_, H, L, hd), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B_ * H * L * (L * hd * 2 + L),
            bytes_accessed=B_ * H * L * hd * 3 * q.dtype.itemsize
            + nW * H * L * L * 4,
            transcendentals=B_ * H * L * L,
        ),
    )(q, k, v, bias, scale2d)


def xla_window_attention(q, k, v, bias, logit_scale):
    """Reference XLA path with identical semantics (used on CPU / fallback)."""
    nW = bias.shape[0]
    B_, H, L, hd = q.shape
    qf, kf, vf = (t.astype(jnp.float32) for t in (q, k, v))
    qn = qf * jax.lax.rsqrt(jnp.sum(qf * qf, axis=-1, keepdims=True) + 1e-24)
    kn = kf * jax.lax.rsqrt(jnp.sum(kf * kf, axis=-1, keepdims=True) + 1e-24)
    s = jnp.einsum("bhld,bhsd->bhls", qn, kn) * logit_scale[None, :, None, None]
    s = s.reshape(B_ // nW, nW, H, L, L) + bias[None]
    s = s.reshape(B_, H, L, L)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhls,bhsd->bhld", p, vf).astype(q.dtype)
