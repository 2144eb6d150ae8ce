"""Fused whole-SwinV2-block Pallas TPU kernel.

One kernel invocation computes an entire SwinV2 block (the hot ~90% of the
backbone, ref `cs_vit/net/ti_poser.py:426` via HF `modeling_swinv2.py`):

    qkv GEMM -> cosine window attention (+CPB bias, +shift mask)
    -> proj GEMM -> x + LN(.) -> MLP (GEMM, exact GELU, GEMM) -> x + LN(.)

per window-row slab, with every weight matrix VMEM-resident across the whole
grid (constant index maps) and every intermediate living in VMEM/registers.
Round-1 profiling (BASELINE.md) showed ~3 ms/block of memory-bound elementwise
work (LayerNorms, residual adds, window partition transposes) on the 134 MB
stage-0 activation tensor at batch 64 — this kernel removes all of it: the
activation is read from HBM once and written once per block.

Shifted windows: the caller rolls the input (cheap relative to the fusion win;
`x + unroll(f(roll(x))) == unroll(roll(x) + f(roll(x)))` because unroll is a
permutation, so the whole block — both residuals included — is computed in
rolled coordinates and un-rolled once at the end).

Grid: (B, nH) — one program per (image, window-row). Window/MLP loops inside
are static Python unrolls (nW <= 4 for Swin-B/256). Stage 3 (C=1024) is NOT
served by this kernel: its weights are 24 MB bf16 > VMEM; it stays on XLA.

Training: the kernel is differentiable via ``jax.custom_vjp`` — the forward
runs the Pallas kernel (saving only its inputs), the backward recomputes the
block with plain XLA ops and differentiates those (rematerialization; same
policy the XLA path uses under ``remat=True``). Stochastic depth is supported
in-kernel through per-image droppath keep-masks scaling the two residual
branches.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _erf(x):
    """Abramowitz-Stegun 7.1.26 rational erf (|err| <= 1.5e-7 — f32-exact).

    Pallas TPU has no erf/erfc lowering, so the exact-erf GELU the XLA path
    uses (HF SwinV2 `gelu`) is computed from this approximation in-kernel.
    """
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = (
        (((1.061405429 * t - 1.453152027) * t + 1.421413741) * t - 0.284496736)
        * t + 0.254829592
    )
    return s * (1.0 - poly * t * jnp.exp(-ax * ax))


def _gelu_exact(x):
    return 0.5 * x * (1.0 + _erf(x * 0.7071067811865476))


def _block_kernel(
    x_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
    ln1s_ref, ln1b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
    ln2s_ref, ln2b_ref, relb_ref, scale_ref, dp_ref, mask_ref, out_ref,
    *, ws: int, nW: int, heads: int, eps: float,
):
    """One (image, window-row) slab: x_ref/out_ref are [1, ws, W, C]."""
    C = x_ref.shape[-1]
    hd = C // heads
    L = ws * ws
    dt = x_ref.dtype

    scale_all = scale_ref[:].astype(jnp.float32)      # [heads, 1]
    wqkv = wqkv_ref[:]
    bqkv = bqkv_ref[:].astype(jnp.float32)
    wproj = wproj_ref[:]
    w1 = w1_ref[:]
    w2 = w2_ref[:]
    b = pl.program_id(0)
    dp0 = dp_ref[b, 0].astype(jnp.float32)            # droppath keep scales
    dp1 = dp_ref[b, 1].astype(jnp.float32)

    def layernorm(xf, s_ref, b_ref):
        # float32 fast-variance statistics (matches flax / LayerNormParams)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.maximum(jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean, 0.0)
        y = (xf - mean) * jax.lax.rsqrt(var + eps)
        return y * s_ref[:].astype(jnp.float32) + b_ref[:].astype(jnp.float32)

    for j in range(nW):
        win_x = x_ref[0, :, j * ws:(j + 1) * ws, :].reshape(L, C)

        qkv = jax.lax.dot_general(
            win_x, wqkv, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bqkv                                           # [L, 3C] f32
        qkv = qkv.astype(dt)

        o_parts = []
        for h in range(heads):
            q = qkv[:, h * hd:(h + 1) * hd].astype(jnp.float32)
            k = qkv[:, C + h * hd:C + (h + 1) * hd].astype(jnp.float32)
            v = qkv[:, 2 * C + h * hd:2 * C + (h + 1) * hd]

            qn = q * jax.lax.rsqrt(jnp.sum(q * q, axis=-1, keepdims=True) + 1e-24)
            kn = k * jax.lax.rsqrt(jnp.sum(k * k, axis=-1, keepdims=True) + 1e-24)
            # normalize in f32, score dot in the compute dtype (f32 MXU passes
            # are ~4x slower; the XLA parity path runs this einsum in bf16 too)
            s = jax.lax.dot_general(
                qn.astype(dt), kn.astype(dt), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            s = s * scale_all[h, 0] + relb_ref[h].astype(jnp.float32)
            if mask_ref is not None:
                s = s + mask_ref[j].astype(jnp.float32)
            s = s - jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            o_parts.append(jax.lax.dot_general(
                p.astype(dt), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dt))                                 # [L, hd]
        # one K=C proj GEMM (full MXU depth) instead of per-head K=hd dots
        o_all = jnp.concatenate(o_parts, axis=1)          # [L, C]
        attn_out = jax.lax.dot_general(
            o_all, wproj, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bproj_ref[:].astype(jnp.float32)              # [L, C] f32

        h1 = win_x.astype(jnp.float32) + dp0 * layernorm(attn_out, ln1s_ref, ln1b_ref)

        m = jax.lax.dot_general(
            h1.astype(dt), w1, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b1_ref[:].astype(jnp.float32)
        m = _gelu_exact(m)
        m = jax.lax.dot_general(
            m.astype(dt), w2, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b2_ref[:].astype(jnp.float32)

        y = h1 + dp1 * layernorm(m, ln2s_ref, ln2b_ref)
        out_ref[0, :, j * ws:(j + 1) * ws, :] = y.astype(dt).reshape(ws, ws, C)


def _pallas_forward(
    x, wqkv, bqkv, wproj, bproj, ln1_scale, ln1_bias, w1, b1, w2, b2,
    ln2_scale, ln2_bias, rel_bias, logit_scale, dp, mask=None,
    *, window_size: int, num_heads: int, eps: float, interpret: bool,
):
    B, H, W, C = x.shape
    ws = window_size
    nH, nW = H // ws, W // ws
    L = ws * ws
    Ch = w1.shape[1]

    grid = (B, nH)

    def full(arr):
        nd = arr.ndim
        return pl.BlockSpec(
            arr.shape, lambda b, i, _n=nd: (0,) * _n, memory_space=pltpu.VMEM
        )

    x_spec = pl.BlockSpec((1, ws, W, C), lambda b, i: (b, i, 0, 0), memory_space=pltpu.VMEM)
    in_specs = [
        x_spec,
        full(wqkv), full(bqkv), full(wproj), full(bproj),
        full(ln1_scale), full(ln1_bias), full(w1), full(b1),
        full(w2), full(b2), full(ln2_scale), full(ln2_bias),
        full(rel_bias),
        pl.BlockSpec((num_heads, 1), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
        # per-image droppath keep-scales: whole [B,2] array in SMEM (blocked
        # sub-(8,128) shapes are rejected), indexed by program_id in-kernel
        pl.BlockSpec((B, 2), lambda b, i: (0, 0), memory_space=pltpu.SMEM),
    ]
    operands = [
        x, wqkv, bqkv, wproj, bproj, ln1_scale, ln1_bias,
        w1, b1, w2, b2, ln2_scale, ln2_bias,
        rel_bias, logit_scale.reshape(num_heads, 1).astype(jnp.float32),
        dp.astype(jnp.float32),
    ]
    if mask is not None:
        in_specs.append(
            pl.BlockSpec((nW, L, L), lambda b, i: (i, 0, 0), memory_space=pltpu.VMEM)
        )
        operands.append(mask)
        kernel = functools.partial(
            _block_kernel, ws=ws, nW=nW, heads=num_heads, eps=eps
        )
    else:
        def kernel(*refs):
            *ins, out_ref = refs
            _block_kernel(
                *ins, None, out_ref, ws=ws, nW=nW, heads=num_heads, eps=eps
            )

    # FLOPs: qkv+proj 8*L*C*C, attn 4*L*L*C, mlp 4*L*C*Ch per window
    flops_per_win = 8 * L * C * C + 4 * L * L * C + 4 * L * C * Ch
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
        # Stage-2 f32 instances need ~24 MB of scoped VMEM (weights + CPB
        # bias + stack) — above the 16 MB compiler default, well under the
        # 128 MB/core physical VMEM of v5e/v5p.
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 2**20,
        ),
        cost_estimate=pl.CostEstimate(
            flops=B * nH * nW * flops_per_win,
            bytes_accessed=2 * x.size * x.dtype.itemsize
            + (wqkv.size + wproj.size + w1.size + w2.size) * wqkv.dtype.itemsize,
            transcendentals=B * nH * nW * (L * L + L * Ch),
        ),
    )(*operands)


def _block_reference(
    x, wqkv, bqkv, wproj, bproj, ln1_scale, ln1_bias, w1, b1, w2, b2,
    ln2_scale, ln2_bias, rel_bias, logit_scale, dp, mask=None,
    *, window_size: int, num_heads: int, eps: float,
):
    """Plain-XLA mirror of the kernel math (same dtypes/accumulation order up
    to reassociation). Used by the custom_vjp backward: gradients of this
    function are the gradients of the fused block, with the forward
    rematerialized by XLA instead of stored."""
    B, H, W, C = x.shape
    ws = window_size
    heads = num_heads
    nH, nW = H // ws, W // ws
    L = ws * ws
    hd = C // heads
    dt = x.dtype
    f32 = jnp.float32

    def layernorm(xf, s, b):
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.maximum(jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean, 0.0)
        return (xf - mean) * jax.lax.rsqrt(var + eps) * s.astype(f32) + b.astype(f32)

    win = x.reshape(B, nH, ws, nW, ws, C).transpose(0, 1, 3, 2, 4, 5)
    win = win.reshape(B * nH * nW, L, C)                       # [B_, L, C]

    qkv = (
        jnp.einsum("blc,cd->bld", win, wqkv, preferred_element_type=f32)
        + bqkv.astype(f32)
    ).astype(dt)
    q, k, v = (
        qkv[..., :C], qkv[..., C:2 * C], qkv[..., 2 * C:],
    )
    reshape_h = lambda t: t.reshape(-1, L, heads, hd).transpose(0, 2, 1, 3)  # noqa: E731
    q, k, v = reshape_h(q).astype(f32), reshape_h(k).astype(f32), reshape_h(v)

    qn = q * jax.lax.rsqrt(jnp.sum(q * q, axis=-1, keepdims=True) + 1e-24)
    kn = k * jax.lax.rsqrt(jnp.sum(k * k, axis=-1, keepdims=True) + 1e-24)
    s = jnp.einsum(
        "bhld,bhsd->bhls", qn.astype(dt), kn.astype(dt),
        preferred_element_type=f32,
    )
    s = s * logit_scale.reshape(1, heads, 1, 1).astype(f32) + rel_bias[None].astype(f32)
    if mask is not None:
        # mask: [nH*nW, L, L] over the image's window grid (row-major)
        s = s.reshape(B, nH * nW, heads, L, L) + mask[None, :, None].astype(f32)
        s = s.reshape(-1, heads, L, L)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum(
        "bhls,bhsd->bhld", p.astype(dt), v, preferred_element_type=f32
    ).astype(dt)
    o = o.transpose(0, 2, 1, 3).reshape(-1, L, C)
    attn_out = (
        jnp.einsum("blc,cd->bld", o, wproj, preferred_element_type=f32)
        + bproj.astype(f32)
    )

    dp0 = jnp.repeat(dp[:, 0], nH * nW).reshape(-1, 1, 1).astype(f32)
    dp1 = jnp.repeat(dp[:, 1], nH * nW).reshape(-1, 1, 1).astype(f32)

    h1 = win.astype(f32) + dp0 * layernorm(attn_out, ln1_scale, ln1_bias)
    m = (
        jnp.einsum("blc,cd->bld", h1.astype(dt), w1, preferred_element_type=f32)
        + b1.astype(f32)
    )
    m = jax.nn.gelu(m, approximate=False)
    m = (
        jnp.einsum("blc,cd->bld", m.astype(dt), w2, preferred_element_type=f32)
        + b2.astype(f32)
    )
    y = (h1 + dp1 * layernorm(m, ln2_scale, ln2_bias)).astype(dt)

    y = y.reshape(B, nH, nW, ws, ws, C).transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(B, H, W, C)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused_block_ad(static, *args):
    window_size, num_heads, eps, interpret = static
    return _pallas_forward(
        *args, window_size=window_size, num_heads=num_heads, eps=eps,
        interpret=interpret,
    )


def _fused_block_fwd(static, *args):
    return _fused_block_ad(static, *args), args


def _fused_block_bwd(static, residuals, g):
    window_size, num_heads, eps, _ = static
    ref = functools.partial(
        _block_reference, window_size=window_size, num_heads=num_heads, eps=eps
    )
    _, vjp = jax.vjp(ref, *residuals)
    return vjp(g)


_fused_block_ad.defvjp(_fused_block_fwd, _fused_block_bwd)


@functools.partial(
    jax.jit,
    static_argnames=("window_size", "num_heads", "eps", "interpret"),
)
def fused_swin_block(
    x: jnp.ndarray,          # [B, H, W, C] (pre-rolled when shifted)
    wqkv: jnp.ndarray,       # [C, 3C]   (query | key | value kernels)
    bqkv: jnp.ndarray,       # [3C]      (key slice zero: no key bias in SwinV2)
    wproj: jnp.ndarray,      # [C, C]
    bproj: jnp.ndarray,      # [C]
    ln1_scale: jnp.ndarray, ln1_bias: jnp.ndarray,   # [C]
    w1: jnp.ndarray, b1: jnp.ndarray,                # [C, Ch], [Ch]
    w2: jnp.ndarray, b2: jnp.ndarray,                # [Ch, C], [C]
    ln2_scale: jnp.ndarray, ln2_bias: jnp.ndarray,   # [C]
    rel_bias: jnp.ndarray,   # [heads, L, L]  16*sigmoid(CPB), pre-computed
    logit_scale: jnp.ndarray,  # [heads]      exp(clamp(., ln 100)), pre-computed
    mask: Optional[jnp.ndarray] = None,  # [nH*nW, L, L] additive shift mask
    droppath_keep: Optional[jnp.ndarray] = None,  # [B, 2] residual scales
    *,
    window_size: int,
    num_heads: int,
    eps: float = 1e-5,
    interpret: bool = False,
) -> jnp.ndarray:
    if droppath_keep is None:
        droppath_keep = jnp.ones((x.shape[0], 2), jnp.float32)
    args = (
        x, wqkv, bqkv, wproj, bproj, ln1_scale, ln1_bias,
        w1, b1, w2, b2, ln2_scale, ln2_bias,
        rel_bias, logit_scale, droppath_keep,
    )
    if mask is not None:
        args = args + (mask,)
    return _fused_block_ad((window_size, num_heads, eps, interpret), *args)
