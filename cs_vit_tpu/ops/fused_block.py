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

Shifted windows: the roll happens IN-KERNEL (``shift=sh``).  Each program
takes the whole image (RR = nH), rolls the x slab in VMEM (two static
concat-rolls of ~1 MB), computes the block in rolled coordinates — valid
because `x + unroll(f(roll(x))) == unroll(roll(x) + f(roll(x)))`, unroll
being a permutation — and un-rolls the output slab before the store.  This
replaces the two whole-tensor HBM ``jnp.roll`` passes the caller used to do
(~2 ms at batch 256 across the stage-0/1 shifted blocks).  The backward
keeps the roll-outside formulation: the vjp rule rolls x and the cotangent,
runs the unshifted backward, and un-rolls dx (bitwise-identical math).

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
import os

# Profiling ablation knob (tools/profile_stages.py): "" | "noexp" | "noattn".
# "noexp" replaces the softmax exp with an affine map (same pass structure);
# "noattn" short-circuits attention to v (GEMM/LN path only). Both break
# numerics -- measurement only.
_VARIANT = os.environ.get("FUSED_BLOCK_VARIANT", "")
# Opt-in: run the fwd kernel's [gs*L, L] score/softmax passes in the compute
# dtype instead of f32 for 16-bit compute. Measured error budget (round 3,
# tests/test_fused_block.py::test_fused_block_bf16_softmax_budget): ~2.9x the
# bf16 noise floor of the surrounding GEMMs (max ~3.4% of output scale at
# init-scale logits, growing with the learned logit scale toward its 100
# clamp) because the static-shift moves logits to large magnitudes where
# bf16's relative rounding is a large absolute exponent error. Off by
# default to preserve checkpoint-inference fidelity; flip on for pure
# throughput (TPU A/B in BASELINE.md round 3).
_BF16_SOFTMAX = bool(int(os.environ.get("FUSED_BLOCK_BF16_SOFTMAX", "0") or 0))


def _env_int(name: str, default: int) -> int:
    """Parse an int env knob without crashing every import on a bad value."""
    raw = os.environ.get(name)
    if raw is None or raw.strip() == "":
        return default
    try:
        return int(raw)
    except ValueError as e:
        raise ValueError(
            f"{name} must be an integer, got {raw!r}"
        ) from e
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# Scoped-VMEM budgets handed to Mosaic (v5e/v5p have 128 MB/core). Module
# globals (not literals at the call sites) so tools/vmem_gate.py can compile
# every production geometry at a TIGHTENED limit and fail BEFORE the driver's
# bench does when a kernel change pushes the compiled footprint over the
# cliff (round 3: a dt-slab change OOM'd stage-2 bwd by 764 KB at bench time).
_FWD_VMEM_LIMIT = 100 * 2**20
_BWD_VMEM_LIMIT = 127 * 2**20


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


def _interleave_idx(C: int, hd: int, gs: int):
    """Lane permutation putting heads in interleaved layout.

    Within each group's ``GG = gs*hd`` lane segment, new lane ``d*gs + h``
    holds old lane ``h*hd + d`` — i.e. lane ``i`` belongs to head
    ``i % gs``.  Per-head segment sums then become ``log2(hd)`` full-width
    lane-roll+add steps (a stride-``gs`` walk stays inside one residue
    class = one head), with the result already broadcast across the head's
    lanes — no masked cross-lane reductions (the round-2 ablations in
    BASELINE.md attribute ~0.35-0.45 ms/blk to those).
    """
    assert hd & (hd - 1) == 0, "roll-based segment sums need power-of-2 hd"
    GG = gs * hd
    idx = np.arange(C).reshape(C // GG, gs, hd)
    return np.ascontiguousarray(idx.transpose(0, 2, 1)).reshape(C)


def _seg_rsqrt_interleaved(s2, gs: int, hd: int):
    """rsqrt of per-head lane-segment sums, interleaved layout.

    ``s2`` is [rows, GG] with lane ``i`` of head ``i % gs``; returns the
    per-(row, head) ``rsqrt(sum + eps)`` broadcast to every lane of the
    head.  ``hd`` must be a power of two (true for every SwinV2 size).
    """
    t = s2
    sh = gs
    while sh < gs * hd:
        t = t + pltpu.roll(t, sh, 1)
        sh *= 2
    return jax.lax.rsqrt(t + 1e-24)


def _roll2d(img, shift: int):
    """In-VMEM roll to shifted-window coordinates (static concat-of-slices;
    the program holds the whole image so the wrap is local)."""
    img = jnp.concatenate([img[shift:], img[:shift]], 0)
    return jnp.concatenate([img[:, shift:], img[:, :shift]], 1)


def _unroll2d(img, shift: int):
    """Inverse of :func:`_roll2d`."""
    img = jnp.concatenate([img[-shift:], img[:-shift]], 0)
    return jnp.concatenate([img[:, -shift:], img[:, :-shift]], 1)


def _block_kernel(
    x_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
    ln1s_ref, ln1b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
    ln2s_ref, ln2b_ref, relb_ref, scale_ref, dp_ref, mask_ref,
    out_ref, attn_ref,
    *, ws: int, Wb: int, RR: int, nWj: int, gs: int, heads: int,
    eps: float, single: bool, shift: int = 0,
):
    """One slab of RR*nWj windows.

    Layouts (dt = compute dtype, f32 accumulation on every dot):
      x_ref/out_ref  [1, RR*ws, Wb, C] (window-rows of one image)  — or, for
                     single-window stages, [RR, ws, Wb, C] (RR whole images);
                     both flatten to the same [S_tok, C] token slab.
      relb_ref       [G, gs*L, L]   heads of a group stacked along rows
      scale_ref      [G, 1, gs*hd]  per-head logit scale broadcast over its
                     hd-column segment (folded into q before the score dot)
      attn_ref       VMEM scratch [RR*ws, Wb, C] for the attention outputs so
                     proj/MLP run as single slab-wide GEMMs.

    Attention runs per window with gs heads packed per dot: queries of the
    group's heads are stacked along rows with block-diagonal masking
    ([gs*L, gs*hd]), so one MXU pass computes all gs heads' scores at full
    K = gs*hd = 128 depth — identical padded-pass count to per-head K=hd dots,
    but with lane-aligned slices and gs-fold fewer op launches.
    """
    C = x_ref.shape[-1]
    hd = C // heads
    G = heads // gs
    GG = gs * hd
    L = ws * ws
    S_tok = RR * ws * Wb
    dt = x_ref.dtype
    f32 = jnp.float32

    b = pl.program_id(0)

    def layernorm(xf, s_ref, b_ref):
        # float32 fast-variance statistics (matches flax / LayerNormParams)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.maximum(jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean, 0.0)
        y = (xf - mean) * jax.lax.rsqrt(var + eps)
        return y * s_ref[:].astype(f32) + b_ref[:].astype(f32)

    if shift:
        # roll to shifted-window coordinates in VMEM (RR == nH, Wb == W
        # because the program holds the full image) — no HBM traffic.
        xs = _roll2d(x_ref[:].reshape(RR * ws, Wb, C), shift).reshape(S_tok, C)
    else:
        xs = x_ref[:].reshape(S_tok, C)

    for _rep in range(2 if _VARIANT == "x2" else 1):
        xs = _block_body(
            xs, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref, ln1s_ref, ln1b_ref,
            w1_ref, b1_ref, w2_ref, b2_ref, ln2s_ref, ln2b_ref, relb_ref,
            scale_ref, dp_ref, mask_ref, attn_ref, layernorm,
            ws=ws, Wb=Wb, RR=RR, nWj=nWj, gs=gs, heads=heads, single=single,
            b=b, S_tok=S_tok, C=C, hd=hd, G=G, GG=GG, L=L, dt=dt,
        )
    if shift:
        y = _unroll2d(xs.astype(dt).reshape(RR * ws, Wb, C), shift)
        out_ref[:] = y.reshape(x_ref.shape)
    else:
        out_ref[:] = xs.astype(dt).reshape(x_ref.shape)


def _block_body(
    xs, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref, ln1s_ref, ln1b_ref,
    w1_ref, b1_ref, w2_ref, b2_ref, ln2s_ref, ln2b_ref, relb_ref,
    scale_ref, dp_ref, mask_ref, attn_ref, layernorm,
    *, ws, Wb, RR, nWj, gs, heads, single, b, S_tok, C, hd, G, GG, L, dt,
):
    f32 = jnp.float32

    # slab-wide qkv GEMM: all windows of the slab in one [S_tok, 3C] dot
    qkv = (
        jax.lax.dot_general(
            xs, wqkv_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )
        + bqkv_ref[:].astype(f32)
    ).astype(dt)
    qkv3 = qkv.reshape(RR * ws, Wb, 3 * C)

    # interleaved head-lane layout: lane i belongs to head i % gs (the
    # wrapper permutes qkv columns / proj rows to match)
    cidx = jax.lax.broadcasted_iota(jnp.int32, (L, GG), 1) % gs
    ridx = jax.lax.broadcasted_iota(jnp.int32, (gs * L, GG), 0) // L
    cidx2 = jax.lax.broadcasted_iota(jnp.int32, (gs * L, GG), 1) % gs
    ones_dt = jnp.ones((L, GG), dt)  # MXU softmax-denominator operand
    # low-precision score dtype: for 16-bit compute the [gs*L, L] score/
    # softmax passes (the kernel's VPU bottleneck — BASELINE.md "Forward-
    # kernel anatomy") run in dt instead of f32, halving their VMEM traffic.
    # Error budget: the static-shift softmax keeps every exponent <= 0; a
    # bf16 score rounds s by <= 2^-9 relative, so a weight e^s moves by
    # <= |s|*2^-9 relative — the dominant (near-0) logits are near-exact and
    # tiny logits carry no mass. Measured end-to-end (tests/test_fused_block
    # ::test_fused_block_bf16_softmax_budget + BASELINE.md round 3): within
    # the bf16 noise the e@v dot already had. f32 compute is unchanged.
    st = (dt if jnp.dtype(dt).itemsize <= 2 and not _VARIANT
          and _BF16_SOFTMAX else f32)

    for r in range(RR):
        for j in range(nWj):
            qkv_w = qkv3[
                r * ws:(r + 1) * ws, j * ws:(j + 1) * ws, :
            ].reshape(L, 3 * C)
            o_groups = []
            if _VARIANT == "noattn":
                for g in range(G):
                    o_groups.append(qkv_w[:, 2 * C + g * GG:2 * C + (g + 1) * GG])
            for g in range(G if _VARIANT != "noattn" else 0):
                q4 = qkv_w[:, g * GG:(g + 1) * GG].astype(f32)
                k4 = qkv_w[:, C + g * GG:C + (g + 1) * GG].astype(f32)
                v4 = qkv_w[:, 2 * C + g * GG:2 * C + (g + 1) * GG]
                if _VARIANT == "nonorm":
                    # measurement-only: skip the cosine normalization
                    qn = (q4 * scale_ref[g].astype(f32) * 0.01).astype(dt)
                    kn = (k4 * 0.01).astype(dt)
                else:
                    # per-head cosine normalization via roll-based segment
                    # sums over the interleaved lane layout (already
                    # broadcast per lane — no masked reductions)
                    rq = _seg_rsqrt_interleaved(q4 * q4, gs, hd)  # [L, GG]
                    rk = _seg_rsqrt_interleaved(k4 * k4, gs, hd)
                    # logit scale folded into q (scale_h * (qn @ kn^T) == (qn*scale_h) @ kn^T)
                    qn = (q4 * rq * scale_ref[g].astype(f32)).astype(dt)
                    kn = (k4 * rk).astype(dt)
                # heads stacked along rows, block-diagonal over column segments
                qbd = jnp.broadcast_to(qn[None], (gs, L, GG)).reshape(gs * L, GG)
                qbd = jnp.where(ridx == cidx2, qbd, jnp.zeros((), dt))
                # Mosaic requires an f32 matmul accumulator (a bf16
                # preferred_element_type fails to lower: "tpu.matmul ...
                # vector<...xbf16>"); accumulate f32 and round once to st —
                # the downstream bias/mask/exp passes still run at 16-bit
                # width, which is where the VPU traffic lives.
                s = jax.lax.dot_general(
                    qbd, kn, (((1,), (1,)), ((), ())),
                    preferred_element_type=f32,
                ).astype(st)                               # [gs*L, L]
                # Static-shift softmax: relb_ref arrives pre-shifted by the
                # per-head logit bound tau_h = scale_h + 16 (cosine scores
                # satisfy s <= scale_h, the CPB bias is 16*sigmoid < 16, and
                # the shift mask only lowers), so every exponent is <= 0 and
                # the row-max reduce pass is dropped — softmax is shift-
                # invariant, the result is bit-comparable to max-subtraction
                # up to one rounding. A row can only lose mass to underflow
                # if ALL its logits sit > 88 below the bound (needs a learned
                # scale near the 100 clamp AND every cosine far from 1);
                # the +1e-30 keeps that case finite (output ~0, not NaN).
                s = s + relb_ref[g].astype(st)
                if mask_ref is not None:
                    s = (
                        s.reshape(gs, L, L)
                        + mask_ref[r * nWj + j][None].astype(st)
                    ).reshape(gs * L, L)
                if _VARIANT == "noexp":
                    e = (s * 0.01 + 1.0).astype(dt)
                elif _VARIANT == "nosm":
                    # measurement-only: no softmax at all (raw scores -> o)
                    e = (s * 0.01).astype(dt)
                else:
                    # exp straight to the dot dtype: the o-dot consumed a dt
                    # cast of e anyway, so the rounding is unchanged — this
                    # just skips materializing the f32 copy
                    e = jnp.exp(s).astype(dt)
                if _VARIANT != "nosm":
                    # softmax denominator on the MXU: e @ ones gives every
                    # row's sum pre-broadcast across the GG lanes (f32
                    # accumulation), replacing a VPU cross-lane reduce over
                    # the [gs*L, L] scores
                    den = jax.lax.dot_general(
                        e, ones_dt, (((1,), (0,)), ((), ())),
                        preferred_element_type=f32,
                    ) + 1e-30                              # [gs*L, GG]
                o = jax.lax.dot_general(
                    e, v4, (((1,), (0,)), ((), ())),
                    preferred_element_type=f32,
                )                                          # [gs*L, GG]
                # block-diagonal extraction with the softmax division deferred
                # to the [L, hd] output (saves a full [L, L] divide per head)
                og = jnp.zeros((L, GG), f32)
                for h in range(gs):
                    blk = o[h * L:(h + 1) * L]
                    if _VARIANT != "nosm":
                        blk = blk / den[h * L:(h + 1) * L]
                    og = og + jnp.where(cidx == h, blk, 0.0)
                o_groups.append(og.astype(dt))
            o_all = o_groups[0] if G == 1 else jnp.concatenate(o_groups, -1)
            attn_ref[r * ws:(r + 1) * ws, j * ws:(j + 1) * ws, :] = (
                o_all.reshape(ws, ws, C)
            )

    # slab-wide proj + MLP GEMMs
    a = attn_ref[:].reshape(S_tok, C)
    proj = jax.lax.dot_general(
        a, wproj_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    ) + bproj_ref[:].astype(f32)

    if single:
        # slab spans RR images: per-image droppath scales as [S_tok, 1] column
        dp0 = jnp.concatenate(
            [jnp.full((ws * Wb, 1), dp_ref[b * RR + r, 0], f32) for r in range(RR)]
        )
        dp1 = jnp.concatenate(
            [jnp.full((ws * Wb, 1), dp_ref[b * RR + r, 1], f32) for r in range(RR)]
        )
    else:
        dp0 = dp_ref[b, 0].astype(f32)
        dp1 = dp_ref[b, 1].astype(f32)

    h1 = xs.astype(f32) + dp0 * layernorm(proj, ln1s_ref, ln1b_ref)

    m = jax.lax.dot_general(
        h1.astype(dt), w1_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    ) + b1_ref[:].astype(f32)
    m = _gelu_exact(m)
    m = jax.lax.dot_general(
        m.astype(dt), w2_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    ) + b2_ref[:].astype(f32)

    return (h1 + dp1 * layernorm(m, ln2s_ref, ln2b_ref)).astype(dt)


def _gelu_grad(x):
    """d/dx of exact-erf GELU: Phi(x) + x * phi(x)."""
    phi = jnp.exp(-0.5 * x * x) * 0.3989422804014327  # 1/sqrt(2*pi)
    return 0.5 * (1.0 + _erf(x * 0.7071067811865476)) + x * phi


def _largest_divisor_leq(n: int, cap: int) -> int:
    d = max(1, min(n, cap))
    while n % d:
        d -= 1
    return d


def _bwd_kernel(
    g_ref, x_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
    ln1s_ref, ln1b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
    ln2s_ref, ln2b_ref, relb_ref, scale_ref, dp_ref, mask_ref,
    # outputs
    dx_ref, dwqkv_ref, dbqkv_ref, dwproj_ref, dbproj_ref,
    dln1s_ref, dln1b_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
    dln2s_ref, dln2b_ref, drb_ref, dscale_ref,
    # scratch
    qkv_s, p_s, attn_s, proj_s, h1_s, m1_s, mg_s, m2_s, qkvb_s,
    *, ws: int, Wb: int, RR: int, nWj: int, gs: int, heads: int,
    eps: float, single: bool, shift: int = 0,
):
    """Backward of the fused block: recompute the forward slab in VMEM, then
    backprop through it, accumulating weight grads across the whole grid in
    f32 output blocks (constant index maps + arbitrary grid semantics).

    Shifted blocks roll x and the cotangent into shifted-window coordinates
    in VMEM and un-roll dx before the store (mirrors the forward kernel; the
    weight gradients are roll-invariant because a roll only permutes the
    token rows the outer products sum over). This removes the three
    whole-tensor HBM roll passes the vjp wrapper used to do.
    """
    C = x_ref.shape[-1]
    hd = C // heads
    G = heads // gs
    GG = gs * hd
    L = ws * ws
    S_tok = RR * ws * Wb
    dt = x_ref.dtype
    f32 = jnp.float32

    b = pl.program_id(0)
    first = jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0)

    @pl.when(first)
    def _zero_accums():
        for ref in (
            dwqkv_ref, dbqkv_ref, dwproj_ref, dbproj_ref,
            dln1s_ref, dln1b_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
            dln2s_ref, dln2b_ref, drb_ref, dscale_ref,
        ):
            ref[...] = jnp.zeros(ref.shape, ref.dtype)

    def ln_stats(xf):
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.maximum(jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean, 0.0)
        r = jax.lax.rsqrt(var + eps)
        return (xf - mean) * r, r

    # interleaved head-lane layout (see _interleave_idx): lane i <-> head i%gs
    cidx = jax.lax.broadcasted_iota(jnp.int32, (L, GG), 1) % gs
    ridx = jax.lax.broadcasted_iota(jnp.int32, (gs * L, GG), 0) // L
    cidx2 = jax.lax.broadcasted_iota(jnp.int32, (gs * L, GG), 1) % gs
    bd = ridx == cidx2
    ones_dt = jnp.ones((L, GG), dt)  # MXU softmax-denominator operand

    # ---- forward recompute (slab in VMEM), saving what the bwd needs ----
    if shift:
        xs = _roll2d(x_ref[:].reshape(RR * ws, Wb, C), shift).reshape(S_tok, C)
    else:
        xs = x_ref[:].reshape(S_tok, C)
    qkv_s[...] = (
        jax.lax.dot_general(
            xs, wqkv_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )
        + bqkv_ref[:].astype(f32)
    ).astype(dt).reshape(qkv_s.shape)
    qkv3 = qkv_s[...].reshape(RR * ws, Wb, 3 * C)

    def win_qkv(r, j):
        return qkv3[r * ws:(r + 1) * ws, j * ws:(j + 1) * ws, :].reshape(L, 3 * C)

    def group_qkn(qkv_w, g):
        """Recompute the group's normalized q-hat (scale folded), kn, v, and
        the norm factors needed for the normalize backward."""
        q4 = qkv_w[:, g * GG:(g + 1) * GG].astype(f32)
        k4 = qkv_w[:, C + g * GG:C + (g + 1) * GG].astype(f32)
        v4 = qkv_w[:, 2 * C + g * GG:2 * C + (g + 1) * GG]
        rq = _seg_rsqrt_interleaved(q4 * q4, gs, hd)   # [L, GG]
        rk = _seg_rsqrt_interleaved(k4 * k4, gs, hd)
        lam = scale_ref[g].astype(f32)             # [1, GG]
        qh = q4 * rq * lam                         # q-hat (scale folded) f32
        kn = k4 * rk
        return q4, k4, v4, rq, rk, lam, qh, kn

    for r in range(RR):
        for j in range(nWj):
            qkv_w = win_qkv(r, j)
            o_groups = []
            for g in range(G):
                _, _, v4, _, _, _, qh, kn = group_qkn(qkv_w, g)
                qbd = jnp.broadcast_to(
                    qh.astype(dt)[None], (gs, L, GG)
                ).reshape(gs * L, GG)
                qbd = jnp.where(bd, qbd, jnp.zeros((), dt))
                s = jax.lax.dot_general(
                    qbd, kn.astype(dt), (((1,), (1,)), ((), ())),
                    preferred_element_type=f32,
                ) + relb_ref[g].astype(f32)
                if mask_ref is not None:
                    s = (
                        s.reshape(gs, L, L)
                        + mask_ref[r * nWj + j][None].astype(f32)
                    ).reshape(gs * L, L)
                # static-shift softmax (see the forward kernel): relb is
                # pre-shifted by tau_h = scale_h + 16, exponents are <= 0.
                # Denominator via MXU ones-dot (matches the forward's
                # rounding: den sums the dt-rounded e), lane 0 sliced out
                # for the row broadcast.
                e = jnp.exp(s)
                den = jax.lax.dot_general(
                    e.astype(dt), ones_dt, (((1,), (0,)), ((), ())),
                    preferred_element_type=f32,
                )[:, :1] + 1e-30
                p = e / den
                wi = (r * nWj + j) * G + g
                p_s[wi] = p.astype(dt)
                o = jax.lax.dot_general(
                    p.astype(dt), v4, (((1,), (0,)), ((), ())),
                    preferred_element_type=f32,
                )
                og = jnp.zeros((L, GG), f32)
                for h in range(gs):
                    og = og + jnp.where(cidx == h, o[h * L:(h + 1) * L], 0.0)
                o_groups.append(og.astype(dt))
            o_all = o_groups[0] if G == 1 else jnp.concatenate(o_groups, -1)
            attn_s[r * ws:(r + 1) * ws, j * ws:(j + 1) * ws, :] = (
                o_all.reshape(ws, ws, C)
            )

    a = attn_s[...].reshape(S_tok, C)
    proj_s[...] = (
        jax.lax.dot_general(
            a, wproj_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )
        + bproj_ref[:].astype(f32)
    ).reshape(proj_s.shape)

    if single:
        dp0 = jnp.concatenate(
            [jnp.full((ws * Wb, 1), dp_ref[b * RR + r, 0], f32) for r in range(RR)]
        )
        dp1 = jnp.concatenate(
            [jnp.full((ws * Wb, 1), dp_ref[b * RR + r, 1], f32) for r in range(RR)]
        )
    else:
        dp0 = dp_ref[b, 0].astype(f32)
        dp1 = dp_ref[b, 1].astype(f32)

    z1, r1 = ln_stats(proj_s[...].reshape(S_tok, C))
    ln1s = ln1s_ref[:].astype(f32)
    h1 = xs.astype(f32) + dp0 * (z1 * ln1s + ln1b_ref[:].astype(f32))
    h1_s[...] = h1.reshape(h1_s.shape)

    m1 = jax.lax.dot_general(
        h1.astype(dt), w1_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    ) + b1_ref[:].astype(f32)
    m1_s[...] = m1.astype(dt).reshape(m1_s.shape)
    mg = _gelu_exact(m1)
    mg_s[...] = mg.astype(dt).reshape(mg_s.shape)
    m2_s[...] = (
        jax.lax.dot_general(
            mg.astype(dt), w2_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )
        + b2_ref[:].astype(f32)
    ).reshape(m2_s.shape)

    # ---- backward ----
    if shift:
        gy = _roll2d(g_ref[:].reshape(RR * ws, Wb, C), shift)
        gy = gy.reshape(S_tok, C).astype(f32)
    else:
        gy = g_ref[:].reshape(S_tok, C).astype(f32)

    # y = h1 + dp1 * (z2*g2 + b2)
    z2, r2 = ln_stats(m2_s[...].reshape(S_tok, C))
    gz2 = gy * dp1
    dln2s_ref[...] += jnp.sum(gz2 * z2, axis=0, keepdims=True)
    dln2b_ref[...] += jnp.sum(gz2, axis=0, keepdims=True)
    zb2 = gz2 * ln2s_ref[:].astype(f32)
    m2b = (
        zb2
        - jnp.mean(zb2, axis=-1, keepdims=True)
        - z2 * jnp.mean(zb2 * z2, axis=-1, keepdims=True)
    ) * r2                                            # [S, C] f32

    # MLP backward
    mg_v = mg_s[...].reshape(S_tok, m1_s.shape[-1])
    dw2_ref[...] += jax.lax.dot_general(
        mg_v, m2b.astype(dt), (((0,), (0,)), ((), ())),
        preferred_element_type=f32,
    )
    db2_ref[...] += jnp.sum(m2b, axis=0, keepdims=True)
    mgb = jax.lax.dot_general(
        m2b.astype(dt), w2_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=f32,
    )
    m1b = mgb * _gelu_grad(m1_s[...].reshape(S_tok, -1).astype(f32))
    h1_v = h1_s[...].reshape(S_tok, C)
    dw1_ref[...] += jax.lax.dot_general(
        h1_v.astype(dt), m1b.astype(dt), (((0,), (0,)), ((), ())),
        preferred_element_type=f32,
    )
    db1_ref[...] += jnp.sum(m1b, axis=0, keepdims=True)
    h1b = gy + jax.lax.dot_general(
        m1b.astype(dt), w1_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=f32,
    )

    # h1 = xs + dp0 * (z1*g1 + b1)
    gz1 = h1b * dp0
    dln1s_ref[...] += jnp.sum(gz1 * z1, axis=0, keepdims=True)
    dln1b_ref[...] += jnp.sum(gz1, axis=0, keepdims=True)
    zb1 = gz1 * ln1s
    projb = (
        zb1
        - jnp.mean(zb1, axis=-1, keepdims=True)
        - z1 * jnp.mean(zb1 * z1, axis=-1, keepdims=True)
    ) * r1

    dwproj_ref[...] += jax.lax.dot_general(
        a, projb.astype(dt), (((0,), (0,)), ((), ())),
        preferred_element_type=f32,
    )
    dbproj_ref[...] += jnp.sum(projb, axis=0, keepdims=True)
    ab = jax.lax.dot_general(
        projb.astype(dt), wproj_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=f32,
    ).astype(dt)                                      # [S, C] attn-out grad
    ab3 = ab.reshape(RR * ws, Wb, C)

    # attention backward per (window, group) -> qkv grad slab
    for r in range(RR):
        for j in range(nWj):
            qkv_w = win_qkv(r, j)
            ow = ab3[
                r * ws:(r + 1) * ws, j * ws:(j + 1) * ws, :
            ].reshape(L, C)
            qbs, kbs, vbs = [], [], []
            for g in range(G):
                q4, k4, v4, rq, rk, lam, qh, kn = group_qkn(qkv_w, g)
                og = ow[:, g * GG:(g + 1) * GG]       # [L, GG] dt
                obd = jnp.broadcast_to(
                    og[None], (gs, L, GG)
                ).reshape(gs * L, GG)
                obd = jnp.where(bd, obd, jnp.zeros((), dt))
                wi = (r * nWj + j) * G + g
                p = p_s[wi]                            # [gs*L, L] dt
                # v-grad: [L, GG] = p^T(stacked) x obd
                vb = jax.lax.dot_general(
                    p, obd, (((0,), (0,)), ((), ())),
                    preferred_element_type=f32,
                )
                # p-grad and softmax jacobian
                pb = jax.lax.dot_general(
                    obd, v4, (((1,), (1,)), ((), ())),
                    preferred_element_type=f32,
                )                                      # [gs*L, L]
                pf = p.astype(f32)
                # rowwise <pb, p> via MXU ones-dot instead of a VPU
                # cross-lane reduce (dt product rounding is within the
                # bf16 noise the surrounding dots already introduce)
                rs = jax.lax.dot_general(
                    (pb * pf).astype(dt), ones_dt, (((1,), (0,)), ((), ())),
                    preferred_element_type=f32,
                )[:, :1]
                sb = pf * (pb - rs)
                drb_ref[g] += sb
                sbd = sb.astype(dt)
                # q-hat grad (stacked) -> unstack block-diagonal rows
                qhb_bd = jax.lax.dot_general(
                    sbd, kn.astype(dt), (((1,), (0,)), ((), ())),
                    preferred_element_type=f32,
                )                                      # [gs*L, GG]
                qhb = jnp.zeros((L, GG), f32)
                for h in range(gs):
                    qhb = qhb + jnp.where(
                        cidx == h, qhb_bd[h * L:(h + 1) * L], 0.0
                    )
                # k-grad via the stacked q-hat
                qbd = jnp.broadcast_to(
                    qh.astype(dt)[None], (gs, L, GG)
                ).reshape(gs * L, GG)
                qbd = jnp.where(bd, qbd, jnp.zeros((), dt))
                knb = jax.lax.dot_general(
                    sbd, qbd, (((0,), (0,)), ((), ())),
                    preferred_element_type=f32,
                )                                      # [L, GG]
                # logit-scale grad: sum over rows of qhb * qn (qn = qh/lam)
                dscale_ref[g] += jnp.sum(
                    qhb * qh / lam, axis=0, keepdims=True
                )
                # normalize backward: d/dq (q*rq) applied to (qhb*lam);
                # the per-head <g, q> inner products come from the same
                # roll-based segment sum (already lane-broadcast, no masks)
                qnb = qhb * lam
                sh, dq, dk = gs, qnb * q4, knb * k4
                while sh < GG:
                    dq = dq + pltpu.roll(dq, sh, 1)
                    dk = dk + pltpu.roll(dk, sh, 1)
                    sh *= 2
                qb = rq * (qnb - q4 * rq * rq * dq)
                kb = rk * (knb - k4 * rk * rk * dk)
                qbs.append(qb)
                kbs.append(kb)
                vbs.append(vb)
            qkvb_w = jnp.concatenate(qbs + kbs + vbs, axis=-1)  # [L, 3C] f32
            if qkvb_s.dtype != f32:
                # dt slab (C>512 fit mode): bias grad accumulates per window
                # in f32 — the halved scratch changes only this sum's
                # association (the slab's other consumers are dt GEMM
                # operands anyway)
                dbqkv_ref[...] += jnp.sum(qkvb_w, axis=0, keepdims=True)
            qkvb_s[
                r * ws:(r + 1) * ws, j * ws:(j + 1) * ws, :
            ] = qkvb_w.astype(qkvb_s.dtype).reshape(ws, ws, 3 * C)

    qkvb = qkvb_s[...].reshape(S_tok, 3 * C)
    dwqkv_ref[...] += jax.lax.dot_general(
        xs, qkvb.astype(dt), (((0,), (0,)), ((), ())),
        preferred_element_type=f32,
    )
    if qkvb.dtype == f32:
        # f32 slab (C<=512, the production stages): bias grad summed once
        # over the full slab — the exact round-2 graph, kept because the
        # in-loop variant above measurably shifted Mosaic's scoped-VMEM
        # schedule and OOM'd stage 2 (C=512, batch 64) by 764 KB
        dbqkv_ref[...] += jnp.sum(qkvb, axis=0, keepdims=True)
    xb = h1b + jax.lax.dot_general(
        qkvb.astype(dt), wqkv_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=f32,
    )
    if shift:
        dimg = _unroll2d(xb.astype(dt).reshape(RR * ws, Wb, C), shift)
        dx_ref[:] = dimg.reshape(x_ref.shape)
    else:
        dx_ref[:] = xb.astype(dt).reshape(x_ref.shape)


def _pallas_forward(
    x, wqkv, bqkv, wproj, bproj, ln1_scale, ln1_bias, w1, b1, w2, b2,
    ln2_scale, ln2_bias, rel_bias, logit_scale, dp, mask=None,
    *, window_size: int, num_heads: int, eps: float, interpret: bool,
    shift: int = 0,
):
    B, H, W, C = x.shape
    ws = window_size
    nH, nWj = H // ws, W // ws
    L = ws * ws
    Ch = w1.shape[1]
    hd = C // num_heads

    # head grouping: pack gs heads per attention dot so K = gs*hd fills the
    # 128-lane MXU depth (hd is 32 for every SwinV2 size)
    gs = _largest_divisor_leq(num_heads, max(1, 128 // max(hd, 1)))
    G = num_heads // gs
    GG = gs * hd

    single = nH == 1 and nWj == 1
    assert not (single and shift), "single-window blocks never shift"
    if single:
        # single-window stages (SwinV2-256 stages 2/3): pack several whole
        # images into one slab so the GEMMs see M ~= 2048 rows (1024 for f32
        # inputs: the slab activations double and crowd the VMEM budget)
        tok = 2048 if jnp.dtype(x.dtype).itemsize <= 2 else 1024
        # the G-bound caps in-kernel loop unrolling (RR*G window-group
        # iterations per program); raising it to 64 made stage 3 WORSE
        # (3.20 vs 2.80 ms/blk at batch 256) — weights stay VMEM-resident
        # across programs already, so bigger slabs only add pressure
        cap = min(max(1, tok // L), max(1, 32 // G))
        RR = _largest_divisor_leq(B, cap)
        grid = (B // RR, 1)
        x_spec = pl.BlockSpec(
            (RR, ws, W, C), lambda b, i: (b, 0, 0, 0), memory_space=pltpu.VMEM
        )
    elif shift:
        # shifted blocks: the program must hold the full image so the
        # in-kernel roll wraps locally (stage 0: 4 window-rows = 1 MB bf16)
        RR = nH
        grid = (B, 1)
        x_spec = pl.BlockSpec(
            (1, RR * ws, W, C), lambda b, i: (b, 0, 0, 0), memory_space=pltpu.VMEM
        )
    else:
        # multi-window stages: one slab = RR window-rows of one image
        cap = min(max(1, 1024 // (ws * W)), max(1, 24 // max(1, nWj * G)))
        RR = _largest_divisor_leq(nH, cap)
        grid = (B, nH // RR)
        x_spec = pl.BlockSpec(
            (1, RR * ws, W, C), lambda b, i: (b, i, 0, 0), memory_space=pltpu.VMEM
        )
    Wb = W if not single else ws

    def full(arr):
        nd = arr.ndim
        return pl.BlockSpec(
            arr.shape, lambda b, i, _n=nd: (0,) * _n, memory_space=pltpu.VMEM
        )

    # group layouts: heads of a group stacked along rows (free reshape), and
    # the per-head logit scale broadcast over that head's interleaved lanes.
    # pre-shift the CPB bias by the static per-head logit bound so the
    # kernel's softmax needs no row-max pass (exponents provably <= 0):
    # cosine scores satisfy s <= scale_h and the bias itself is < 16
    tau = logit_scale.reshape(num_heads, 1, 1).astype(jnp.float32) + 16.0
    relb_g = (rel_bias.astype(jnp.float32) - tau).reshape(G, gs * L, L)
    lowp = (jnp.dtype(x.dtype).itemsize <= 2 and not _VARIANT
            and _BF16_SOFTMAX)
    if lowp:
        # 16-bit compute: the kernel's score/softmax passes run in dt (see
        # _block_body), so ship the pre-shifted CPB bias (and mask below)
        # already rounded — halves their VMEM residency as well
        relb_g = relb_g.astype(x.dtype)
    # interleaved lane i <-> head i % gs: scale pattern tiles the group's
    # gs per-head scales hd times
    scale_row = jnp.tile(
        logit_scale.reshape(G, 1, gs).astype(jnp.float32), (1, 1, hd)
    ).reshape(G, 1, GG)

    # permute qkv columns / proj rows into the interleaved head-lane layout
    ivi = _interleave_idx(C, hd, gs)
    ivi3 = jnp.concatenate([jnp.asarray(ivi + s * C) for s in range(3)])
    wqkv = wqkv[:, ivi3]
    bqkv = bqkv.reshape(1, 3 * C)[:, ivi3].reshape(bqkv.shape)
    wproj = wproj[ivi, :]

    in_specs = [
        x_spec,
        full(wqkv), full(bqkv), full(wproj), full(bproj),
        full(ln1_scale), full(ln1_bias), full(w1), full(b1),
        full(w2), full(b2), full(ln2_scale), full(ln2_bias),
        full(relb_g), full(scale_row),
        # per-image droppath keep-scales: whole [B,2] array in SMEM (blocked
        # sub-(8,128) shapes are rejected), indexed by program_id in-kernel
        pl.BlockSpec((B, 2), lambda b, i: (0, 0), memory_space=pltpu.SMEM),
    ]
    operands = [
        x, wqkv, bqkv, wproj, bproj, ln1_scale, ln1_bias,
        w1, b1, w2, b2, ln2_scale, ln2_bias,
        relb_g, scale_row,
        dp.astype(jnp.float32),
    ]
    kw = dict(
        ws=ws, Wb=Wb, RR=RR, nWj=nWj, gs=gs, heads=num_heads, eps=eps,
        single=single, shift=shift,
    )
    if mask is not None:
        in_specs.append(
            pl.BlockSpec(
                (RR * nWj, L, L), lambda b, i: (i, 0, 0), memory_space=pltpu.VMEM
            )
        )
        operands.append(mask.astype(x.dtype) if lowp else mask)
        kernel = functools.partial(_block_kernel, **kw)
    else:
        def kernel(*refs):
            *ins, out_ref, attn_ref = refs
            _block_kernel(*ins, None, out_ref, attn_ref, **kw)

    # FLOPs: qkv+proj 8*L*C*C, attn 4*L*L*C, mlp 4*L*C*Ch per window
    flops_per_win = 8 * L * C * C + 4 * L * L * C + 4 * L * C * Ch
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=[pltpu.VMEM((RR * ws, Wb, C), x.dtype)],
        interpret=interpret,
        # Stage-2/3 f32 instances need tens of MB of scoped VMEM (weights +
        # CPB bias + slab activations) — above the 16 MB compiler default,
        # well under the 128 MB/core physical VMEM of v5e/v5p.
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=_FWD_VMEM_LIMIT,
        ),
        cost_estimate=pl.CostEstimate(
            flops=B * nH * nWj * flops_per_win,
            bytes_accessed=2 * x.size * x.dtype.itemsize
            + (wqkv.size + wproj.size + w1.size + w2.size) * wqkv.dtype.itemsize,
            transcendentals=B * nH * nWj * (L * L + L * Ch),
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
    window_size, num_heads, eps, interpret, shift = static
    return _pallas_forward(
        *args, window_size=window_size, num_heads=num_heads, eps=eps,
        interpret=interpret, shift=shift,
    )


def _fused_block_fwd(static, *args):
    return _fused_block_ad(static, *args), args


def _pallas_backward(
    g, x, wqkv, bqkv, wproj, bproj, ln1_scale, ln1_bias, w1, b1, w2, b2,
    ln2_scale, ln2_bias, rel_bias, logit_scale, dp, mask=None,
    *, window_size: int, num_heads: int, eps: float, interpret: bool,
    shift: int = 0,
):
    """Fused-block backward as one Pallas kernel: the forward is recomputed
    per slab in VMEM (rematerialization) and backpropagated in place; weight
    gradients accumulate in f32 output blocks across the (sequential) grid."""
    B, H, W, C = x.shape
    ws = window_size
    nH, nWj = H // ws, W // ws
    L = ws * ws
    Ch = w1.shape[1]
    hd = C // num_heads

    gs = _largest_divisor_leq(num_heads, max(1, 128 // max(hd, 1)))
    G = num_heads // gs
    GG = gs * hd

    single = nH == 1 and nWj == 1
    assert not (single and shift), "single-window blocks never shift"
    if single:
        # C=1024 (Swin-B stage 3): the f32 dw accumulators (48 MB) + bf16
        # weights (24 MB) leave little of the 127 MB VMEM budget for slab
        # scratches, so shrink to one image per program — stage 3 is 2 of
        # 24 blocks, GEMM-efficiency there is not the step's bottleneck
        tok = 1024 if C <= 512 else L
        cap = min(max(1, tok // L), max(1, 32 // G))
        RR = _largest_divisor_leq(B, cap)
        grid = (B // RR, 1)
        x_spec = pl.BlockSpec(
            (RR, ws, W, C), lambda b, i: (b, 0, 0, 0), memory_space=pltpu.VMEM
        )
    elif shift:
        # shifted blocks: the program holds the full image so the in-kernel
        # roll wraps locally (mirrors the forward kernel's shifted grid)
        RR = nH
        grid = (B, 1)
        x_spec = pl.BlockSpec(
            (1, RR * ws, W, C), lambda b, i: (b, 0, 0, 0), memory_space=pltpu.VMEM
        )
    else:
        cap = min(max(1, 1024 // (ws * W)), max(1, 24 // max(1, nWj * G)))
        RR = _largest_divisor_leq(nH, cap)
        grid = (B, nH // RR)
        x_spec = pl.BlockSpec(
            (1, RR * ws, W, C), lambda b, i: (b, i, 0, 0), memory_space=pltpu.VMEM
        )
    Wb = W if not single else ws
    S_tok = RR * ws * Wb
    nWin = RR * nWj

    def full(arr):
        nd = arr.ndim
        return pl.BlockSpec(
            arr.shape, lambda b, i, _n=nd: (0,) * _n, memory_space=pltpu.VMEM
        )

    # pre-shift the CPB bias by the static per-head logit bound so the
    # kernel's softmax needs no row-max pass (exponents provably <= 0):
    # cosine scores satisfy s <= scale_h and the bias itself is < 16
    tau = logit_scale.reshape(num_heads, 1, 1).astype(jnp.float32) + 16.0
    relb_g = (rel_bias.astype(jnp.float32) - tau).reshape(G, gs * L, L)
    scale_row = jnp.tile(
        logit_scale.reshape(G, 1, gs).astype(jnp.float32), (1, 1, hd)
    ).reshape(G, 1, GG)

    # interleaved head-lane layout (see _interleave_idx); weight grads come
    # back in the permuted layout and are inverse-permuted below
    ivi = _interleave_idx(C, hd, gs)
    ivi3 = np.concatenate([ivi + s * C for s in range(3)])
    inv = np.argsort(ivi)
    inv3 = np.argsort(ivi3)
    wqkv_p = wqkv[:, jnp.asarray(ivi3)]
    bqkv_p = bqkv.reshape(1, 3 * C)[:, jnp.asarray(ivi3)].reshape(bqkv.shape)
    wproj_p = wproj[jnp.asarray(ivi), :]

    in_specs = [
        x_spec, x_spec,
        full(wqkv), full(bqkv), full(wproj), full(bproj),
        full(ln1_scale), full(ln1_bias), full(w1), full(b1),
        full(w2), full(b2), full(ln2_scale), full(ln2_bias),
        full(relb_g), full(scale_row),
        pl.BlockSpec((B, 2), lambda b, i: (0, 0), memory_space=pltpu.SMEM),
    ]
    operands = [
        g, x, wqkv_p, bqkv_p, wproj_p, bproj, ln1_scale, ln1_bias,
        w1, b1, w2, b2, ln2_scale, ln2_bias,
        relb_g, scale_row, dp.astype(jnp.float32),
    ]
    kw = dict(
        ws=ws, Wb=Wb, RR=RR, nWj=nWj, gs=gs, heads=num_heads, eps=eps,
        single=single, shift=shift,
    )
    if mask is not None:
        in_specs.append(
            pl.BlockSpec(
                (RR * nWj, L, L), lambda b, i: (i, 0, 0), memory_space=pltpu.VMEM
            )
        )
        operands.append(mask)
        kernel = functools.partial(_bwd_kernel, **kw)
    else:
        def kernel(*refs):
            ins, outs = refs[:17], refs[17:]
            _bwd_kernel(*ins, None, *outs, **kw)

    f32 = jnp.float32
    acc = lambda shape: jax.ShapeDtypeStruct(shape, f32)  # noqa: E731

    def acc_spec(shape):
        nd = len(shape)
        return pl.BlockSpec(
            shape, lambda b, i, _n=nd: (0,) * _n, memory_space=pltpu.VMEM
        )

    out_shapes = [
        jax.ShapeDtypeStruct(x.shape, x.dtype),          # dx
        acc((C, 3 * C)), acc((1, 3 * C)),                # dwqkv, dbqkv
        acc((C, C)), acc((1, C)),                        # dwproj, dbproj
        acc((1, C)), acc((1, C)),                        # dln1 scale/bias
        acc((C, Ch)), acc((1, Ch)),                      # dw1, db1
        acc((Ch, C)), acc((1, C)),                       # dw2, db2
        acc((1, C)), acc((1, C)),                        # dln2 scale/bias
        acc((G, gs * L, L)),                             # drb (grouped)
        acc((G, 1, GG)),                                 # dscale (broadcast)
    ]
    out_specs = [x_spec] + [acc_spec(s.shape) for s in out_shapes[1:]]

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((RR * ws, Wb, 3 * C), x.dtype),    # qkv slab
            pltpu.VMEM((nWin * G, gs * L, L), x.dtype),   # softmax probs
            pltpu.VMEM((RR * ws, Wb, C), x.dtype),        # attn outputs
            pltpu.VMEM((S_tok, C), f32),                  # proj
            pltpu.VMEM((S_tok, C), f32),                  # h1
            pltpu.VMEM((S_tok, Ch), x.dtype),             # m1
            pltpu.VMEM((S_tok, Ch), x.dtype),             # gelu(m1)
            pltpu.VMEM((S_tok, C), f32),                  # m2
            # f32 slab for the production stages (C<=512, round-2-proven
            # schedule); dt slab only in the C>512 fit mode (see _bwd_kernel)
            pltpu.VMEM((RR * ws, Wb, 3 * C),
                       f32 if C <= 512 else x.dtype),     # qkv grad slab
        ],
        interpret=interpret,
        # grad accumulation across grid steps requires sequential revisiting
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=_BWD_VMEM_LIMIT,
        ),
    )(*operands)

    (dx, dwqkv, dbqkv, dwproj, dbproj, dln1s, dln1b, dw1, db1, dw2, db2,
     dln2s, dln2b, drb, dscale) = outs

    cast = lambda v, ref: v.astype(ref.dtype)  # noqa: E731
    # inverse-permute grads computed in the interleaved lane layout
    dwqkv = dwqkv[:, jnp.asarray(inv3)]
    dbqkv = dbqkv[:, jnp.asarray(inv3)]
    dwproj = dwproj[jnp.asarray(inv), :]
    grads = (
        dx,
        cast(dwqkv, wqkv), cast(dbqkv.reshape(bqkv.shape), bqkv),
        cast(dwproj, wproj), cast(dbproj.reshape(bproj.shape), bproj),
        cast(dln1s.reshape(ln1_scale.shape), ln1_scale),
        cast(dln1b.reshape(ln1_bias.shape), ln1_bias),
        cast(dw1, w1), cast(db1.reshape(b1.shape), b1),
        cast(dw2, w2), cast(db2.reshape(b2.shape), b2),
        cast(dln2s.reshape(ln2_scale.shape), ln2_scale),
        cast(dln2b.reshape(ln2_bias.shape), ln2_bias),
        cast(drb.reshape(num_heads, L, L), rel_bias),
        cast(
            # interleaved lanes: dscale[g, 0, d*gs + h] belongs to head
            # g*gs + h -> reshape (G, hd, gs), reduce the hd axis
            dscale.reshape(G, hd, gs).sum(1).reshape(logit_scale.shape),
            logit_scale,
        ),
        jnp.zeros_like(dp),
    )
    if mask is not None:
        grads = grads + (jnp.zeros_like(mask),)
    return grads


# Pallas bwd VMEM budget: f32 weight-grad accumulators + dt weights + slab
# scratches must fit in ~127 MB. C=1024 (Swin-B stage 3) measured 133.7 MB
# scoped VMEM at 4 images/slab (48 MB dw accumulators + 24 MB bf16 weights
# + slab scratches + pipeline buffers) and OOMed the compiler; the one-image
# slab + dt qkv-grad scratch above DOES fit, but the resulting per-image
# GEMMs (64 tokens x 1024) are too small for the MXU: measured on TPU
# (round 3, `FUSED_BLOCK_BWD_MAX_DIM=1024 tools/profile_stages.py --batch 64
# --impls fused xla --train-stages --stages 3`) the fused stage-3 fwd+bwd
# runs 9.20 ms vs 6.59 ms on the XLA-remat path, so C=1024 deliberately
# stays on XLA (2 of 24 blocks). Env override kept for re-probing on future
# hardware with bigger VMEM (where multi-image slabs would fit).
# NB the two in-kernel `C <= 512` checks (dt qkv-grad slab dtype, one-image
# tok cap) intentionally stay fixed while only this dispatch threshold is
# overridable: they encode VMEM-fit facts about the kernel geometry, not the
# fused-vs-XLA dispatch decision.
_PALLAS_BWD_MAX_DIM = _env_int("FUSED_BLOCK_BWD_MAX_DIM", 512)


def _fused_block_bwd(static, residuals, g):
    window_size, num_heads, eps, interpret, shift = static
    x = residuals[0]
    C = x.shape[-1]
    if C <= _PALLAS_BWD_MAX_DIM:
        # the Pallas backward rolls in VMEM itself (mirrors the forward)
        return _pallas_backward(
            g, *residuals, window_size=window_size, num_heads=num_heads,
            eps=eps, interpret=interpret, shift=shift,
        )
    # XLA fallback (C > _PALLAS_BWD_MAX_DIM): roll-outside equivalence (roll
    # is an orthogonal permutation, so the vjp of y = unroll(f(roll(x))) is
    # dx = unroll(f'(roll(x))^T roll(g)))
    if shift:
        residuals = (
            jnp.roll(residuals[0], (-shift, -shift), (1, 2)),
            *residuals[1:],
        )
        g = jnp.roll(g, (-shift, -shift), (1, 2))
    ref = functools.partial(
        _block_reference, window_size=window_size, num_heads=num_heads,
        eps=eps,
    )
    _, vjp = jax.vjp(ref, *residuals)
    grads = vjp(g)
    if shift:
        grads = (jnp.roll(grads[0], (shift, shift), (1, 2)), *grads[1:])
    return grads


_fused_block_ad.defvjp(_fused_block_fwd, _fused_block_bwd)


@functools.partial(
    jax.jit,
    static_argnames=("window_size", "num_heads", "eps", "interpret", "shift"),
)
def fused_swin_block(
    x: jnp.ndarray,          # [B, H, W, C] (UN-rolled; pass shift= instead)
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
    shift: int = 0,
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
    return _fused_block_ad(
        (window_size, num_heads, eps, interpret, shift), *args
    )
