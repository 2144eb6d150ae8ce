"""Parity tests for the fused whole-SwinV2-block Pallas kernel.

The fused path must be numerically interchangeable with the XLA block path
(same param tree, same outputs) so `attention_impl="fused"` is a pure runtime
switch. Runs in Pallas interpret mode on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cs_vit_tpu.models.swinv2 import SwinV2Block, SwinV2Config


def _make_block(impl, *, res=8, ws=4, shift=0, dim=16, heads=2):
    cfg = SwinV2Config(
        image_size=res * 4, patch_size=4, embed_dim=dim,
        depths=(1,), num_heads=(heads,), window_size=ws,
        drop_path_rate=0.0,
    )
    return SwinV2Block(
        config=cfg, dim=dim, resolution=(res, res), num_heads=heads,
        shift_size=shift, drop_path_rate=0.0, attention_impl=impl,
    )


@pytest.mark.parametrize("shift", [0, 2])
@pytest.mark.parametrize("dtype", [jnp.float32])
def test_fused_block_matches_xla(rng, shift, dtype):
    res, ws, dim, heads, B = 8, 4, 16, 2, 2
    x = jnp.asarray(rng.normal(size=(B, res * res, dim)), dtype)

    ref_block = _make_block("xla", res=res, ws=ws, shift=shift, dim=dim, heads=heads)
    fused_block = _make_block("fused", res=res, ws=ws, shift=shift, dim=dim, heads=heads)

    params = ref_block.init(jax.random.key(0), x)
    # identical param trees: the fused path reads the same setup-declared weights
    params_fused = fused_block.init(jax.random.key(0), x)
    assert jax.tree.structure(params) == jax.tree.structure(params_fused)

    y_ref = ref_block.apply(params, x)
    y_fused = fused_block.apply(params, x)
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_ref), atol=2e-5, rtol=2e-5)


def test_fused_block_multirow_shifted(rng):
    """Several window rows + shift: exercises the slab grid and mask indexing."""
    res, ws, dim, heads, B = 12, 4, 8, 2, 2
    x = jnp.asarray(rng.normal(size=(B, res * res, dim)), jnp.float32)
    ref_block = _make_block("xla", res=res, ws=ws, shift=2, dim=dim, heads=heads)
    fused_block = _make_block("fused", res=res, ws=ws, shift=2, dim=dim, heads=heads)
    params = ref_block.init(jax.random.key(1), x)
    y_ref = ref_block.apply(params, x)
    y_fused = fused_block.apply(params, x)
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_ref), atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize(
    "res,ws,shift,dim,heads,B",
    [
        (8, 4, 0, 16, 2, 2),    # multi-window slab
        (8, 4, 2, 16, 2, 2),    # shifted (mask in the bwd recompute)
        (4, 4, 0, 16, 4, 4),    # single window: multi-image slab + grouping
        (12, 4, 2, 8, 2, 2),    # several window rows per image
    ],
)
def test_fused_block_grad_matches_xla(rng, res, ws, shift, dim, heads, B):
    """Pallas backward kernel (VMEM rematerialization) == XLA-path gradients."""
    x = jnp.asarray(rng.normal(size=(B, res * res, dim)), jnp.float32)
    ref_block = _make_block("xla", res=res, ws=ws, shift=shift, dim=dim, heads=heads)
    fused_block = _make_block("fused", res=res, ws=ws, shift=shift, dim=dim, heads=heads)
    params = ref_block.init(jax.random.key(0), x)

    def loss(block):
        def f(p, xx):
            y = block.apply(p, xx)
            return jnp.sum(y * y)
        return f

    g_ref_p, g_ref_x = jax.grad(loss(ref_block), argnums=(0, 1))(params, x)
    g_fus_p, g_fus_x = jax.grad(loss(fused_block), argnums=(0, 1))(params, x)
    # tolerance: reassociated f32 reductions + the in-kernel rational erf
    np.testing.assert_allclose(np.asarray(g_fus_x), np.asarray(g_ref_x),
                               atol=1e-3, rtol=2e-3)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=1e-3, rtol=2e-3
        ),
        g_ref_p, g_fus_p,
    )


def test_fused_block_droppath_training(rng):
    """Droppath-active fused path runs, differs from deterministic, and is
    differentiable."""
    res, ws, dim, heads, B = 8, 4, 16, 2, 4
    cfg = SwinV2Config(
        image_size=res * 4, patch_size=4, embed_dim=dim,
        depths=(1,), num_heads=(heads,), window_size=ws, drop_path_rate=0.5,
    )
    block = SwinV2Block(
        config=cfg, dim=dim, resolution=(res, res), num_heads=heads,
        shift_size=0, drop_path_rate=0.5, attention_impl="fused",
    )
    x = jnp.asarray(rng.normal(size=(B, res * res, dim)), jnp.float32)
    params = block.init(
        {"params": jax.random.key(0), "droppath": jax.random.key(1)},
        x, deterministic=False,
    )
    det = block.apply(params, x, deterministic=True)
    sto = block.apply(
        params, x, deterministic=False, rngs={"droppath": jax.random.key(2)}
    )
    assert not np.allclose(np.asarray(det), np.asarray(sto))

    g = jax.grad(
        lambda p: jnp.sum(
            block.apply(p, x, deterministic=False,
                        rngs={"droppath": jax.random.key(2)}) ** 2
        )
    )(params)
    assert all(
        np.isfinite(np.asarray(leaf)).all() for leaf in jax.tree.leaves(g)
    )


def test_fused_backbone_matches_xla(rng):
    """Full tiny backbone: fused kernel in-situ across stages + patch merging."""
    from cs_vit_tpu.models.swinv2 import SwinV2

    cfg = SwinV2Config(
        image_size=32, patch_size=4, embed_dim=16, depths=(2, 2),
        num_heads=(2, 4), window_size=4, drop_path_rate=0.0,
    )
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)), jnp.float32)
    ref = SwinV2(cfg, attention_impl="xla")
    fused = SwinV2(cfg, attention_impl="fused")
    params = ref.init(jax.random.key(0), x)
    y_ref = ref.apply(params, x)
    y_fused = fused.apply(params, x)
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_ref), atol=3e-5, rtol=3e-5)


def test_fused_block_grad_bf16_dt_slab(rng, monkeypatch):
    """The C>512 backward fit mode (one-image slab + COMPUTE-DTYPE qkv-grad
    slab with per-window f32 bias accumulation) never executes in the other
    grad tests (all dim<=16, f32). Force it by raising the dispatch
    threshold and check grads against the XLA path at bf16 tolerance.
    Geometry mirrors Swin-B stage 3: single window, C=1024, hd=64."""
    from cs_vit_tpu.ops import fused_block as fb

    monkeypatch.setattr(fb, "_PALLAS_BWD_MAX_DIM", 1024)
    res, ws, dim, heads, B = 4, 4, 1024, 16, 2
    x = jnp.asarray(rng.normal(size=(B, res * res, dim)), jnp.bfloat16)
    ref_block = _make_block("xla", res=res, ws=ws, shift=0, dim=dim, heads=heads)
    fused_block = _make_block("fused", res=res, ws=ws, shift=0, dim=dim, heads=heads)
    params = jax.tree.map(
        lambda v: v.astype(jnp.bfloat16)
        if jnp.issubdtype(v.dtype, jnp.floating) else v,
        ref_block.init(jax.random.key(0), x),
    )

    def loss(block):
        return lambda p, xx: jnp.sum(
            block.apply(p, xx).astype(jnp.float32) ** 2
        )

    g_ref_p, g_ref_x = jax.grad(loss(ref_block), argnums=(0, 1))(params, x)
    g_fus_p, g_fus_x = jax.grad(loss(fused_block), argnums=(0, 1))(params, x)

    def close(a, b):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        scale = max(np.abs(a).max(), 1e-6)
        # bf16 forward + bf16 slab accumulation: advisor-measured worst
        # param-grad rel err ~2.7% on this geometry; pin at 6%
        assert np.abs(b - a).max() <= 6e-2 * scale, (
            f"max abs err {np.abs(b - a).max():.3e} vs scale {scale:.3e}"
        )

    close(g_ref_x, g_fus_x)
    jax.tree.map(close, g_ref_p, g_fus_p)


def test_fused_block_bf16_softmax_budget(rng, monkeypatch):
    """Error budget of the opt-in bf16 score/softmax path (FUSED_BLOCK_
    BF16_SOFTMAX=1): the fused kernel rounds the [gs*L, L] scores to bf16
    before exp. Measured against an f32-XLA truth: the DEFAULT (f32
    softmax) fused path must sit at the bf16 noise floor the XLA path
    already has, while the opt-in path is pinned at its measured budget
    (~2.9x the floor; the static-shift moves logits to large magnitudes
    where bf16 rounding is a large absolute exponent error — why it is
    opt-in, not default)."""
    from cs_vit_tpu.ops import fused_block as fb

    res, ws, dim, heads, B = 16, 8, 128, 4, 2
    for shift in (0, 4):
        x32 = jnp.asarray(rng.normal(size=(B, res * res, dim)), jnp.float32)
        ref = _make_block("xla", res=res, ws=ws, shift=shift, dim=dim, heads=heads)
        fused = _make_block("fused", res=res, ws=ws, shift=shift, dim=dim, heads=heads)
        params32 = ref.init(jax.random.key(0), x32)
        truth = np.asarray(ref.apply(params32, x32), np.float32)

        cast16 = lambda t: jax.tree.map(  # noqa: E731
            lambda v: v.astype(jnp.bfloat16)
            if jnp.issubdtype(v.dtype, jnp.floating) else v, t)
        params16, x16 = cast16(params32), x32.astype(jnp.bfloat16)
        err_xla = np.abs(
            np.asarray(ref.apply(params16, x16), np.float32) - truth
        ).max()
        err_fused = np.abs(
            np.asarray(fused.apply(params16, x16), np.float32) - truth
        ).max()
        scale = np.abs(truth).max()
        # default (f32 softmax): at the bf16 noise floor of the GEMMs
        assert err_fused <= max(2.0 * err_xla, 1e-2 * scale), (
            f"shift={shift}: fused-bf16 err {err_fused:.3e} vs "
            f"xla-bf16 err {err_xla:.3e} (scale {scale:.3e})"
        )

        # opt-in bf16 softmax: pinned at its measured budget (module global
        # is read at trace time — clear jit caches around the flip)
        monkeypatch.setattr(fb, "_BF16_SOFTMAX", True)
        jax.clear_caches()
        err_lowp = np.abs(
            np.asarray(fused.apply(params16, x16), np.float32) - truth
        ).max()
        monkeypatch.setattr(fb, "_BF16_SOFTMAX", False)
        jax.clear_caches()
        assert err_lowp <= max(5.0 * err_xla, 6e-2 * scale), (
            f"shift={shift}: bf16-softmax err {err_lowp:.3e} vs "
            f"xla-bf16 err {err_xla:.3e} (scale {scale:.3e})"
        )
