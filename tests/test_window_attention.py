"""Pallas fused window attention vs XLA reference path + full-model check."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cs_vit_tpu.models.swinv2 import SwinV2, SwinV2Config
from cs_vit_tpu.ops.window_attention import (
    fused_window_attention,
    xla_window_attention,
)

INTERPRET = True  # CPU tests always interpret


@pytest.mark.parametrize("with_mask", [False, True])
def test_fused_matches_xla(rng, with_mask):
    B_, H, L, hd = 8, 2, 16, 8
    nW = 4 if with_mask else 1
    q = rng.normal(size=(B_, H, L, hd)).astype(np.float32)
    k = rng.normal(size=(B_, H, L, hd)).astype(np.float32)
    v = rng.normal(size=(B_, H, L, hd)).astype(np.float32)
    rel = rng.normal(size=(1, H, L, L)).astype(np.float32)
    if with_mask:
        mask = np.where(rng.uniform(size=(nW, 1, L, L)) > 0.8, -100.0, 0.0)
        bias = (rel + mask).astype(np.float32)
    else:
        bias = rel
    scale = np.exp(rng.uniform(0.5, 2.0, size=(H,))).astype(np.float32)

    ref = xla_window_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(bias),
        jnp.asarray(scale),
    )
    out = fused_window_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(bias),
        jnp.asarray(scale), interpret=INTERPRET,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_swinv2_pallas_impl_matches_xla_impl(rng):
    cfg = SwinV2Config(
        image_size=32, patch_size=4, embed_dim=8, depths=(2, 2), num_heads=(2, 4),
        window_size=4, drop_path_rate=0.0, pretrained_window_sizes=(0, 0),
    )
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    model_xla = SwinV2(cfg, attention_impl="xla")
    params = model_xla.init(jax.random.key(0), x)["params"]
    out_xla = model_xla.apply({"params": params}, x)

    model_pl = SwinV2(cfg, attention_impl="pallas")
    out_pl = model_pl.apply({"params": params}, x)
    # per-block deltas are ~5e-6 (f32 reassociation); LNs amplify slightly
    np.testing.assert_allclose(np.asarray(out_pl), np.asarray(out_xla), atol=1e-3)


def test_swinv2_hybrid_impl_matches_xla_impl(rng):
    cfg = SwinV2Config(
        image_size=32, patch_size=4, embed_dim=8, depths=(2, 2), num_heads=(2, 4),
        window_size=4, drop_path_rate=0.0, pretrained_window_sizes=(0, 0),
    )
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    model_xla = SwinV2(cfg, attention_impl="xla")
    params = model_xla.init(jax.random.key(0), x)["params"]
    out_xla = model_xla.apply({"params": params}, x)
    out_hy = SwinV2(cfg, attention_impl="hybrid").apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(out_hy), np.asarray(out_xla), atol=1e-3)
