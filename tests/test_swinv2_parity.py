"""SwinV2 flax implementation vs HuggingFace torch Swinv2Model (random init).

Exercises: patch embed, cosine window attention with CPB-MLP bias, shifted
windows (+mask), window clamping when resolution <= window, patch merging,
and the final LayerNorm — all against the exact library the reference loads
its backbone from (`cs_vit/net/ti_poser.py:246`).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cs_vit_tpu.models.swinv2 import (
    SwinV2,
    SwinV2Config,
    convert_hf_swinv2_state_dict,
)

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def build_pair(image_size, window_size, depths, num_heads, embed_dim=16,
               pretrained_window_sizes=None):
    pws = pretrained_window_sizes or (0,) * len(depths)
    hf_cfg = transformers.Swinv2Config(
        image_size=image_size,
        patch_size=4,
        num_channels=3,
        embed_dim=embed_dim,
        depths=list(depths),
        num_heads=list(num_heads),
        window_size=window_size,
        mlp_ratio=4.0,
        qkv_bias=True,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        drop_path_rate=0.1,
        pretrained_window_sizes=list(pws),
    )
    torch.manual_seed(0)
    hf_model = transformers.Swinv2Model(hf_cfg, add_pooling_layer=False).eval()

    cfg = SwinV2Config(
        image_size=image_size,
        patch_size=4,
        embed_dim=embed_dim,
        depths=tuple(depths),
        num_heads=tuple(num_heads),
        window_size=window_size,
        pretrained_window_sizes=tuple(pws),
    )
    model = SwinV2(cfg)
    state = {k: v.detach().numpy() for k, v in hf_model.state_dict().items()}
    params = convert_hf_swinv2_state_dict(state, cfg)
    return hf_model, model, params


@pytest.mark.parametrize(
    "image_size,window,depths,heads",
    [
        (32, 4, (2, 2), (2, 4)),     # shifted windows in stage 0, clamp in stage 1
        (32, 8, (1, 1), (2, 4)),     # window == resolution at stage 0 (no shift)
        (64, 4, (2, 2, 2), (2, 4, 8)),  # 3 stages, two merges
    ],
)
def test_swinv2_matches_hf(image_size, window, depths, heads, rng):
    hf_model, model, params = build_pair(image_size, window, depths, heads)

    x = rng.normal(size=(2, 3, image_size, image_size)).astype(np.float32)
    with torch.no_grad():
        ref = hf_model(torch.from_numpy(x)).last_hidden_state.numpy()

    out = model.apply(
        {"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)), deterministic=True
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=1e-3)


@pytest.mark.parametrize("pretrained_ws", [(0, 0), (12, 12)])
def test_swinv2_production_geometry(rng, pretrained_ws):
    """Deployed Swin-B geometry: 256px, window 16, shift 8, 64->16 windows.

    Stage 0 (2 blocks at 64x64 tokens, 16 windows, one shifted) + patch merge
    + one stage-1 block — the exact resolution/window/shift/mask/roll path the
    production backbone runs (HF load site `cs_vit/net/ti_poser.py:246`).
    The (12, 12) case covers pretrained_window_sizes != 0 (log-CPB coordinate
    rescaling by the pretraining window instead of the current one).
    """
    hf_model, model, params = build_pair(
        256, 16, (2, 1), (4, 8), embed_dim=128, pretrained_window_sizes=pretrained_ws
    )
    x = rng.normal(size=(1, 3, 256, 256)).astype(np.float32)
    with torch.no_grad():
        ref = hf_model(torch.from_numpy(x)).last_hidden_state.numpy()
    out = model.apply(
        {"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)), deterministic=True
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-3, rtol=1e-3)


def test_swinv2_output_shape_tiny_config():
    cfg = SwinV2Config(
        image_size=64, embed_dim=8, depths=(1, 1), num_heads=(2, 2), window_size=4,
        pretrained_window_sizes=(0, 0),
    )
    model = SwinV2(cfg)
    x = jnp.zeros((1, 64, 64, 3))
    params = model.init(jax.random.key(0), x)["params"]
    out = model.apply({"params": params}, x)
    # 64/4 = 16 tokens per side, one merge -> 8x8 = 64 tokens, dim 16.
    assert out.shape == (1, 64, 16)


def test_swinv2_droppath_train_mode(rng):
    cfg = SwinV2Config(
        image_size=32, embed_dim=8, depths=(1, 1), num_heads=(2, 2), window_size=4,
        drop_path_rate=0.5, pretrained_window_sizes=(0, 0),
    )
    model = SwinV2(cfg)
    x = jnp.asarray(rng.normal(size=(4, 32, 32, 3)).astype(np.float32))
    params = model.init(jax.random.key(0), x)["params"]
    det = model.apply({"params": params}, x, deterministic=True)
    stoch = model.apply(
        {"params": params}, x, deterministic=False,
        rngs={"droppath": jax.random.key(1)},
    )
    assert not np.allclose(np.asarray(det), np.asarray(stoch))
