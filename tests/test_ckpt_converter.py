"""Full-Poser checkpoint converter: structural match against our param tree.

Builds a torch module with the reference Poser's exact attribute naming,
using the GENUINE reference building blocks (refnet.transformer_module /
latent_transformers) plus HF Swinv2, converts its state_dict, and checks the
result aligns leaf-for-leaf with a freshly initialized flax Poser
(same paths, same shapes). Numerics of each block are covered by
test_reference_parity.py; this test pins the wiring + name map.
"""

import os
import sys

import numpy as np
import pytest

import jax

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "cs_vit")), reason="reference not mounted"
)
torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from flax.traverse_util import flatten_dict  # noqa: E402

from cs_vit_tpu.mano import ManoLayer, sh_joint_regressor, synthetic_assets  # noqa: E402
from cs_vit_tpu.models import Poser, PoserConfig  # noqa: E402
from cs_vit_tpu.models.swinv2 import SwinV2Config  # noqa: E402
from cs_vit_tpu.train.convert import convert_poser_state_dict  # noqa: E402

from .test_reference_parity import _load_reference_net  # noqa: E402

tm, lt = _load_reference_net()

# tiny geometry so the test runs fast on 1 CPU
IMG = 32
SWIN = SwinV2Config(
    image_size=IMG, patch_size=4, embed_dim=8, depths=(1, 1), num_heads=(2, 2),
    window_size=4, drop_path_rate=0.0, pretrained_window_sizes=(0, 0),
)
D = SWIN.num_features          # 16
H = SWIN.num_heads[-1]         # 2
NUM_P = IMG // (4 * 2)         # 4


def build_reference_named_poser(num_latent_layer=1, temporal="full"):
    """torch module with the reference Poser's state_dict naming."""
    import torch.nn as nn

    hf_cfg = transformers.Swinv2Config(
        image_size=IMG, patch_size=4, num_channels=3, embed_dim=8,
        depths=[1, 1], num_heads=[2, 2], window_size=4,
    )
    m = nn.Module()
    m.backbone = transformers.Swinv2Model(hf_cfg, add_pooling_layer=False)
    m.query_token = nn.Parameter(torch.randn(3, D))

    persp = nn.Module()
    persp.proj = nn.Linear(16 * 16 * 2, D)
    layer = nn.Sequential()
    for _ in range(3):
        layer.extend([nn.BatchNorm1d(D), nn.Linear(D, D), nn.ReLU()])
    layer.append(nn.Linear(D, D))
    persp.layer = layer
    m.perspective_mlp = persp

    spatial = nn.Module()
    spatial.pe_spatial = tm.PositionalEncoding(D, mode="absolute")
    spatial.layers = nn.ModuleList([tm.DecoderBlock(D, H) for _ in range(2)])
    m.spatial_encoder = spatial

    for name in ("pose_temporal_encoder", "shape_temporal_encoder", "root_temporal_encoder"):
        enc = nn.Module()
        if temporal == "full":
            enc.pe_temporal = tm.PositionalEncoding(D, mode="absolute")
            enc.layers = nn.ModuleList([tm.EncoderBlock(D, H) for _ in range(1)])
        else:
            enc.pe_temporal = tm.PositionalEncoding(D, mode="trope")
            enc.layers = nn.ModuleList([tm.CrossAttnDecoder(D, H) for _ in range(1)])
        enc.zero_conv = nn.Linear(D, D, bias=False)
        setattr(m, name, enc)

    m.pose_decoder = nn.Sequential(nn.Linear(D, 16 * 6))
    m.shape_decoder = nn.Sequential(nn.Linear(D, 10))
    m.root_decoder = nn.Sequential(nn.Linear(D, 3))

    if num_latent_layer:
        m.latent_trans = lt.ScaleRotComplexEmbedTransformationGroup(
            num_layers=num_latent_layer, embed_dim=D, num_heads=H,
            num_p=NUM_P, num_q=NUM_P,
        )
    return m


@pytest.mark.parametrize("temporal", ["full", "realtime"])
def test_poser_converter_structure(temporal):
    torch.manual_seed(0)
    ref = build_reference_named_poser(num_latent_layer=1, temporal=temporal)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    cfg = PoserConfig(
        backbone="custom", custom_swin=SWIN, image_size=IMG,
        num_spatial_layer=2, num_temporal_layer=1,
        num_latent_layer=1, persp_decorate="patch",
        temporal_supervision=temporal,
    )
    params, stats = convert_poser_state_dict(sd, cfg)

    assets = synthetic_assets(seed=1)
    model = Poser(config=cfg, mano=ManoLayer(assets), j_regressor=sh_joint_regressor(assets))
    import jax.numpy as jnp

    B, T, S = 1, 2, IMG
    batch = {
        "patches": jnp.zeros((B, T, S, S, 3)),
        "square_bboxes": jnp.tile(jnp.asarray([0.0, 0.0, 32.0, 32.0]), (B, T, 1)),
        "joint_cam": jnp.zeros((B, T, 21, 3)) + 100,
        "joint_valid": jnp.ones((B, T, 21)),
        "mano_shape": jnp.zeros((B, T, 10)),
        "timestamp": jnp.tile(jnp.arange(T, dtype=jnp.float32), (B, 1)),
        "focal": jnp.full((B, T, 2), 100.0),
        "princpt": jnp.full((B, T, 2), 16.0),
    }
    variables = model.init(
        {"params": jax.random.key(0), "droppath": jax.random.key(1),
         "latent": jax.random.key(2)},
        batch, phase="inference",
    )

    expect_p = {"/".join(map(str, k)): v.shape for k, v in flatten_dict(variables["params"]).items()}
    got_p = {"/".join(map(str, k)): np.asarray(v).shape for k, v in flatten_dict(params).items()}
    missing = sorted(set(expect_p) - set(got_p))
    extra = sorted(set(got_p) - set(expect_p))
    assert not missing, f"converter missing params: {missing[:10]}"
    assert not extra, f"converter extra params: {extra[:10]}"
    for k in expect_p:
        assert expect_p[k] == got_p[k], f"shape mismatch at {k}: {expect_p[k]} vs {got_p[k]}"

    expect_s = {"/".join(map(str, k)) for k in flatten_dict(variables["batch_stats"])}
    got_s = {"/".join(map(str, k)) for k in flatten_dict(stats)}
    assert expect_s == got_s, f"batch_stats mismatch: {sorted(expect_s ^ got_s)[:10]}"

    # spot-check a converted leaf value (linear transpose applied)
    ref_w = sd["pose_decoder.0.weight"]
    np.testing.assert_allclose(params["pose_decoder"]["kernel"], ref_w.T)

    # converted weights actually run through the model
    out = model.apply(
        {"params": jax.tree.map(jnp.asarray, params),
         "batch_stats": jax.tree.map(jnp.asarray, stats)},
        batch, phase="inference",
        rngs={"latent": jax.random.key(3)},
    )
    assert np.isfinite(float(out["loss"]))


def test_export_import_roundtrip():
    """flax -> reference-style torch state_dict -> flax is the identity."""
    from flax.traverse_util import flatten_dict

    from cs_vit_tpu.train.convert import export_poser_state_dict

    cfg = PoserConfig(
        backbone="custom", custom_swin=SWIN, image_size=IMG,
        num_spatial_layer=2, num_temporal_layer=1,
        num_latent_layer=1, persp_decorate="patch",
        temporal_supervision="full",
    )
    assets = synthetic_assets(seed=1)
    model = Poser(config=cfg, mano=ManoLayer(assets), j_regressor=sh_joint_regressor(assets))
    import jax.numpy as jnp

    B, T, S = 1, 2, IMG
    batch = {
        "patches": jnp.zeros((B, T, S, S, 3)),
        "square_bboxes": jnp.tile(jnp.asarray([0.0, 0.0, 32.0, 32.0]), (B, T, 1)),
        "joint_cam": jnp.zeros((B, T, 21, 3)) + 100,
        "joint_valid": jnp.ones((B, T, 21)),
        "mano_shape": jnp.zeros((B, T, 10)),
        "timestamp": jnp.tile(jnp.arange(T, dtype=jnp.float32), (B, 1)),
        "focal": jnp.full((B, T, 2), 100.0),
        "princpt": jnp.full((B, T, 2), 16.0),
    }
    variables = model.init(
        {"params": jax.random.key(1), "droppath": jax.random.key(2),
         "latent": jax.random.key(3)},
        batch, phase="inference",
    )

    sd = export_poser_state_dict(
        variables["params"], variables["batch_stats"], cfg
    )
    params2, stats2 = convert_poser_state_dict(sd, cfg)

    for k, v in flatten_dict(variables["params"]).items():
        np.testing.assert_array_equal(
            np.asarray(v), np.asarray(flatten_dict(params2)[k]),
            err_msg="/".join(map(str, k)),
        )
    for k, v in flatten_dict(variables["batch_stats"]).items():
        np.testing.assert_array_equal(
            np.asarray(v), np.asarray(flatten_dict(stats2)[k]),
            err_msg="/".join(map(str, k)),
        )
