"""Pretrained HF backbone loading from a local checkpoint directory."""

import numpy as np
import pytest

import jax.numpy as jnp

from cs_vit_tpu.cli.common import _backbone_arch_name, load_backbone_params
from cs_vit_tpu.models.swinv2 import SwinV2, SwinV2Config

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def test_load_saved_hf_checkpoint(tmp_path, rng):
    hf_cfg = transformers.Swinv2Config(
        image_size=32, patch_size=4, embed_dim=16, depths=[1, 1], num_heads=[2, 2],
        window_size=4,
    )
    torch.manual_seed(0)
    hf = transformers.Swinv2Model(hf_cfg, add_pooling_layer=False).eval()
    ckpt_dir = tmp_path / "swinv2_local"
    hf.save_pretrained(str(ckpt_dir))

    cfg = SwinV2Config(
        image_size=32, patch_size=4, embed_dim=16, depths=(1, 1), num_heads=(2, 2),
        window_size=4, pretrained_window_sizes=(0, 0),
    )
    params = load_backbone_params(str(ckpt_dir), cfg)
    assert params is not None

    x = rng.normal(size=(1, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = hf(torch.from_numpy(x)).last_hidden_state.numpy()
    out = SwinV2(cfg).apply(
        {"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1))
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4)


def test_backbone_arch_name_resolution(tmp_path):
    assert _backbone_arch_name(None) == "swinv2-tiny-256"
    assert _backbone_arch_name("swinv2-base-256") == "swinv2-base-256"
    import json

    d = tmp_path / "hfdir"
    d.mkdir()
    (d / "config.json").write_text(json.dumps({"embed_dim": 128}))
    assert _backbone_arch_name(str(d)) == "swinv2-base-256"
    (d / "config.json").write_text(json.dumps({"embed_dim": 96}))
    assert _backbone_arch_name(str(d)) == "swinv2-tiny-256"
