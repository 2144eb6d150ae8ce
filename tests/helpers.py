"""Shared tiny-model builders for tests (small enough for 1-CPU CI)."""

import numpy as np

from cs_vit_tpu.mano import ManoLayer, sh_joint_regressor, synthetic_assets
from cs_vit_tpu.models import Poser, PoserConfig
from cs_vit_tpu.models.swinv2 import SwinV2Config

TINY_SWIN = SwinV2Config(
    image_size=32,
    patch_size=4,
    embed_dim=8,
    depths=(1, 1),
    num_heads=(2, 2),
    window_size=4,
    drop_path_rate=0.0,
    pretrained_window_sizes=(0, 0),
)
# tokens: 32/4=8 per side, one merge -> 4x4=16 tokens, dim=16


def tiny_poser(**overrides) -> Poser:
    cfg_kwargs = dict(
        backbone="custom",
        custom_swin=TINY_SWIN,
        image_size=32,
        num_pose_query=16,
        num_spatial_layer=2,
        num_temporal_layer=1,
    )
    cfg_kwargs.update(overrides)
    cfg = PoserConfig(**cfg_kwargs)
    assets = synthetic_assets(seed=1)
    mano = ManoLayer(assets, flat_hand_mean=False)
    return Poser(config=cfg, mano=mano, j_regressor=sh_joint_regressor(assets))


def tiny_batch(rng, B=2, T=3, img=32):
    joint_cam = rng.normal(scale=20.0, size=(B, T, 21, 3)).astype(np.float32)
    joint_cam[..., 2] += 400.0
    return {
        "patches": rng.uniform(size=(B, T, img, img, 3)).astype(np.float32),
        "square_bboxes": np.tile(
            np.asarray([100.0, 120.0, 260.0, 280.0], np.float32), (B, T, 1)
        ),
        "bbox_tight": np.tile(
            np.asarray([120.0, 140.0, 240.0, 260.0], np.float32), (B, T, 1)
        ),
        "joint_img": rng.uniform(100, 300, size=(B, T, 21, 2)).astype(np.float32),
        "joint_cam": joint_cam,
        "joint_valid": np.ones((B, T, 21), np.float32),
        "mano_pose": rng.normal(scale=0.1, size=(B, T, 48)).astype(np.float32),
        "mano_shape": rng.normal(scale=0.5, size=(B, T, 10)).astype(np.float32),
        "timestamp": np.tile(np.arange(T, dtype=np.float32) * 33.333, (B, 1)),
        "focal": np.full((B, T, 2), 600.0, np.float32),
        "princpt": np.full((B, T, 2), 320.0, np.float32),
    }
