"""Shared CLI plumbing: config tiers, model/dataset construction, init."""

from __future__ import annotations

import json
import os
import os.path as osp
from typing import Optional

import jax
import numpy as np

from ..config import FinetuneConfig
from ..data import ConcatDataset, DataLoader, DexYCB, HO3D, InterHand26MSeq
from ..mano import ManoLayer, find_and_load, sh_joint_regressor
from ..mano.assets import synthetic_assets
from ..models import Poser, PoserConfig

_ASSET_DIR = osp.join(osp.dirname(__file__), "..", "assets")


def load_or_create_config(exp: str, args_dict: dict, ckpt_root: str = "./checkpoints") -> FinetuneConfig:
    """Reference precedence (`scripts/finetune.py:423-437`): json wins over CLI."""
    cfg_path = osp.join(ckpt_root, exp, "config.json")
    if osp.exists(cfg_path):
        cfg = FinetuneConfig.from_json_file(cfg_path)
        if "epoch" in args_dict and args_dict["epoch"] is not None:
            cfg.epoch = args_dict["epoch"]
        print("Config loaded from file")
    else:
        cfg = FinetuneConfig()
        cfg.update({k: v for k, v in args_dict.items() if hasattr(cfg, k)})
        if jax.process_index() == 0:
            os.makedirs(osp.dirname(cfg_path), exist_ok=True)
            with open(cfg_path, "w") as f:
                f.write(cfg.to_json())
        print("Config loaded from command")
    return cfg


def _backbone_arch_name(backbone: Optional[str]) -> str:
    """Resolve an arch name from either a name or a local HF checkpoint dir.

    The reference passes an HF checkpoint path as --backbone
    (`scripts/finetune.py:368-370`); we accept both that and plain names.
    """
    if not backbone:
        return "swinv2-tiny-256"
    if osp.isdir(backbone):
        with open(osp.join(backbone, "config.json")) as f:
            hf = json.load(f)
        return "swinv2-base-256" if hf.get("embed_dim", 96) >= 128 else "swinv2-tiny-256"
    return backbone


def load_backbone_params(backbone_dir: str, swin_config) -> Optional[dict]:
    """Load pretrained HF Swinv2 weights from a local checkpoint directory."""
    from ..models.swinv2 import convert_hf_swinv2_state_dict

    st_path = osp.join(backbone_dir, "model.safetensors")
    bin_path = osp.join(backbone_dir, "pytorch_model.bin")
    if osp.exists(st_path):
        from safetensors.numpy import load_file

        sd = load_file(st_path)
    elif osp.exists(bin_path):
        import torch

        sd = {
            k: v.numpy()
            for k, v in torch.load(bin_path, map_location="cpu").items()
        }
    else:
        return None
    return convert_hf_swinv2_state_dict(sd, swin_config)


def resolve_attention_impl(impl: str) -> str:
    """'auto' -> the fused whole-block Pallas kernel on TPU (1109 vs 796
    crops/s at Swin-B/256 batch 64), plain XLA elsewhere (the kernel would
    run in slow interpret mode on CPU)."""
    if impl != "auto":
        return impl
    import jax

    return "fused" if jax.default_backend() == "tpu" else "xla"


def poser_config_from(cfg: FinetuneConfig) -> PoserConfig:
    return PoserConfig(
        backbone=_backbone_arch_name(cfg.backbone),
        num_pose_query=cfg.num_joints,
        num_spatial_layer=cfg.num_spatial_layer,
        spatial_layer_type=cfg.spatial_layer_type,
        num_temporal_layer=cfg.num_temporal_layer,
        temporal_init_method=cfg.temporal_init_method,
        expansion_ratio=cfg.expansion_ratio,
        temporal_supervision=cfg.temporal_supervision,
        trope_scalar=cfg.trope_scalar,
        num_latent_layer=cfg.num_latent_layer,
        persp_embed_method=cfg.persp_embed_method,
        persp_decorate=cfg.persp_decorate,
        image_size=cfg.img_size,
        global_positioning=cfg.global_positioning,
        # tp>1: GSPMD has no partitioning rule for the fused pallas_call
        attention_impl="xla" if getattr(cfg, "tp", 1) > 1
        else resolve_attention_impl(cfg.attention_impl),
        remat=cfg.remat,
    )


def build_model(cfg: FinetuneConfig, allow_synthetic_mano: bool = True) -> Poser:
    pcfg = poser_config_from(cfg)
    assets = find_and_load(
        cfg.mano_model_dir, is_rhand=True, allow_synthetic=allow_synthetic_mano
    )
    if assets.synthetic:
        print(
            "WARNING: using synthetic MANO assets (set MANO_MODEL_DIR or "
            "cfg.mano_model_dir for real FK outputs)"
        )
    mano = ManoLayer(assets, flat_hand_mean=False)
    jreg = np.load(osp.join(_ASSET_DIR, "sh_joint_regressor.npy"))
    return Poser(config=pcfg, mano=mano, j_regressor=jreg)


def init_variables(model: Poser, cfg: FinetuneConfig, seq_len: int):
    """Trace phase='inference' so the complete param tree exists."""
    import jax.numpy as jnp

    B, T, S = 1, seq_len, cfg.img_size
    batch = {
        "patches": jnp.zeros((B, T, S, S, 3), jnp.float32),
        "square_bboxes": jnp.tile(
            jnp.asarray([0.0, 0.0, float(S), float(S)]), (B, T, 1)
        ),
        "joint_cam": jnp.zeros((B, T, 21, 3)),
        "joint_valid": jnp.ones((B, T, 21)),
        "mano_shape": jnp.zeros((B, T, 10)),
        "timestamp": jnp.tile(jnp.arange(T, dtype=jnp.float32) * 33.3, (B, 1)),
        "focal": jnp.full((B, T, 2), 500.0),
        "princpt": jnp.full((B, T, 2), S / 2.0),
    }
    rngs = {
        "params": jax.random.key(42),
        "droppath": jax.random.key(1),
        "latent": jax.random.key(2),
    }
    return model.init(rngs, batch, phase="inference")


def build_datasets(cfg: FinetuneConfig, split: str) -> ConcatDataset:
    """ConcatDataset of the selected sources (ref `finetune.py:66-102`)."""
    num_frames = 1 if cfg.phase == "spatial" else (cfg.seq_len or 7)
    data = cfg.data if isinstance(cfg.data, (list, tuple)) else [cfg.data]
    datasets = []
    for name in data:
        if name == "interhand26m":
            datasets.append(
                InterHand26MSeq(
                    cfg.ih26mseq_root, num_frames,
                    "train" if split == "train" else "test",
                    img_size=cfg.img_size, expansion_ratio=cfg.expansion_ratio,
                )
            )
        elif name == "ho3d":
            datasets.append(
                HO3D(
                    cfg.ho3d_root, num_frames,
                    "train" if split == "train" else "evaluation",
                    img_size=cfg.img_size, expansion_ratio=cfg.expansion_ratio,
                )
            )
        elif name == "dexycb":
            datasets.append(
                DexYCB(
                    cfg.dexycb_root, num_frames, "s1",
                    "train" if split == "train" else "test",
                    img_size=cfg.img_size, expansion_ratio=cfg.expansion_ratio,
                )
            )
        else:
            raise ValueError(f"unknown dataset: {name}")
        print(f"Added {name}")
    return ConcatDataset(datasets)


def build_loader(cfg: FinetuneConfig, dataset, shuffle: bool) -> DataLoader:
    return DataLoader(
        dataset,
        batch_size=cfg.batch_size,
        shuffle=shuffle,
        drop_last=True,  # static shapes for jit: every step sees batch_size
        seed=42,
        num_shards=jax.process_count(),
        shard_index=jax.process_index(),
        num_workers=cfg.num_workers,
    )


def maybe_init_distributed():
    """jax.distributed.initialize from env when launched multi-host."""
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()
