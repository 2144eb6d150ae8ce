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


# ---------------------------------------------------------------------------
# Reference-import machinery (tests that compare against /root/reference)
# ---------------------------------------------------------------------------

REF_DIR = "/root/reference"

# The assets behind the smplx stub — same construction as tiny_poser's MANO.
_REF_STUB_ASSETS = {True: synthetic_assets(seed=1, is_rhand=True),
                    False: synthetic_assets(seed=1, is_rhand=False)}


def ref_stub_mano(is_rhand: bool = True) -> ManoLayer:
    """The JAX ManoLayer the smplx stub forwards through."""
    return ManoLayer(_REF_STUB_ASSETS[is_rhand], flat_hand_mean=False)


def install_reference_stubs():
    """sys.modules fakes for smplx / kornia / torchvision so reference modules
    (`cs_vit/net/ti_poser.py`, `cs_vit/utils/mano.py`, `cs_vit/utils/img.py`)
    import without their CUDA-era deps. The smplx stub carries the synthetic
    assets' J_regressor/shapedirs/faces (for `utils/mano.py`'s regressor
    assembly) and forwards FK through our JAX ManoLayer (for `_pose_fk`)."""
    import sys
    import types

    import torch

    if "smplx" in sys.modules and getattr(sys.modules["smplx"], "_csvit_stub", False):
        return

    class _StubManoOut:
        def __init__(self, vertices):
            self.vertices = vertices

    class _StubSmplxMano(torch.nn.Module):
        def __init__(self, is_rhand: bool):
            super().__init__()
            import numpy as _np

            assets = _REF_STUB_ASSETS[is_rhand]
            self._layer = ref_stub_mano(is_rhand)
            # attribute surface used by reference `cs_vit/utils/mano.py`
            self.J_regressor = torch.from_numpy(
                _np.asarray(assets.j_regressor, _np.float32)
            )
            self.shapedirs = torch.from_numpy(
                _np.asarray(assets.shapedirs, _np.float32)
            )
            self.faces = assets.faces

        def forward(self, betas, global_orient, hand_pose, transl=None, **kw):
            import jax.numpy as jnp
            import numpy as _np

            out = self._layer(
                jnp.asarray(betas.detach().cpu().numpy()),
                jnp.asarray(global_orient.detach().cpu().numpy()),
                jnp.asarray(hand_pose.detach().cpu().numpy()),
            )
            v = torch.from_numpy(_np.asarray(out["vertices"], _np.float32))
            if transl is not None:
                v = v + transl[:, None]
            return _StubManoOut(v)

    smplx = types.ModuleType("smplx")
    smplx._csvit_stub = True
    smplx.create = lambda path, kind, is_rhand=True, **kw: _StubSmplxMano(is_rhand)
    sys.modules["smplx"] = smplx

    kornia = types.ModuleType("kornia")
    kgeo = types.ModuleType("kornia.geometry")
    ktrans = types.ModuleType("kornia.geometry.transform")

    def _unused(*a, **kw):
        raise NotImplementedError("kornia stub")

    for m in (kornia, kgeo, ktrans):
        m.rotate = _unused
        m.crop_and_resize = _unused
    kornia.geometry = kgeo
    kgeo.transform = ktrans
    sys.modules["kornia"] = kornia
    sys.modules["kornia.geometry"] = kgeo
    sys.modules["kornia.geometry.transform"] = ktrans

    tv = types.ModuleType("torchvision")
    tvt = types.ModuleType("torchvision.transforms")
    tvf = types.ModuleType("torchvision.transforms.functional")

    class _Normalize:
        def __init__(self, mean, std, inplace=False):
            self.mean, self.std = mean, std

        def __call__(self, x):
            m = torch.tensor(self.mean, dtype=x.dtype).view(-1, 1, 1)
            s = torch.tensor(self.std, dtype=x.dtype).view(-1, 1, 1)
            return (x - m) / s

    class _Compose:
        def __init__(self, fs):
            self.fs = fs

        def __call__(self, x):
            for f in self.fs:
                x = f(x)
            return x

    tvt.Normalize, tvt.Compose = _Normalize, _Compose
    tv.transforms = tvt
    tvt.functional = tvf
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = tvt
    sys.modules["torchvision.transforms.functional"] = tvf

    # pycocotools / plyfile: imported by the legacy IH26M loader; its
    # evaluate()/print_eval_result() math (what the tests exercise) never
    # touches them
    pct = types.ModuleType("pycocotools")
    pcoco = types.ModuleType("pycocotools.coco")

    class _COCO:  # only constructed by load_data(), which tests bypass
        def __init__(self, *a, **kw):
            raise NotImplementedError("pycocotools stub")

    pcoco.COCO = _COCO
    pct.coco = pcoco
    sys.modules["pycocotools"] = pct
    sys.modules["pycocotools.coco"] = pcoco

    ply = types.ModuleType("plyfile")
    ply.PlyData = ply.PlyElement = None
    sys.modules["plyfile"] = ply


def import_reference(modname: str):
    """Import `cs_vit.<modname>` from /root/reference without running any
    package __init__ (they pull torchvision/smplx/pycocotools at import):
    every parent package of `modname` gets a bare ModuleType with only
    __path__ set, so relative imports resolve to the real files."""
    import importlib
    import os
    import sys
    import types

    install_reference_stubs()
    parts = ["cs_vit"] + modname.split(".")
    for i in range(1, len(parts)):  # all parents of the leaf module
        name = ".".join(parts[:i])
        if name not in sys.modules:
            m = types.ModuleType(name)
            m.__path__ = [os.path.join(REF_DIR, *parts[:i])]
            sys.modules[name] = m
    return importlib.import_module(f"cs_vit.{modname}")
