"""Integration-level numerical parity: full Poser graph vs the ACTUAL reference.

Imports `/root/reference/cs_vit/net/ti_poser.py` (the real torch `Poser`) by
stubbing its unavailable deps (`smplx`, `kornia`, `torchvision`) with
`sys.modules` fakes, builds a tiny random-init reference model on a saved HF
SwinV2 checkpoint, loads its weights into our flax `Poser` through
`train.convert.convert_poser_state_dict`, and asserts `_decode_pose`,
`predict_batch` and `_criterion` agree end-to-end — across both perspective
embed methods, both spatial layer types, full + realtime temporal encoders,
latent-2x doubling (with pinned RNG on both sides), and eval AND train
BatchNorm modes (ref `ti_poser.py:404-559, 641-722, 724-778`).

The `smplx` stub wraps OUR JAX `ManoLayer` on synthetic assets, so the
reference `_pose_fk` runs through the same LBS — this file pins the *graph*
(token routing, perspective decoration, spatial/temporal fusion, heads, the
latent un-rotation, FK glue math in mm, loss reductions); MANO-vs-smplx
exactness is covered separately in tests/test_mano.py.

The `global_positioning="orientation"` path is deliberately NOT compared
end-to-end: the reference calls `matrix_to_axis_angle` on an axis-angle
*vector* (`ti_poser.py:709`), producing shape-broadcast garbage; our
implementation applies the documented intent (see PARITY.md).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "cs_vit")), reason="reference not mounted"
)
torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from cs_vit_tpu.models import Poser, PoserConfig  # noqa: E402
from cs_vit_tpu.models.swinv2 import SwinV2Config  # noqa: E402
from cs_vit_tpu.train.convert import convert_poser_state_dict  # noqa: E402

from .helpers import import_reference, ref_stub_mano  # noqa: E402

# one shared MANO — the same layer the smplx stub forwards through
_MANO = ref_stub_mano(is_rhand=True)
_JREG = np.load(os.path.join(REF, "cs_vit/net/sh_joint_regressor.npy")).astype(
    np.float32
)

try:
    ti_poser = import_reference("net.ti_poser")
except Exception as e:  # pragma: no cover
    pytest.skip(f"cannot import reference ti_poser: {e}", allow_module_level=True)


# --- tiny backbone configs ---------------------------------------------------

# 2-stage: hidden 16, 4x4=16 patch tokens at 32px (latent tests need 4 stages
# because the reference hardcodes num_p = image_size//32, `ti_poser.py:255`)
TINY2 = dict(image_size=32, patch_size=4, embed_dim=8, depths=(1, 1),
             num_heads=(2, 2), window_size=4)
TINY4 = dict(image_size=64, patch_size=4, embed_dim=4, depths=(1, 1, 1, 1),
             num_heads=(1, 1, 2, 2), window_size=4)


@pytest.fixture(scope="module")
def backbone_dirs(tmp_path_factory):
    """Save tiny random-init HF Swinv2 checkpoints for AutoModel.from_pretrained."""
    dirs = {}
    for name, spec in (("tiny2", TINY2), ("tiny4", TINY4)):
        d = tmp_path_factory.mktemp(f"hf_swin_{name}")
        hf_cfg = transformers.Swinv2Config(
            image_size=spec["image_size"],
            patch_size=spec["patch_size"],
            num_channels=3,
            embed_dim=spec["embed_dim"],
            depths=list(spec["depths"]),
            num_heads=list(spec["num_heads"]),
            window_size=spec["window_size"],
            mlp_ratio=4.0,
            qkv_bias=True,
            hidden_dropout_prob=0.0,
            attention_probs_dropout_prob=0.0,
            drop_path_rate=0.0,
            pretrained_window_sizes=[0] * len(spec["depths"]),
        )
        torch.manual_seed(0)
        transformers.Swinv2Model(hf_cfg, add_pooling_layer=False).save_pretrained(d)
        dirs[name] = str(d)
    return dirs


def build_pair(backbone_dirs, *, swin="tiny2", seed=3, **kw):
    """(reference torch Poser, our flax Poser, converted params/stats)."""
    spec = TINY2 if swin == "tiny2" else TINY4
    torch.manual_seed(seed)
    ref = ti_poser.Poser(
        backbone=backbone_dirs[swin],
        num_pose_query=16,
        num_spatial_layer=2,
        num_temporal_layer=1,
        smplx_path="/nonexistent",  # smplx stub ignores it
        image_size=spec["image_size"],
        **kw,
    )
    ref.eval()

    cfg = PoserConfig(
        backbone="custom",
        custom_swin=SwinV2Config(
            image_size=spec["image_size"],
            patch_size=spec["patch_size"],
            embed_dim=spec["embed_dim"],
            depths=spec["depths"],
            num_heads=spec["num_heads"],
            window_size=spec["window_size"],
            drop_path_rate=0.0,
            pretrained_window_sizes=(0,) * len(spec["depths"]),
        ),
        image_size=spec["image_size"],
        num_pose_query=16,
        num_spatial_layer=2,
        num_temporal_layer=1,
        **kw,
    )
    ours = Poser(config=cfg, mano=_MANO, j_regressor=_JREG)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params, stats = convert_poser_state_dict(sd, cfg)
    return ref, ours, {"params": params, "batch_stats": stats}


def make_inputs(rng, B, T, img):
    imgs = rng.uniform(size=(B, T, 3, img, img)).astype(np.float32)
    bboxes = np.stack(
        [
            rng.uniform(50, 120, size=(B, T)),
            rng.uniform(60, 130, size=(B, T)),
            rng.uniform(260, 380, size=(B, T)),
            rng.uniform(270, 390, size=(B, T)),
        ],
        axis=-1,
    ).astype(np.float32)
    ts = np.tile(np.arange(T, dtype=np.float32) * 33.333, (B, 1))
    focal = rng.uniform(500, 700, size=(B, T, 2)).astype(np.float32)
    princpt = rng.uniform(300, 340, size=(B, T, 2)).astype(np.float32)
    return imgs, bboxes, ts, focal, princpt


def ref_predict(ref, imgs, bboxes, ts, focal, princpt):
    with torch.no_grad():
        return {
            k: v.numpy()
            for k, v in ref.predict_batch(
                torch.from_numpy(imgs),
                torch.from_numpy(bboxes.copy()),  # ref mutates in orientation mode
                torch.from_numpy(ts),
                torch.from_numpy(focal),
                torch.from_numpy(princpt),
            ).items()
        }


def our_predict(ours, variables, imgs, bboxes, ts, focal, princpt, phase, rngs=None):
    out = ours.apply(
        variables,
        jnp.asarray(imgs.transpose(0, 1, 3, 4, 2)),  # NCHW -> NHWC
        jnp.asarray(bboxes),
        jnp.asarray(ts),
        jnp.asarray(focal),
        jnp.asarray(princpt),
        phase,
        method=ours.predict,
        rngs=rngs,
        mutable=["batch_stats"] if phase != "inference" else False,
    )
    if phase != "inference":
        out = out[0]
    return {k: np.asarray(v) for k, v in out.items()}


def assert_predict_close(got, want, atol_mm=2e-3):
    # mm-scale outputs vs unit-scale params: separate tolerances
    np.testing.assert_allclose(got["pose_aa"], want["pose_aa"], atol=1e-5)
    np.testing.assert_allclose(got["shape"], want["shape"], atol=1e-5)
    np.testing.assert_allclose(
        got["root_transl_norm"], want["root_transl_norm"], atol=1e-5
    )
    np.testing.assert_allclose(got["root_transl"], want["root_transl"], atol=atol_mm)
    np.testing.assert_allclose(got["joint_cam"], want["joint_cam"], atol=atol_mm)
    np.testing.assert_allclose(got["verts_cam"], want["verts_cam"], atol=atol_mm)


@pytest.mark.parametrize(
    "kw,T",
    [
        (dict(temporal_supervision="full"), 5),
        (dict(temporal_supervision="realtime"), 5),
        (dict(temporal_supervision="full", persp_embed_method="sparse"), 1),
        (dict(temporal_supervision="full", spatial_layer_type="encoder"), 1),
    ],
    ids=["full-T5", "realtime-T5", "sparse-persp", "encoder-spatial"],
)
def test_poser_full_graph_eval(backbone_dirs, rng, kw, T):
    """predict_batch parity, inference phase (eval BN), temporal encoders live."""
    ref, ours, variables = build_pair(
        backbone_dirs, temporal_init_method="random", **kw
    )
    ref.phase(ti_poser.Poser.TrainingPhase.INFERENCE)
    imgs, bboxes, ts, focal, princpt = make_inputs(rng, 2, T, 32)
    want = ref_predict(ref, imgs, bboxes, ts, focal, princpt)
    got = our_predict(ours, variables, imgs, bboxes, ts, focal, princpt, "inference")
    if kw["temporal_supervision"] == "realtime":
        assert got["joint_cam"].shape[1] == 1  # collapses to last frame
    assert_predict_close(got, want)


def test_poser_full_graph_train_bn_spatial(backbone_dirs, rng):
    """Spatial phase: backbone/persp/spatial BN in TRAIN mode (batch stats),
    temporal encoders skipped (ref `_decode_pose` phase branch)."""
    ref, ours, variables = build_pair(backbone_dirs, temporal_supervision="full")
    ref.phase(ti_poser.Poser.TrainingPhase.SPATIAL)
    imgs, bboxes, ts, focal, princpt = make_inputs(rng, 4, 1, 32)
    want = ref_predict(ref, imgs, bboxes, ts, focal, princpt)
    got = our_predict(
        ours, variables, imgs, bboxes, ts, focal, princpt, "spatial",
        rngs={"droppath": jax.random.key(0)},
    )
    assert_predict_close(got, want)


def test_poser_full_graph_train_bn_temporal(backbone_dirs, rng):
    """Temporal phase: backbone/spatial BN in EVAL mode, temporal encoder BN in
    TRAIN mode — the exact per-submodule split of ref `phase()` (`ti_poser.py:367-393`)."""
    ref, ours, variables = build_pair(
        backbone_dirs, temporal_supervision="full", temporal_init_method="random"
    )
    ref.phase(ti_poser.Poser.TrainingPhase.TEMPORAL)
    imgs, bboxes, ts, focal, princpt = make_inputs(rng, 2, 5, 32)
    want = ref_predict(ref, imgs, bboxes, ts, focal, princpt)
    got = our_predict(
        ours, variables, imgs, bboxes, ts, focal, princpt, "temporal",
        rngs={"droppath": jax.random.key(0)},
    )
    assert_predict_close(got, want)


def test_poser_full_graph_latent2x(backbone_dirs, rng, monkeypatch):
    """Latent scale/rot doubling: predict returns [2B,...]; the transformed
    half is un-rotated/un-scaled (`ti_poser.py:537-557`). RNG pinned to the
    same draws on both sides."""
    B = 2
    scale_raw = np.asarray([0.1, -0.2], np.float32)   # within clamp(-0.3, 0.3)
    angle_u = np.asarray([0.3, 0.7], np.float32)

    def fake_torch_randn(*a, size=None, device=None, dtype=None, **kw):
        if size == (B,):
            return torch.from_numpy(scale_raw.copy())
        return _orig_randn(*a, size=size, device=device, dtype=dtype, **kw)

    def fake_torch_rand(*a, size=None, device=None, dtype=None, **kw):
        if size == (B,):
            return torch.from_numpy(angle_u.copy())
        return _orig_rand(*a, size=size, device=device, dtype=dtype, **kw)

    _orig_randn, _orig_rand = torch.randn, torch.rand
    monkeypatch.setattr(torch, "randn", fake_torch_randn)
    monkeypatch.setattr(torch, "rand", fake_torch_rand)

    _orig_jnormal, _orig_juniform = jax.random.normal, jax.random.uniform

    def fake_jax_normal(key, shape=(), dtype=jnp.float32):
        if tuple(shape) == (B,):
            return jnp.asarray(scale_raw)
        return _orig_jnormal(key, shape, dtype)

    def fake_jax_uniform(key, shape=(), dtype=jnp.float32, minval=0.0, maxval=1.0):
        if tuple(shape) == (B,):
            return jnp.asarray(angle_u)
        return _orig_juniform(key, shape, dtype, minval, maxval)

    monkeypatch.setattr(jax.random, "normal", fake_jax_normal)
    monkeypatch.setattr(jax.random, "uniform", fake_jax_uniform)

    ref, ours, variables = build_pair(
        backbone_dirs,
        swin="tiny4",
        temporal_supervision="full",
        num_latent_layer=1,
        persp_decorate="patch",
    )
    ref.phase(ti_poser.Poser.TrainingPhase.INFERENCE)
    imgs, bboxes, ts, focal, princpt = make_inputs(rng, B, 1, 64)
    want = ref_predict(ref, imgs, bboxes, ts, focal, princpt)
    got = our_predict(
        ours, variables, imgs, bboxes, ts, focal, princpt, "inference",
        rngs={"latent": jax.random.key(0)},
    )
    assert got["joint_cam"].shape[0] == 2 * B
    assert_predict_close(got, want, atol_mm=5e-3)


@pytest.mark.parametrize(
    "supervision,phase,T",
    [("full", "spatial", 1), ("full", "temporal", 5), ("realtime", "temporal", 5)],
)
def test_poser_criterion_parity(backbone_dirs, rng, supervision, phase, T):
    """_criterion: masked fro-norm means + L1 shape + 1e-2 smoothness
    (ref `ti_poser.py:724-778`), incl. the realtime last-frame selection."""
    ref, ours, variables = build_pair(
        backbone_dirs, temporal_supervision=supervision
    )
    ref.phase(
        ti_poser.Poser.TrainingPhase.SPATIAL
        if phase == "spatial"
        else ti_poser.Poser.TrainingPhase.TEMPORAL
    )
    B = 3
    T_pred = 1 if supervision == "realtime" else T
    predict = {
        "joint_cam": rng.normal(scale=30.0, size=(B, T_pred, 21, 3)).astype(np.float32),
        "shape": rng.normal(size=(B, T_pred, 10)).astype(np.float32),
    }
    batch = {
        "joint_cam": rng.normal(scale=30.0, size=(B, T, 21, 3)).astype(np.float32),
        "joint_valid": (rng.uniform(size=(B, T, 21)) > 0.2).astype(np.float32),
        "mano_shape": rng.normal(size=(B, T, 10)).astype(np.float32),
    }
    # reference criterion indexes predict with the same time indices as batch
    ref_predict_t = {
        k: torch.from_numpy(
            np.broadcast_to(v[:, -1:], (B, T) + v.shape[2:]).copy()
            if supervision == "realtime"
            else v
        )
        for k, v in predict.items()
    }
    ref_batch_t = {k: torch.from_numpy(v) for k, v in batch.items()}
    with torch.no_grad():
        want_loss, want_logs = ref._criterion(ref_predict_t, ref_batch_t)

    our_predict_d = {k: jnp.asarray(v) for k, v in predict.items()}
    # our criterion's tsel handles the realtime slice itself
    if supervision == "realtime":
        our_batch = {k: jnp.asarray(v) for k, v in batch.items()}
        our_predict_d = {
            k: jnp.broadcast_to(v[:, -1:], (B, T) + v.shape[2:])
            for k, v in our_predict_d.items()
        }
    else:
        our_batch = {k: jnp.asarray(v) for k, v in batch.items()}
    got_loss, got_logs = ours.apply(
        variables, our_predict_d, our_batch, phase, method=ours.criterion
    )
    np.testing.assert_allclose(float(got_loss), float(want_loss), rtol=1e-5)
    for k in ("cam", "rel", "shape", "loss_vel", "loss_accel"):
        np.testing.assert_allclose(
            float(got_logs[k]), float(want_logs[k]), rtol=1e-5, atol=1e-7
        )
