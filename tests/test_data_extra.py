"""Tests for HO3D_FS and the TI-pretraining image datasets."""

import numpy as np
import pytest

from cs_vit_tpu.data import COCO2017, Ego4DHandImage, HIntHandImage, HO3D_FS
from cs_vit_tpu.data.fixtures import (
    make_synthetic_ego4d,
    make_synthetic_hint,
    make_synthetic_ho3d_fs,
    make_synthetic_image_folder,
)

T = 3
IMG = 32


def test_ho3d_fs(tmp_path):
    root = make_synthetic_ho3d_fs(str(tmp_path / "ho3dfs"), seq_len=6)
    ds = HO3D_FS(root, T, "evaluation", img_size=IMG)
    assert len(ds) == 6 - T + 1
    item = ds[0]
    assert item["patches"].shape == (T, IMG, IMG, 3)
    assert item["joint_cam"].shape == (T, 21, 3)
    assert item["mano_pose"].shape == (T, 48)
    # OpenGL -> camera conversion must land hands in front of the camera
    assert np.all(item["joint_cam"][..., 2] > 0)
    # projection consistency: joint_img == project(joint_cam)
    jc, ji = item["joint_cam"], item["joint_img"]
    f, c = item["focal"], item["princpt"]
    u = f[:, :1] * jc[..., 0] / jc[..., 2] + c[:, :1]
    v = f[:, 1:] * jc[..., 1] / jc[..., 2] + c[:, 1:]
    np.testing.assert_allclose(np.stack([u, v], -1), ji, atol=1e-2)


def test_coco2017(tmp_path):
    root = make_synthetic_image_folder(str(tmp_path / "coco"), n=5)
    ds = COCO2017(root, img_size=IMG)
    assert len(ds) == 5
    img = ds[0]
    assert img.shape == (IMG, IMG, 3)
    assert img.dtype == np.float32
    assert 0.0 <= img.min() and img.max() <= 1.0
    # no-augment mode resizes deterministically
    ds2 = COCO2017(root, img_size=IMG, default_augment=False)
    np.testing.assert_array_equal(ds2[1], ds2[1])


def test_ego4d(tmp_path):
    root = make_synthetic_ego4d(str(tmp_path / "ego4d"))
    ds = Ego4DHandImage(
        root, img_size=IMG, cache_dir=str(tmp_path / "cache_e")
    )
    assert len(ds) == 3
    crop = ds[0]
    assert crop.shape == (IMG, IMG, 3)
    assert np.isfinite(crop).all()
    # index cache is reused
    ds2 = Ego4DHandImage(root, img_size=IMG, cache_dir=str(tmp_path / "cache_e"))
    assert len(ds2) == 3


def test_hint(tmp_path):
    root = make_synthetic_hint(str(tmp_path / "hint"), part="newdays")
    ds = HIntHandImage(
        root, img_size=IMG, parts=["newdays"], cache_dir=str(tmp_path / "cache_h")
    )
    assert len(ds) == 4
    crop = ds[0]
    assert crop.shape == (IMG, IMG, 3)
    assert np.isfinite(crop).all()


def test_crop_with_normalized_box_aspect():
    from cs_vit_tpu.ops.resample import crop_with_normalized_box_np

    img = np.arange(40 * 60 * 1, dtype=np.float32).reshape(40, 60, 1) / (40 * 60)
    # narrow box -> widened to match 1:1 output ratio
    out = crop_with_normalized_box_np(img, [0.4, 0.1, 0.5, 0.9], (16, 16))
    assert out.shape == (16, 16, 1)
    assert np.isfinite(out).all()


def test_ih26m_legacy_loader(tmp_path):
    from cs_vit_tpu.data import InterHand26M
    from cs_vit_tpu.data.fixtures import make_synthetic_ih26m_legacy

    root = make_synthetic_ih26m_legacy(str(tmp_path / "ih26m_legacy"))
    ds = InterHand26M(root, "test", img_size=IMG)
    assert len(ds) == 4
    rec = ds.datalist[0]
    assert rec["hand_type"] == "interacting"
    assert rec["joint_cam"].shape == (42, 3)
    assert rec["rhand_bbox"] is not None and rec["lhand_bbox"] is not None
    # joint_img consistent with pinhole projection of joint_cam
    jc, ji = rec["joint_cam"], rec["joint_img"]
    f, c = rec["cam_param"]["focal"], rec["cam_param"]["princpt"]
    u = f[0] * jc[:, 0] / jc[:, 2] + c[0]
    np.testing.assert_allclose(ji[:, 0], u, atol=1e-3)

    item = ds[0]
    assert item["right_patch"].shape == (IMG, IMG, 3)
    assert item["left_valid"] and item["right_valid"]
    assert item["joint_valid"].shape == (42,)


def test_ih26m_legacy_aid_list(tmp_path):
    """Test-split aid-list gating (ref `InterHand26M.py:116-124`,
    `aid_human_annot_test.txt`): only listed annotation ids are loaded."""
    from cs_vit_tpu.data import InterHand26M
    from cs_vit_tpu.data.fixtures import make_synthetic_ih26m_legacy

    root = make_synthetic_ih26m_legacy(str(tmp_path / "ih26m_legacy"))
    aid_file = tmp_path / "aid_human_annot_test.txt"
    aid_file.write_text("1\n3\n")

    full = InterHand26M(root, "test", img_size=IMG)
    ds = InterHand26M(root, "test", img_size=IMG, aid_list_path=str(aid_file))
    assert len(full) == 4 and len(ds) == 2
    # item 1 in the gated dataset is annotation id 3 (single right hand)
    assert ds.datalist[1]["hand_type"] == "right"
    item = ds[0]
    assert item["right_patch"].shape == (IMG, IMG, 3)


def test_ih26m_legacy_train_item(tmp_path):
    """Two-hand InterWild train-item assembly (ref `InterHand26M.py:346-596`):
    body-patch augmentation, heatmap-space hand bboxes, 42-joint 2.5D +
    MANO GT targets in TH order, per-hand sub-crops."""
    from cs_vit_tpu.data import InterHand26M
    from cs_vit_tpu.data.fixtures import make_synthetic_ih26m_legacy
    from cs_vit_tpu.data.ih26m_legacy import IH26M_42_JOINTS, TH_42_JOINTS
    from cs_vit_tpu.data.ih26m_legacy_aug import LegacyAugConfig
    from cs_vit_tpu.core.joints import reorder_indices

    root = make_synthetic_ih26m_legacy(str(tmp_path / "ih26m_legacy"))
    ds = InterHand26M(root, "test", img_size=IMG)
    cfg = LegacyAugConfig()

    # eval split: deterministic path (scale 1, rot 0, no flip)
    item = ds.train_item(0, hand_img_size=64)
    inp, tgt, meta = item["inputs"], item["targets"], item["meta_info"]
    assert inp["img"].shape == (*cfg.input_img_shape, 3)
    assert inp["lhand_img"].shape == (64, 64, 3)
    assert inp["rhand_img"].shape == (64, 64, 3)
    assert tgt["joint_img"].shape == (42, 3)
    assert tgt["mano_mesh_cam"].shape == (2 * 778, 3)
    assert tgt["mano_pose"].shape == (96,)
    assert meta["joint_trunc"].shape == (42, 1)
    assert meta["lhand_bbox_valid"] == 1.0 and meta["rhand_bbox_valid"] == 1.0
    for v in (tgt["joint_cam"], tgt["mano_joint_img"], tgt["rel_trans"]):
        assert np.isfinite(np.asarray(v)).all()

    # order change: outputs are TH (Wrist-first) reordered from IH26M
    # annotation order; with no aug the cam joints are just the
    # root-relative annotation joints permuted
    idx = reorder_indices(IH26M_42_JOINTS, TH_42_JOINTS)
    rec = ds.datalist[0]
    jc = rec["joint_cam"].copy() / 1000.0
    jc[:21] -= jc[IH26M_42_JOINTS.index("R_Wrist"), None]
    jc[21:] -= jc[IH26M_42_JOINTS.index("L_Wrist"), None]
    np.testing.assert_allclose(tgt["joint_cam"], jc[idx], atol=1e-5)
    # TH wrists are rows 0 and 21
    np.testing.assert_allclose(tgt["joint_cam"][0], 0.0, atol=1e-6)
    np.testing.assert_allclose(tgt["joint_cam"][21], 0.0, atol=1e-6)

    # train split: stochastic aug path runs and stays finite/in-range
    ds.data_split = "train"
    for seed in (0, 1):
        item = ds.train_item(1, rng=np.random.default_rng(seed), hand_img_size=64)
        assert item["inputs"]["img"].shape == (*cfg.input_img_shape, 3)
        assert float(item["inputs"]["img"].min()) >= 0.0
        assert float(item["inputs"]["img"].max()) <= 1.2  # color scale <= 1.2
        assert np.isfinite(item["targets"]["joint_img"]).all()
        assert np.isfinite(item["targets"]["mano_pose"]).all()
        tr = item["meta_info"]["mano_joint_trunc"]
        assert tr.shape == (42, 1) and set(np.unique(tr)) <= {0.0, 1.0}


def test_mano_gt_synthesizer():
    from cs_vit_tpu.data.mano_gt import ManoGTSynthesizer
    from cs_vit_tpu.mano import synthetic_assets

    rng = np.random.default_rng(9)
    synth = ManoGTSynthesizer(synthetic_assets(seed=0))
    mano_param = {
        "pose": rng.normal(scale=0.3, size=48),
        "shape": rng.normal(scale=0.5, size=10),
        "trans": [0.02, -0.01, 0.5],
    }
    cam = {
        "R": np.eye(3), "t": np.zeros(3),
        "focal": [240.0, 240.0], "princpt": [80.0, 60.0],
    }
    ji, jc, mesh, pose, shape = synth(mano_param, cam, do_flip=False)
    assert ji.shape == (21, 2) and jc.shape == (21, 3) and mesh.shape == (778, 3)
    # projection consistency
    u = 240.0 * jc[:, 0] / jc[:, 2] + 80.0
    np.testing.assert_allclose(ji[:, 0], u, atol=1e-4)

    # identity extrinsics: camera coords == world MANO output
    # non-identity R rotates the root pose; result must stay finite
    cam2 = dict(cam)
    from scipy.spatial.transform import Rotation

    cam2["R"] = Rotation.from_euler("y", 0.4).as_matrix()
    cam2["t"] = np.asarray([0.01, 0.0, 0.02])
    _, jc2, mesh2, _, _ = synth(mano_param, cam2, do_flip=False)
    assert np.isfinite(jc2).all() and np.isfinite(mesh2).all()
    assert not np.allclose(jc, jc2)

    # flip path needs img_shape
    ji3, jc3, mesh3, pose3, _ = synth(
        mano_param, cam, do_flip=True, img_shape=(120, 160)
    )
    assert np.isfinite(jc3).all()
    # flipped root pose mirrors y/z axis-angle components
    np.testing.assert_allclose(pose3[1:3], -np.asarray(pose[1:3]), atol=1e-5)
