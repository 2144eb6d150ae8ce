"""Legacy IH26M augmentation pipeline tests."""

import numpy as np
import pytest

from cs_vit_tpu.data.ih26m_legacy_aug import (
    LegacyAugConfig,
    augmentation,
    generate_patch_image,
    get_aug_config,
    transform_db_data,
    transform_mano_data,
)

CFG = LegacyAugConfig(input_img_shape=(64, 48), output_body_hm_shape=(8, 16, 12))


def test_get_aug_config_ranges(rng):
    for _ in range(20):
        scale, rot, color, flip = get_aug_config(rng)
        assert 0.75 <= scale <= 1.25
        assert -60 <= rot <= 60
        assert np.all((color >= 0.8) & (color <= 1.2))
        assert isinstance(flip, bool)


def test_generate_patch_identity_crop(rng):
    img = rng.uniform(0, 255, size=(64, 48, 3)).astype(np.float32)
    # bbox covering the whole image, no scale/rot -> near-identity resample
    patch, trans, inv_trans = generate_patch_image(
        img, [0, 0, 48, 64], 1.0, 0.0, False, (64, 48)
    )
    assert patch.shape == (64, 48, 3)
    # trans and inv_trans compose to identity on points
    from cs_vit_tpu.ops.heatmap import apply_affine

    pts = np.asarray([[5.0, 7.0], [30.0, 50.0]], np.float32)
    back = apply_affine(apply_affine(pts, trans), inv_trans)
    np.testing.assert_allclose(back, pts, atol=1e-3)


def test_augmentation_eval_is_deterministic(rng):
    img = rng.uniform(0, 255, size=(64, 48, 3)).astype(np.float32)
    out1 = augmentation(img, [4, 4, 40, 56], "test", cfg=CFG)
    out2 = augmentation(img, [4, 4, 40, 56], "test", cfg=CFG)
    np.testing.assert_array_equal(out1[0], out2[0])
    assert out1[3] == 0.0 and out1[4] is False


def test_transform_db_data_flip_and_rot(rng):
    J = 42
    joint_img = np.concatenate(
        [rng.uniform(0, 48, (J, 1)), rng.uniform(0, 64, (J, 1)),
         rng.uniform(-0.2, 0.2, (J, 1))], axis=1
    ).astype(np.float32)
    joint_cam = rng.normal(scale=50, size=(J, 3)).astype(np.float32)
    joint_valid = np.ones((J, 1), np.float32)
    rel_trans = np.asarray([10.0, 5.0, -3.0], np.float32)
    flip_pairs = [(i, i + 21) for i in range(21)]
    img2bb = np.asarray([[1, 0, 0], [0, 1, 0]], np.float32)

    ji, jc, jv, jt, rt = transform_db_data(
        joint_img, joint_cam, joint_valid, rel_trans,
        do_flip=True, img_shape=(64, 48), flip_pairs=flip_pairs,
        img2bb_trans=img2bb, rot_deg=0.0, cfg=CFG,
    )
    # flip swaps hands and mirrors x
    np.testing.assert_allclose(jc[0], joint_cam[21] * [-1, 1, 1], atol=1e-5)
    np.testing.assert_allclose(rt[1:], -rel_trans[1:], atol=1e-6)

    # pure rotation: joint_cam rotates about z by -rot
    ji2, jc2, _, _, _ = transform_db_data(
        joint_img, joint_cam, joint_valid, rel_trans,
        do_flip=False, img_shape=(64, 48), flip_pairs=flip_pairs,
        img2bb_trans=img2bb, rot_deg=90.0, cfg=CFG,
    )
    np.testing.assert_allclose(
        np.linalg.norm(jc2, axis=1), np.linalg.norm(joint_cam, axis=1), rtol=1e-5
    )
    assert not np.allclose(jc2, joint_cam)


def test_transform_mano_data_root_rotation(rng):
    J = 42
    joint_img = rng.uniform(0, 40, (J, 3)).astype(np.float32)
    joint_cam = rng.normal(scale=50, size=(J, 3)).astype(np.float32)
    mesh_cam = rng.normal(scale=50, size=(1556, 3)).astype(np.float32)
    pose = rng.normal(scale=0.3, size=(96,)).astype(np.float32)
    img2bb = np.asarray([[1, 0, 0], [0, 1, 0]], np.float32)

    ji, jc, mc, jt, rt, pose_out = transform_mano_data(
        joint_img, joint_cam, mesh_cam, np.ones((J, 1), np.float32),
        np.asarray([1.0, 2.0, 3.0]), pose, img2bb, rot_deg=45.0, cfg=CFG,
    )
    # non-root pose entries untouched; root entries rotated
    pose_out = pose_out.reshape(-1, 3)
    pose_in = pose.reshape(-1, 3)
    np.testing.assert_allclose(pose_out[1:16], pose_in[1:16], atol=1e-6)
    assert not np.allclose(pose_out[0], pose_in[0])
    assert not np.allclose(pose_out[16], pose_in[16])
    # rotation preserves norms of cam-space geometry
    np.testing.assert_allclose(
        np.linalg.norm(mc, axis=1), np.linalg.norm(mesh_cam, axis=1), rtol=1e-5
    )
