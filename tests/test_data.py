"""Data pipeline tests over synthetic H5 fixtures (all three datasets)."""

import numpy as np
import pytest

from cs_vit_tpu.data import ConcatDataset, DataLoader, DexYCB, HO3D, InterHand26MSeq, collate
from cs_vit_tpu.data.fixtures import (
    make_synthetic_dexycb,
    make_synthetic_ho3d,
    make_synthetic_ih26mseq,
)

T = 3
IMG = 32

SCHEMA_SHAPES = {
    "rot_rad": (T,),
    "patches": (T, IMG, IMG, 3),
    "square_bboxes": (T, 4),
    "bbox_tight": (T, 4),
    "joint_img": (T, 21, 2),
    "joint_bbox_img": (T, 21, 2),
    "joint_cam": (T, 21, 3),
    "joint_valid": (T, 21),
    "joint_rel": (T, 21, 3),
    "mano_pose": (T, 48),
    "mano_shape": (T, 10),
    "timestamp": (T,),
    "focal": (T, 2),
    "princpt": (T, 2),
}


@pytest.fixture(scope="module")
def roots(tmp_path_factory):
    base = tmp_path_factory.mktemp("data")
    return {
        "dexycb": make_synthetic_dexycb(str(base / "dexycb")),
        "ho3d": make_synthetic_ho3d(str(base / "ho3d")),
        "ih26m": make_synthetic_ih26mseq(str(base / "ih26m")),
    }


def check_item(item):
    for key, shape in SCHEMA_SHAPES.items():
        assert item[key].shape == shape, f"{key}: {item[key].shape} != {shape}"
        assert np.all(np.isfinite(np.asarray(item[key], np.float64)))
    assert len(item["imgs_path"]) == T
    assert isinstance(item["flip"], (bool, np.bool_))
    assert item["patches"].min() >= 0.0 and item["patches"].max() <= 1.0


@pytest.mark.parametrize("split", ["train", "test"])
def test_dexycb_items(roots, split):
    ds = DexYCB(roots["dexycb"], T, "s1", split, img_size=IMG)
    assert len(ds) == 2 * (8 - T + 1)
    check_item(ds[0])
    check_item(ds[len(ds) - 1])
    # second sequence is left-handed -> flipped
    assert bool(ds[len(ds) - 1]["flip"]) is True


@pytest.mark.parametrize("split", ["train", "evaluation"])
def test_ho3d_items(roots, split):
    ds = HO3D(roots["ho3d"], T, split, img_size=IMG)
    assert len(ds) == 2 * (8 - T + 1)
    check_item(ds[0])
    assert bool(ds[0]["flip"]) is False


@pytest.mark.parametrize("split", ["train", "test"])
def test_ih26m_items(roots, split, tmp_path):
    ds = InterHand26MSeq(
        roots["ih26m"], T, split, img_size=IMG, cache_dir=str(tmp_path / f"c_{split}")
    )
    assert len(ds) == 2 * (8 - T + 1)
    check_item(ds[0])
    check_item(ds[len(ds) - 1])


def test_projection_consistency_eval(roots):
    """On eval split (no aug), pinhole projection of joint_cam ~= joint_img."""
    ds = DexYCB(roots["dexycb"], T, "s1", "test", img_size=IMG)
    item = ds[0]
    jc, ji = item["joint_cam"], item["joint_img"]
    f, c = item["focal"], item["princpt"]
    u = f[:, :1] * jc[..., 0] / jc[..., 2] + c[:, :1]
    v = f[:, 1:] * jc[..., 1] / jc[..., 2] + c[:, 1:]
    np.testing.assert_allclose(np.stack([u, v], -1), ji, atol=1e-2)


def test_rotation_aug_preserves_projection(roots):
    """Train aug rotates 2D and 3D consistently: projection still matches."""
    ds = DexYCB(roots["dexycb"], T, "s1", "train", img_size=IMG)
    item = ds[0]
    jc, ji = item["joint_cam"], item["joint_img"]
    f, c = item["focal"], item["princpt"]
    u = f[:, :1] * jc[..., 0] / jc[..., 2] + c[:, :1]
    v = f[:, 1:] * jc[..., 1] / jc[..., 2] + c[:, 1:]
    # Rotation about the principal point preserves the pinhole relation only
    # approximately for the 2D path (reference rotates 2D in image plane);
    # tolerance is loose but catches axis mix-ups.
    err = np.abs(np.stack([u, v], -1) - ji)
    assert np.median(err) < 15.0


def test_concat_and_loader(roots):
    d1 = DexYCB(roots["dexycb"], T, "s1", "test", img_size=IMG)
    d2 = HO3D(roots["ho3d"], T, "evaluation", img_size=IMG)
    ds = ConcatDataset([d1, d2])
    assert len(ds) == len(d1) + len(d2)

    loader = DataLoader(ds, batch_size=4, shuffle=True, seed=7)
    loader.set_epoch(1)
    batches = list(loader)
    assert sum(b["patches"].shape[0] for b in batches) == len(ds)
    b = batches[0]
    assert b["patches"].shape == (4, T, IMG, IMG, 3)
    assert b["joint_cam"].shape == (4, T, 21, 3)

    # epoch changes the order deterministically
    loader.set_epoch(2)
    b2 = next(iter(loader))
    assert not np.allclose(b["patches"], b2["patches"])
    loader.set_epoch(1)
    b1_again = next(iter(loader))
    np.testing.assert_array_equal(b["patches"], b1_again["patches"])


def test_loader_sharding(roots):
    ds = DexYCB(roots["dexycb"], T, "s1", "test", img_size=IMG)
    all_idx = []
    for shard in range(3):
        loader = DataLoader(
            ds, batch_size=2, shuffle=False, num_shards=3, shard_index=shard,
            prefetch=0,
        )
        n = sum(b["patches"].shape[0] for b in loader)
        all_idx.append(n)
    # padded equal split covering the dataset
    assert all(n == all_idx[0] for n in all_idx)
    assert sum(all_idx) >= len(ds)


def test_collate_keys(roots):
    ds = HO3D(roots["ho3d"], T, "evaluation", img_size=IMG)
    b = collate([ds[0], ds[1]])
    assert isinstance(b["imgs_path"], list) and len(b["imgs_path"]) == 2
    assert isinstance(b["flip"], list)
    assert b["timestamp"].shape == (2, T)


def test_parallel_loader_matches_serial(roots):
    """num_workers>1 must give bitwise-identical batches to a serial run
    (per-(epoch, item) RNG makes aug order-independent), and epochs must
    re-draw the augmentation."""
    ds = DexYCB(roots["dexycb"], T, "s1", "train", img_size=IMG)
    kw = dict(batch_size=4, shuffle=True, seed=11, drop_last=True)
    serial = DataLoader(ds, prefetch=0, **kw)
    parallel = DataLoader(ds, num_workers=4, prefetch=2, **kw)
    serial.set_epoch(3)
    parallel.set_epoch(3)
    got_s, got_p = list(serial), list(parallel)
    assert len(got_s) == len(got_p) > 0
    for bs, bp in zip(got_s, got_p):
        for k in bs:
            if k in ("imgs_path", "flip"):
                assert bs[k] == bp[k]
            else:
                np.testing.assert_array_equal(bs[k], bp[k])
    # a different epoch changes the augmentation draws for the same item
    item_e3 = ds[0]
    ds.set_epoch(4)
    item_e4 = ds[0]
    assert not np.array_equal(item_e3["patches"], item_e4["patches"])
    assert not np.array_equal(item_e3["rot_rad"], item_e4["rot_rad"])
