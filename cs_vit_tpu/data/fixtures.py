"""Synthetic H5 fixtures matching the real dataset schemas (SURVEY.md §4).

Generates tiny DexYCB / HO3D / InterHand26MSeq stores with real JPEG images
on disk so the full data path (decode -> flip -> aug -> crop -> collate) runs
without the licensed datasets. Deterministic per seed.
"""

from __future__ import annotations

import os
import os.path as osp
from typing import Tuple

import cv2
import h5py
import numpy as np


def _write_images(root: str, rel_paths, size: Tuple[int, int], rng) -> None:
    for rel in rel_paths:
        path = osp.join(root, rel)
        os.makedirs(osp.dirname(path), exist_ok=True)
        img = (rng.uniform(size=(size[0], size[1], 3)) * 255).astype(np.uint8)
        cv2.imwrite(path, img)


def _joints_2d3d(rng, T, img_hw, focal, princpt):
    """Random wrist trajectory with joints nearby, projected consistently."""
    J = 21
    root3d = np.stack(
        [
            rng.uniform(-50, 50, T),
            rng.uniform(-50, 50, T),
            rng.uniform(400, 600, T),
        ],
        axis=-1,
    )
    offsets = rng.uniform(-40, 40, size=(T, J, 3))
    offsets[:, 0] = 0
    joint_cam = root3d[:, None] + offsets  # mm
    z = joint_cam[..., 2]
    u = focal[0] * joint_cam[..., 0] / z + princpt[0]
    v = focal[1] * joint_cam[..., 1] / z + princpt[1]
    u = np.clip(u, 20, img_hw[1] - 20)
    v = np.clip(v, 20, img_hw[0] - 20)
    joint_img = np.stack([u, v], axis=-1)
    return joint_cam.astype(np.float32), joint_img.astype(np.float32)


def make_synthetic_dexycb(
    root: str,
    protocol: str = "s1",
    splits=("train", "test"),
    num_seqs: int = 2,
    seq_len: int = 8,
    img_hw=(120, 160),
    seed: int = 0,
) -> str:
    rng = np.random.default_rng(seed)
    focal = (240.0, 240.0)
    princpt = (img_hw[1] / 2, img_hw[0] / 2)
    os.makedirs(root, exist_ok=True)
    for split in splits:
        with h5py.File(osp.join(root, f"{protocol}_{split}.h5"), "w") as f:
            g = f.create_group("sequences")
            for s in range(num_seqs):
                seq = g.create_group(f"seq{s:03d}")
                rels = [f"images/seq{s:03d}/{split}_{t:04d}.jpg" for t in range(seq_len)]
                _write_images(root, rels, img_hw, rng)
                seq.create_dataset(
                    "imgs_path", data=np.asarray([r.encode() for r in rels])
                )
                hand = b"right" if s % 2 == 0 else b"left"
                seq.create_dataset("handedness", data=np.asarray([hand]))
                jc, ji = _joints_2d3d(rng, seq_len, img_hw, focal, princpt)
                seq.create_dataset("joint_3d", data=jc / 1e3)  # meters
                seq.create_dataset("joint_2d", data=ji)
                intr = np.asarray(
                    [[focal[0], 0, princpt[0]], [0, focal[1], princpt[1]], [0, 0, 1]],
                    np.float32,
                )
                seq.create_dataset("intrinsics", data=intr.reshape(-1))
                seq.create_dataset(
                    "pose_m",
                    data=rng.normal(scale=0.3, size=(seq_len, 51)).astype(np.float32),
                )
                seq.create_dataset(
                    "beta", data=rng.normal(scale=0.5, size=(10,)).astype(np.float32)
                )
    return root


def make_synthetic_ho3d(
    root: str,
    splits=("train", "evaluation"),
    num_seqs: int = 2,
    seq_len: int = 8,
    img_hw=(120, 160),
    seed: int = 1,
) -> str:
    rng = np.random.default_rng(seed)
    focal = np.asarray([240.0, 240.0], np.float32)
    princpt = np.asarray([img_hw[1] / 2, img_hw[0] / 2], np.float32)
    os.makedirs(root, exist_ok=True)
    for split in splits:
        with h5py.File(osp.join(root, f"{split}_ho3d_seq.h5"), "w") as f:
            g = f.create_group("sequences")
            for s in range(num_seqs):
                seq = g.create_group(f"seq{s:03d}")
                rels = [f"images/ho3d_seq{s:03d}/{split}_{t:04d}.jpg" for t in range(seq_len)]
                _write_images(root, rels, img_hw, rng)
                seq.create_dataset("img_path", data=np.asarray([r.encode() for r in rels]))
                jc, ji = _joints_2d3d(rng, seq_len, img_hw, focal, princpt)
                bbox = np.stack(
                    [
                        ji[..., 0].min(1), ji[..., 1].min(1),
                        ji[..., 0].max(1), ji[..., 1].max(1),
                    ],
                    axis=-1,
                ).astype(np.float32)
                side = np.maximum(bbox[:, 2] - bbox[:, 0], bbox[:, 3] - bbox[:, 1])
                c = (bbox[:, :2] + bbox[:, 2:]) / 2
                sq = np.concatenate(
                    [c - side[:, None] * 0.625, c + side[:, None] * 0.625], axis=1
                )
                seq.create_dataset("bbox_tight", data=bbox)
                seq.create_dataset("square_bboxes", data=sq.astype(np.float32))
                seq.create_dataset(
                    "bbox_scale_coef", data=(side * 1.25 / 224).astype(np.float32)
                )
                seq.create_dataset("joint_img", data=ji)
                seq.create_dataset("joint_bbox_img", data=ji - bbox[:, None, :2])
                seq.create_dataset("joint_cam", data=jc)
                seq.create_dataset("joint_rel", data=jc - jc[:, :1])
                seq.create_dataset(
                    "mano_pose",
                    data=rng.normal(scale=0.3, size=(seq_len, 48)).astype(np.float32),
                )
                seq.create_dataset(
                    "mano_shape",
                    data=rng.normal(scale=0.5, size=(seq_len, 10)).astype(np.float32),
                )
                seq.create_dataset("focal", data=np.tile(focal, (seq_len, 1)))
                seq.create_dataset("princpt", data=np.tile(princpt, (seq_len, 1)))
    return root


def make_synthetic_ih26mseq(
    root: str,
    splits=("train", "test"),
    seq_len: int = 8,
    img_hw=(120, 160),
    seed: int = 2,
) -> str:
    rng = np.random.default_rng(seed)
    focal = np.asarray([240.0, 240.0], np.float32)
    princpt = np.asarray([img_hw[1] / 2, img_hw[0] / 2], np.float32)
    for split in splits:
        annot_dir = osp.join(root, "annotations", split)
        os.makedirs(annot_dir, exist_ok=True)
        with h5py.File(osp.join(annot_dir, "seq.h5"), "w") as f:
            for cap in ("Capture0",):
                for seqn in ("ROM01",):
                    for cam in ("cam400002",):
                        for hand, hstr in (("right", b"right"), ("left", b"left")):
                            grp = f.create_group(f"{cap}/{seqn}/{cam}/{hand}/fr0")
                            a = grp.create_group("annots")
                            rels = [
                                f"{cap}/{seqn}/{cam}/{hand}_{t:04d}.jpg"
                                for t in range(seq_len)
                            ]
                            _write_images(
                                osp.join(root, "images", split), rels, img_hw, rng
                            )
                            a.create_dataset(
                                "img_path", data=np.asarray([r.encode() for r in rels])
                            )
                            a.create_dataset(
                                "frame_idx",
                                data=np.asarray(
                                    [str(t).encode() for t in range(seq_len)]
                                ),
                            )
                            a.create_dataset(
                                "handedness", data=np.asarray([hstr] * seq_len)
                            )
                            jc, ji = _joints_2d3d(rng, seq_len, img_hw, focal, princpt)
                            bbox = np.stack(
                                [
                                    ji[..., 0].min(1), ji[..., 1].min(1),
                                    ji[..., 0].max(1), ji[..., 1].max(1),
                                ],
                                axis=-1,
                            ).astype(np.float32)
                            a.create_dataset("bbox_tight", data=bbox)
                            a.create_dataset("joint_img", data=ji)
                            a.create_dataset(
                                "joint_bbox_img", data=ji - bbox[:, None, :2]
                            )
                            a.create_dataset("joint_cam", data=jc)
                            a.create_dataset(
                                "joint_valid",
                                data=np.ones((seq_len, 21), np.float32),
                            )
                            a.create_dataset("joint_rel", data=jc - jc[:, :1])
                            a.create_dataset(
                                "mano_pose",
                                data=rng.normal(
                                    scale=0.3, size=(seq_len, 48)
                                ).astype(np.float32),
                            )
                            a.create_dataset(
                                "mano_shape",
                                data=rng.normal(
                                    scale=0.5, size=(seq_len, 10)
                                ).astype(np.float32),
                            )
                            a.create_dataset(
                                "focal", data=np.tile(focal, (seq_len, 1))
                            )
                            a.create_dataset(
                                "princpt", data=np.tile(princpt, (seq_len, 1))
                            )
    return root


def make_synthetic_ho3d_fs(
    root: str,
    splits=("train", "evaluation"),
    num_seqs: int = 1,
    seq_len: int = 6,
    img_hw=(120, 160),
    seed: int = 3,
) -> str:
    """HO3D directory layout: <split>/<seq>/{rgb,meta} with per-frame pkls."""
    import pickle

    rng = np.random.default_rng(seed)
    cam = np.asarray(
        [[240.0, 0, img_hw[1] / 2], [0, 240.0, img_hw[0] / 2], [0, 0, 1]]
    )
    for split in splits:
        for s in range(num_seqs):
            seq_dir = osp.join(root, split, f"SEQ{s}")
            os.makedirs(osp.join(seq_dir, "rgb"), exist_ok=True)
            os.makedirs(osp.join(seq_dir, "meta"), exist_ok=True)
            for t in range(seq_len):
                img = (rng.uniform(size=(*img_hw, 3)) * 255).astype(np.uint8)
                cv2.imwrite(osp.join(seq_dir, "rgb", f"{t:04d}.jpg"), img)
                # OpenGL convention: y/z flipped relative to camera coords
                joints_cam = np.stack(
                    [
                        rng.uniform(-0.05, 0.05, 21),
                        rng.uniform(-0.05, 0.05, 21),
                        rng.uniform(0.4, 0.6, 21),
                    ],
                    axis=-1,
                )
                joints_gl = joints_cam * np.asarray([1, -1, -1])
                meta = {
                    "handJoints3D": joints_gl,
                    "camMat": cam,
                    "handPose": rng.normal(scale=0.3, size=48),
                    "handBeta": rng.normal(scale=0.5, size=10),
                }
                with open(osp.join(seq_dir, "meta", f"{t:04d}.pkl"), "wb") as f:
                    pickle.dump(meta, f)
    return root


def make_synthetic_image_folder(root: str, n: int = 6, img_hw=(90, 110), seed: int = 4) -> str:
    rng = np.random.default_rng(seed)
    os.makedirs(root, exist_ok=True)
    for i in range(n):
        img = (rng.uniform(size=(*img_hw, 3)) * 255).astype(np.uint8)
        cv2.imwrite(osp.join(root, f"img_{i:03d}.jpg"), img)
    return root


def make_synthetic_ego4d(root: str, n_frames: int = 3, img_hw=(100, 140), seed: int = 5) -> str:
    import json

    rng = np.random.default_rng(seed)
    os.makedirs(osp.join(root, "images", "vid0"), exist_ok=True)
    os.makedirs(osp.join(root, "annotations"), exist_ok=True)
    annot = {}
    for t in range(n_frames):
        rel = f"vid0/frame_{t:04d}.jpg"
        img = (rng.uniform(size=(*img_hw, 3)) * 255).astype(np.uint8)
        cv2.imwrite(osp.join(root, "images", rel), img)
        annot[str(t)] = {
            "image_path": rel,
            "hands": [
                {
                    "bbox": {
                        "x_min": 0.3, "y_min": 0.3, "x_max": 0.6, "y_max": 0.7,
                    }
                }
            ],
        }
    with open(osp.join(root, "annotations", "vid0.json"), "w") as f:
        json.dump(annot, f)
    return root


def make_synthetic_hint(root: str, part: str = "newdays", n: int = 4, img_hw=(100, 140), seed: int = 6) -> str:
    import json

    rng = np.random.default_rng(seed)
    folder = osp.join(root, f"TRAIN_{part}_img")
    os.makedirs(folder, exist_ok=True)
    for i in range(n):
        img = (rng.uniform(size=(*img_hw, 3)) * 255).astype(np.uint8)
        cv2.imwrite(osp.join(folder, f"im_{i:03d}.jpg"), img)
        with open(osp.join(folder, f"im_{i:03d}.json"), "w") as f:
            json.dump([{"bbox": [[20.0, 25.0, 90.0, 85.0]]}], f)
    return root


def make_synthetic_ih26m_legacy(root: str, n_frames: int = 4, img_hw=(120, 160), seed: int = 7) -> str:
    """COCO-style InterHand2.6M annotation jsons + images (test split)."""
    import json

    rng = np.random.default_rng(seed)
    split = "test"
    annot_dir = osp.join(root, "annotations", split)
    os.makedirs(annot_dir, exist_ok=True)
    focal = [240.0, 240.0]
    princpt = [img_hw[1] / 2.0, img_hw[0] / 2.0]

    images, annotations, joints, mano = [], [], {"0": {}}, {"0": {}}
    cameras = {
        "0": {
            "campos": {"4": [0.0, 0.0, 0.0]},
            "camrot": {"4": np.eye(3).tolist()},
            "focal": {"4": focal},
            "princpt": {"4": princpt},
        }
    }
    for t in range(n_frames):
        rel = f"Capture0/ROM01/cam4/image{t:05d}.jpg"
        path = osp.join(root, "images", split, rel)
        os.makedirs(osp.dirname(path), exist_ok=True)
        cv2.imwrite(path, (rng.uniform(size=(*img_hw, 3)) * 255).astype(np.uint8))
        images.append(
            {
                "id": t, "file_name": rel, "width": img_hw[1], "height": img_hw[0],
                "capture": 0, "camera": "4", "frame_idx": t, "seq_name": "ROM01",
            }
        )
        # two hands in front of the camera (world == cam since R=I, t=0)
        jw = np.stack(
            [
                rng.uniform(-40, 40, 42),
                rng.uniform(-40, 40, 42),
                rng.uniform(400, 600, 42),
            ],
            axis=-1,
        )
        joints["0"][str(t)] = {
            "world_coord": jw.tolist(),
            "joint_valid": np.ones((42, 1)).tolist(),
        }
        mano["0"][str(t)] = {
            "right": {"pose": rng.normal(size=48).tolist(),
                      "shape": rng.normal(size=10).tolist(),
                      "trans": [0, 0, 0.5]},
            "left": {"pose": rng.normal(size=48).tolist(),
                     "shape": rng.normal(size=10).tolist(),
                     "trans": [0, 0, 0.5]},
        }
        annotations.append(
            {
                "id": t, "image_id": t,
                "joint_valid": np.ones((42, 1)).tolist(),
                "hand_type": "interacting" if t % 2 == 0 else "right",
            }
        )

    with open(osp.join(annot_dir, f"InterHand2.6M_{split}_data.json"), "w") as f:
        json.dump({"images": images, "annotations": annotations}, f)
    with open(osp.join(annot_dir, f"InterHand2.6M_{split}_camera.json"), "w") as f:
        json.dump(cameras, f)
    with open(osp.join(annot_dir, f"InterHand2.6M_{split}_joint_3d.json"), "w") as f:
        json.dump(joints, f)
    with open(osp.join(annot_dir, f"InterHand2.6M_{split}_MANO_NeuralAnnot.json"), "w") as f:
        json.dump(mano, f)
    return root
