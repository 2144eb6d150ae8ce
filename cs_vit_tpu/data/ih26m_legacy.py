"""Legacy InterHand2.6M COCO-style single-frame loader (torch-free).

Parity target: `cs_vit/dataset/InterHand26M/InterHand26M.py:34-596` — the
vendored InterWild-style loader the reference keeps alongside the newer
`InterHand26MSeq` (which supersedes it for training, SURVEY §2.2). This port
reproduces the annotation indexing exactly (COCO json parsed directly —
no pycocotools dependency):

* world->camera joint transforms, validity gating through the wrist roots,
  per-hand bboxes from valid 2D joints (extend 1.2, sanitize, xywh->xyxy),
  body bbox aspect processing, MANO-param presence gating, the human-annot
  aid lists for test splits.

Items are served in an evaluation-oriented form: per-hand square crops plus
the 42-joint GT arrays expected by ``evaluation.ih26m_metrics``. The
InterWild train-time machinery (heatmap soft-argmax targets, 2.5D
augmentation) belongs to the two-hand InterWild model the reference vendors
but never trains, and is intentionally out of scope (see PARITY.md).
"""

from __future__ import annotations

import json
import os.path as osp
from typing import Dict, List, Optional

import numpy as np

from ..ops.resample import crop_with_square_box_np
from .dexycb import load_image_rgb

IH26M_42_JOINTS = tuple(
    f"{side}_{name}"
    for side in ("R", "L")
    for name in (
        "Thumb_4", "Thumb_3", "Thumb_2", "Thumb_1",
        "Index_4", "Index_3", "Index_2", "Index_1",
        "Middle_4", "Middle_3", "Middle_2", "Middle_1",
        "Ring_4", "Ring_3", "Ring_2", "Ring_1",
        "Pinky_4", "Pinky_3", "Pinky_2", "Pinky_1",
        "Wrist",
    )
)
ROOT_IDX = {"right": IH26M_42_JOINTS.index("R_Wrist"),
            "left": IH26M_42_JOINTS.index("L_Wrist")}
JOINT_TYPE = {"right": np.arange(0, 21), "left": np.arange(21, 42)}


def world2cam(world_coord: np.ndarray, R: np.ndarray, t: np.ndarray) -> np.ndarray:
    return (R @ world_coord.T).T + t.reshape(1, 3)


def cam2pixel(cam_coord: np.ndarray, f: np.ndarray, c: np.ndarray) -> np.ndarray:
    x = cam_coord[:, 0] / cam_coord[:, 2] * f[0] + c[0]
    y = cam_coord[:, 1] / cam_coord[:, 2] * f[1] + c[1]
    return np.stack((x, y, cam_coord[:, 2]), 1)


def get_bbox(joint_img, joint_valid, extend_ratio=1.2) -> np.ndarray:
    x = joint_img[:, 0][joint_valid == 1]
    y = joint_img[:, 1][joint_valid == 1]
    xmin, xmax, ymin, ymax = x.min(), x.max(), y.min(), y.max()
    xc, w = (xmin + xmax) / 2.0, xmax - xmin
    yc, h = (ymin + ymax) / 2.0, ymax - ymin
    xmin, xmax = xc - 0.5 * w * extend_ratio, xc + 0.5 * w * extend_ratio
    ymin, ymax = yc - 0.5 * h * extend_ratio, yc + 0.5 * h * extend_ratio
    return np.asarray([xmin, ymin, xmax - xmin, ymax - ymin], np.float32)


def sanitize_bbox(bbox, img_width, img_height) -> Optional[np.ndarray]:
    x, y, w, h = bbox
    x1 = max(0, x)
    y1 = max(0, y)
    x2 = min(img_width - 1, x1 + max(0, w - 1))
    y2 = min(img_height - 1, y1 + max(0, h - 1))
    if w * h > 0 and x2 > x1 and y2 > y1:
        return np.asarray([x1, y1, x2 - x1, y2 - y1], np.float32)
    return None


def process_bbox(
    bbox, img_width, img_height, do_sanitize=True, extend_ratio=1.25,
    aspect_ratio: float = 384.0 / 512.0,
) -> Optional[np.ndarray]:
    if do_sanitize:
        bbox = sanitize_bbox(bbox, img_width, img_height)
        if bbox is None:
            return None
    bbox = np.asarray(bbox, np.float32).copy()
    w, h = bbox[2], bbox[3]
    cx, cy = bbox[0] + w / 2.0, bbox[1] + h / 2.0
    if w > aspect_ratio * h:
        h = w / aspect_ratio
    elif w < aspect_ratio * h:
        w = h * aspect_ratio
    bbox[2] = w * extend_ratio
    bbox[3] = h * extend_ratio
    bbox[0] = cx - bbox[2] / 2.0
    bbox[1] = cy - bbox[3] / 2.0
    return bbox


class InterHand26M:
    """COCO-style single-frame IH26M loader (evaluation-oriented items)."""

    def __init__(
        self,
        root: str,
        data_split: str,
        img_size: int = 256,
        expansion_ratio: float = 2.0,
        aid_list_path: Optional[str] = None,
    ):
        self.root = root
        self.data_split = data_split
        self.img_size = img_size
        self.expansion_ratio = expansion_ratio
        self.img_path = osp.join(root, "images")
        self.annot_path = osp.join(root, "annotations")
        self.aid_list_path = aid_list_path
        self.datalist = self._load_data()

    def _load_data(self) -> List[Dict]:
        split = self.data_split
        with open(osp.join(self.annot_path, split, f"InterHand2.6M_{split}_data.json")) as f:
            db = json.load(f)
        images = {img["id"]: img for img in db["images"]}
        anns = {ann["id"]: ann for ann in db["annotations"]}
        with open(osp.join(self.annot_path, split, f"InterHand2.6M_{split}_camera.json")) as f:
            cameras = json.load(f)
        with open(osp.join(self.annot_path, split, f"InterHand2.6M_{split}_joint_3d.json")) as f:
            joints = json.load(f)
        with open(
            osp.join(self.annot_path, split, f"InterHand2.6M_{split}_MANO_NeuralAnnot.json")
        ) as f:
            mano_params = json.load(f)

        if split == "train" or self.aid_list_path is None:
            aid_list = list(anns.keys())
        else:
            with open(self.aid_list_path) as f:
                aid_list = [int(x) for x in f.readlines()]

        datalist = []
        for aid in aid_list:
            ann = anns[aid]
            img = images[ann["image_id"]]
            img_width, img_height = img["width"], img["height"]
            img_path = osp.join(self.img_path, split, img["file_name"])
            capture_id, cam, frame_idx = img["capture"], img["camera"], img["frame_idx"]
            hand_type = ann["hand_type"]

            camd = cameras[str(capture_id)]
            t = np.asarray(camd["campos"][str(cam)], np.float32).reshape(3)
            R = np.asarray(camd["camrot"][str(cam)], np.float32).reshape(3, 3)
            t = -(R @ t.reshape(3, 1)).reshape(3)
            focal = np.asarray(camd["focal"][str(cam)], np.float32).reshape(2)
            princpt = np.asarray(camd["princpt"][str(cam)], np.float32).reshape(2)

            joint_trunc = np.asarray(ann["joint_valid"], np.float32).reshape(-1, 1)
            joint_trunc[JOINT_TYPE["right"]] *= joint_trunc[ROOT_IDX["right"]]
            joint_trunc[JOINT_TYPE["left"]] *= joint_trunc[ROOT_IDX["left"]]
            if joint_trunc.sum() == 0:
                continue

            jinfo = joints[str(capture_id)][str(frame_idx)]
            joint_valid = np.asarray(jinfo["joint_valid"], np.float32).reshape(-1, 1)
            joint_valid[JOINT_TYPE["right"]] *= joint_valid[ROOT_IDX["right"]]
            joint_valid[JOINT_TYPE["left"]] *= joint_valid[ROOT_IDX["left"]]
            if joint_valid.sum() == 0:
                continue

            joint_world = np.asarray(jinfo["world_coord"], np.float32).reshape(-1, 3)
            joint_cam = world2cam(joint_world, R, t)
            joint_cam[np.tile(joint_valid == 0, (1, 3))] = 1.0
            joint_img = cam2pixel(joint_cam, focal, princpt)[:, :2]

            body_bbox = process_bbox(
                np.asarray([0, 0, img_width, img_height], np.float32),
                img_width, img_height, extend_ratio=1.0,
            )
            if body_bbox is None:
                continue

            hand_bboxes = {}
            for h in ("left", "right"):
                if joint_trunc[JOINT_TYPE[h]].sum() == 0:
                    hb = None
                else:
                    hb = get_bbox(
                        joint_img[JOINT_TYPE[h]], joint_trunc[JOINT_TYPE[h], 0], 1.2
                    )
                    hb = sanitize_bbox(hb, img_width, img_height)
                if hb is None:
                    joint_valid[JOINT_TYPE[h]] = 0
                    joint_trunc[JOINT_TYPE[h]] = 0
                else:
                    hb = hb.copy()
                    hb[2:] += hb[:2]  # xywh -> xyxy
                hand_bboxes[h] = hb
            if hand_bboxes["left"] is None and hand_bboxes["right"] is None:
                continue

            try:
                mano_param = dict(mano_params[str(capture_id)][str(frame_idx)])
                if hand_bboxes["left"] is None:
                    mano_param["left"] = None
                if hand_bboxes["right"] is None:
                    mano_param["right"] = None
            except KeyError:
                mano_param = {"right": None, "left": None}

            datalist.append(
                {
                    "aid": aid,
                    "capture_id": capture_id,
                    "seq_name": img.get("seq_name"),
                    "cam_id": cam,
                    "frame_idx": frame_idx,
                    "img_path": img_path,
                    "img_shape": (img_height, img_width),
                    "body_bbox": body_bbox,
                    "lhand_bbox": hand_bboxes["left"],
                    "rhand_bbox": hand_bboxes["right"],
                    "joint_img": joint_img,
                    "joint_cam": joint_cam,
                    "joint_valid": joint_valid,
                    "joint_trunc": joint_trunc,
                    "cam_param": {"R": R, "t": t, "focal": focal, "princpt": princpt},
                    "mano_param": mano_param,
                    "hand_type": hand_type,
                }
            )
        return datalist

    def __len__(self) -> int:
        return len(self.datalist)

    def __getitem__(self, ix: int) -> Dict:
        """Evaluation item: per-hand square crops + 42-joint GT arrays."""
        annot = self.datalist[ix]
        img = load_image_rgb(annot["img_path"], as_float=False)
        out = {
            "img_path": annot["img_path"],
            "hand_type": annot["hand_type"],
            "joint_img": annot["joint_img"],
            "joint_cam": annot["joint_cam"],
            "joint_valid": annot["joint_valid"][:, 0],
            "joint_trunc": annot["joint_trunc"][:, 0],
            "focal": annot["cam_param"]["focal"],
            "princpt": annot["cam_param"]["princpt"],
            "mano_param": annot["mano_param"],
        }
        for h, key in (("right", "rhand_bbox"), ("left", "lhand_bbox")):
            bbox = annot[key]
            if bbox is None:
                out[f"{h}_patch"] = np.zeros(
                    (self.img_size, self.img_size, 3), np.float32
                )
                out[f"{h}_square_bbox"] = np.zeros(4, np.float32)
                out[f"{h}_valid"] = False
            else:
                patch, _, square = crop_with_square_box_np(
                    img[None], np.asarray(bbox, np.float32)[None],
                    self.expansion_ratio, self.img_size,
                )
                out[f"{h}_patch"] = patch[0]
                out[f"{h}_square_bbox"] = square[0]
                out[f"{h}_valid"] = True
        return out
