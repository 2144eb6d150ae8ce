"""Annotation sanity scan for InterHand2.6M seq.h5 files.

Port of `/root/reference/notebook/ih26m.ipynb`: walks the
capture/sequence/camera/hand/frame_range hierarchy and reports every group
whose annotations contain NaN (the notebook checked `joint_img`; --keys widens
the scan). Exit code 1 when any NaN is found, so it doubles as a data gate.

Usage:
  python tools/scan_ih26m_annotations.py /path/to/annotations/train/seq.h5 \
      [--keys joint_img joint_cam mano_pose]
"""

from __future__ import annotations

import argparse
import sys

import h5py
import numpy as np


def scan(path: str, keys: list[str]) -> list[dict]:
    bad = []
    n_groups = 0
    with h5py.File(path, "r") as f:
        for capture_id, capture in f.items():
            for seq_name, sequence in capture.items():
                for cam_id, camera in sequence.items():
                    for handedness, hand in camera.items():
                        for fr_name, fr in hand.items():
                            n_groups += 1
                            annots = fr["annots"]
                            for key in keys:
                                if key not in annots:
                                    continue
                                arr = annots[key][:]
                                if np.issubdtype(arr.dtype, np.floating) and np.isnan(arr).any():
                                    where = f"{capture_id}, {seq_name}, {cam_id}, {handedness}, {fr_name}"
                                    bad.append({"path": where, "key": key,
                                                "nan_frames": int(np.isnan(arr).any(
                                                    axis=tuple(range(1, arr.ndim))).sum())})
                                    print(f"found NaN: {where} [{key}]")
    print(f"scanned {n_groups} frame-range groups; {len(bad)} with NaN")
    return bad


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("seq_h5", help="annotations/<split>/seq.h5")
    ap.add_argument("--keys", nargs="+", default=["joint_img"],
                    help="annot datasets to scan (default: joint_img)")
    args = ap.parse_args()
    bad = scan(args.seq_h5, args.keys)
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
