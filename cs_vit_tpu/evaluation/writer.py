"""Distributed eval -> HDF5 dump with the reference's exact schema.

Parity: `scripts/eval.py:204-314` — resizable gzip datasets ``img_paths``,
``joint_cam_{gt,pred}`` [N,21,3], ``joint_reproj_{gt,pred}`` [N,21,2], written
by process 0 only. Cross-host gathers use
``jax.experimental.multihost_utils.process_allgather`` instead of
NCCL all_gather/gather; single-process runs bypass collectives.
"""

from __future__ import annotations

from typing import List, Optional

import h5py
import jax
import numpy as np


class EvalH5Writer:
    """Appendable eval dump on process 0 (no-op on other processes)."""

    def __init__(self, path: str):
        self.is_main = jax.process_index() == 0
        self.h5: Optional[h5py.File] = None
        if self.is_main:
            self.h5 = h5py.File(path, "w")
            str_dtype = h5py.special_dtype(vlen=str)
            self.h5.create_dataset("img_paths", shape=(0,), maxshape=(None,), dtype=str_dtype)
            for name, width in (
                ("joint_cam_gt", 3),
                ("joint_cam_pred", 3),
                ("joint_reproj_gt", 2),
                ("joint_reproj_pred", 2),
            ):
                self.h5.create_dataset(
                    name,
                    shape=(0, 21, width),
                    maxshape=(None, 21, width),
                    dtype="float32",
                    chunks=(1000, 21, width),
                    compression="gzip",
                )

    def append(
        self,
        img_paths: List[str],
        joint_cam_gt: np.ndarray,
        joint_cam_pred: np.ndarray,
        joint_reproj_gt: np.ndarray,
        joint_reproj_pred: np.ndarray,
    ):
        if not self.is_main:
            return
        h5 = self.h5
        cur = h5["img_paths"].shape[0]
        new = cur + len(img_paths)
        h5["img_paths"].resize((new,))
        h5["img_paths"][cur:new] = np.array(img_paths, dtype=object)
        for name, arr in (
            ("joint_cam_gt", joint_cam_gt),
            ("joint_cam_pred", joint_cam_pred),
            ("joint_reproj_gt", joint_reproj_gt),
            ("joint_reproj_pred", joint_reproj_pred),
        ):
            h5[name].resize((new,) + h5[name].shape[1:])
            h5[name][cur:new] = arr.astype(np.float32)

    def close(self):
        if self.h5 is not None:
            self.h5.close()


def gather_to_host0(arr: np.ndarray) -> np.ndarray:
    """All-gather rows across hosts (ref `eval.py:75-82`); identity if 1 host."""
    if jax.process_count() == 1:
        return arr
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(arr)).reshape(
        (-1,) + arr.shape[1:]
    )


def gather_strings_to_host0(strings: List[str]) -> List[str]:
    """Gather utf-8 strings across hosts via fixed-width byte arrays
    (ref `eval.py:53-72`); identity if single host."""
    if jax.process_count() == 1:
        return strings
    from jax.experimental import multihost_utils

    max_len = max((len(s.encode()) for s in strings), default=0)
    max_len = int(
        np.asarray(
            multihost_utils.process_allgather(np.asarray([max_len]))
        ).max()
    )
    buf = np.zeros((len(strings), max_len), np.uint8)
    for i, s in enumerate(strings):
        b = s.encode()
        buf[i, : len(b)] = np.frombuffer(b, np.uint8)
    gathered = np.asarray(multihost_utils.process_allgather(buf)).reshape(-1, max_len)
    return [bytes(row[row != 0]).decode() for row in gathered]
