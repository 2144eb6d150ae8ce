"""Dataset base: sliding-window index over HDF5 sequence stores + loader.

Replaces torch Dataset/DataLoader/DistributedSampler with a numpy pipeline:
* sliding-window index with cumsum + binary search (ref `DexYCB.py:60-85`)
* epoch-seeded shuffling and deterministic per-process sharding
  (ref `DistributedSampler`, `scripts/finetune.py:109,312`)
* background-thread prefetch of collated numpy batches feeding device puts.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Dict, Iterator, List, Optional, Sequence

import numpy as np


class SlidingWindowDataset:
    """Base for h5-sequence datasets: index arithmetic + len/locate."""

    def __init__(self, num_frames: int):
        self.num_frames = num_frames
        self.seq_index: List[Dict[str, Any]] = []
        self.aux_index: Optional[np.ndarray] = None

    def build_index(self, entries: List[Dict[str, Any]]):
        """entries: [{'path_h5': ..., 'seq_length': int}, ...] (>= num_frames)."""
        self.seq_index = [e for e in entries if e["seq_length"] >= self.num_frames]
        windows = [e["seq_length"] - self.num_frames + 1 for e in self.seq_index]
        self.aux_index = np.cumsum(windows) if windows else np.zeros(0, np.int64)

    def __len__(self) -> int:
        return int(self.aux_index[-1]) if len(self.aux_index) else 0

    def locate(self, ix: int):
        """Map a flat index to (sequence, offset within it)."""
        group_ix = int(np.searchsorted(self.aux_index, ix + 1, side="left"))
        in_group_ix = ix if group_ix == 0 else ix - int(self.aux_index[group_ix - 1])
        return group_ix, int(in_group_ix)


def collate(batch: List[Dict[str, Any]]) -> Dict[str, Any]:
    """Stack numpy fields to [B,...]; keep imgs_path/flip as python lists.

    Ref `InterHand26MSeq.collate_fn` (`InterHand26MSeq.py:22-34`).
    """
    out: Dict[str, Any] = {}
    for key in batch[0]:
        if key in ("imgs_path", "flip"):
            out[key] = [s[key] for s in batch]
        else:
            out[key] = np.stack([np.asarray(s[key]) for s in batch], axis=0)
    return out


class ConcatDataset:
    """Concatenation of datasets with a shared item schema."""

    def __init__(self, datasets: Sequence[Any]):
        self.datasets = list(datasets)
        self._cum = np.cumsum([len(d) for d in self.datasets])

    def __len__(self) -> int:
        return int(self._cum[-1]) if len(self._cum) else 0

    def __getitem__(self, ix: int):
        d = int(np.searchsorted(self._cum, ix + 1, side="left"))
        base = 0 if d == 0 else int(self._cum[d - 1])
        return self.datasets[d][ix - base]


class DataLoader:
    """Epoch-seeded shuffling, per-process sharding, thread prefetch."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        drop_last: bool = False,
        seed: int = 42,
        num_shards: int = 1,
        shard_index: int = 0,
        prefetch: int = 2,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.num_shards = num_shards
        self.shard_index = shard_index
        self.prefetch = prefetch
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def _indices(self) -> np.ndarray:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            order = np.random.default_rng(self.seed + self.epoch).permutation(n)
        # DistributedSampler-style padding so every shard sees the same count
        total = ((n + self.num_shards - 1) // self.num_shards) * self.num_shards
        if total > n:
            order = np.concatenate([order, order[: total - n]])
        return order[self.shard_index :: self.num_shards]

    def __len__(self) -> int:
        per = len(self._indices())
        if self.drop_last:
            return per // self.batch_size
        return (per + self.batch_size - 1) // self.batch_size

    def _batches(self) -> Iterator[Dict[str, Any]]:
        idx = self._indices()
        stop = len(idx) - (len(idx) % self.batch_size) if self.drop_last else len(idx)
        for s in range(0, stop, self.batch_size):
            chunk = idx[s : s + self.batch_size]
            yield collate([self.dataset[int(i)] for i in chunk])

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        if self.prefetch <= 0:
            yield from self._batches()
            return
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()

        def worker():
            try:
                for b in self._batches():
                    q.put(b)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            yield item
        t.join()
