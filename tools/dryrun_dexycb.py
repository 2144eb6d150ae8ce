"""Data-pipeline smoke loop (parity: reference `tests/dryrun_dexycb.py:26-47`).

Iterates the DexYCB dataset through the loader printing patch shapes. Points
at a synthetic fixture by default so it runs anywhere:

  python tools/dryrun_dexycb.py [--root /data/dexycb] [--frames 7]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tempfile

from cs_vit_tpu.data import DataLoader, DexYCB


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", default=None)
    p.add_argument("--frames", type=int, default=7)
    p.add_argument("--batch_size", type=int, default=10)
    p.add_argument("--max_iters", type=int, default=10)
    args = p.parse_args()

    root = args.root
    if root is None:
        from cs_vit_tpu.data.fixtures import make_synthetic_dexycb

        root = make_synthetic_dexycb(
            tempfile.mkdtemp(prefix="dryrun_dexycb_"), seq_len=args.frames + 2
        )
        print(f"using synthetic fixture at {root}")

    dataset = DexYCB(root, args.frames, "s1", "train", img_size=256)
    loader = DataLoader(dataset, batch_size=args.batch_size, shuffle=True)
    print(f"dataset len={len(dataset)}, {len(loader)} batches")
    for i, batch in enumerate(loader):
        print(i, "patches", batch["patches"].shape)
        if i + 1 >= args.max_iters:
            break
    print("ok")


if __name__ == "__main__":
    main()
