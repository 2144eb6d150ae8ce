"""Hybrid multi-dataset smoke loop (parity: reference `tests/dryrun_hybrid.py:27-64`).

ConcatDataset(IH26MSeq + DexYCB + HO3D) at T frames through the loader.
Synthetic fixtures by default:

  python tools/dryrun_hybrid.py [--ih26m ROOT --dexycb ROOT --ho3d ROOT]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tempfile

from cs_vit_tpu.data import ConcatDataset, DataLoader, DexYCB, HO3D, InterHand26MSeq


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ih26m", default=None)
    p.add_argument("--dexycb", default=None)
    p.add_argument("--ho3d", default=None)
    p.add_argument("--frames", type=int, default=7)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--max_iters", type=int, default=10)
    args = p.parse_args()

    if args.ih26m is None or args.dexycb is None or args.ho3d is None:
        from cs_vit_tpu.data.fixtures import (
            make_synthetic_dexycb,
            make_synthetic_ho3d,
            make_synthetic_ih26mseq,
        )

        base = tempfile.mkdtemp(prefix="dryrun_hybrid_")
        args.dexycb = make_synthetic_dexycb(f"{base}/dexycb", seq_len=args.frames + 2)
        args.ho3d = make_synthetic_ho3d(f"{base}/ho3d", seq_len=args.frames + 2)
        args.ih26m = make_synthetic_ih26mseq(f"{base}/ih26m", seq_len=args.frames + 2)
        print(f"using synthetic fixtures under {base}")

    dataset = ConcatDataset(
        [
            InterHand26MSeq(args.ih26m, args.frames, "train", img_size=256),
            DexYCB(args.dexycb, args.frames, "s1", "train", img_size=256),
            HO3D(args.ho3d, args.frames, "train", img_size=256),
        ]
    )
    loader = DataLoader(dataset, batch_size=args.batch_size, shuffle=True)
    print(f"hybrid dataset len={len(dataset)}")
    for i, batch in enumerate(loader):
        print(i, sorted(batch.keys())[:5], batch["patches"].shape)
        if i + 1 >= args.max_iters:
            break
    print("ok")


if __name__ == "__main__":
    main()
