"""Golden-fixture generator for real-MANO FK verification.

Run on a machine that has the official MANO pickle (and, optionally, smplx):

    MANO_MODEL_DIR=/path/to/mano_v1_2/models python tools/mano_golden.py \
        --out tests/fixtures/mano_golden.npz

It loads the real ``MANO_RIGHT.pkl`` through ``cs_vit_tpu.mano.assets``
(chumpy-tolerant parser), evaluates our JAX ``ManoLayer`` on a deterministic
grid of (betas, pose) inputs, and writes inputs + vertices/joints to an
``.npz``. If the ``smplx`` package is importable, it ALSO runs the reference
implementation (``smplx.create(..., 'mano', is_rhand=True, use_pca=False,
flat_hand_mean=False)`` — the exact construction at
`/root/reference/cs_vit/net/ti_poser.py:268` / `cs_vit/utils/mano.py:35-52`)
on the same inputs, asserts agreement <= --atol, and stores the smplx outputs
as the golden values; otherwise our layer's outputs are stored and the file
is marked ``source='cs_vit_tpu'``.

``tests/test_mano.py::test_mano_golden_fixture`` consumes the file (skipped
when absent). The fixture is NOT checked in: MANO model data is distributed
under a restrictive license (see README "MANO assets"), so each site
generates its own from its licensed pickle.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def make_inputs(n: int = 16, seed: int = 0):
    """Deterministic (betas, global_orient, hand_pose) grid incl. edge cases."""
    rng = np.random.default_rng(seed)
    betas = rng.normal(scale=1.0, size=(n, 10)).astype(np.float32)
    global_orient = rng.normal(scale=1.0, size=(n, 3)).astype(np.float32)
    hand_pose = rng.normal(scale=0.5, size=(n, 45)).astype(np.float32)
    # edge cases: zero pose (mean hand), zero betas, near-pi global rotation
    betas[0] = 0.0
    global_orient[0] = 0.0
    hand_pose[0] = 0.0
    global_orient[1] = np.asarray([np.pi - 1e-4, 0.0, 0.0], np.float32)
    return betas, global_orient, hand_pose


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="tests/fixtures/mano_golden.npz")
    ap.add_argument("--n", type=int, default=16)
    ap.add_argument("--atol", type=float, default=1e-5,
                    help="ours-vs-smplx agreement (meters) when smplx present")
    ap.add_argument("--mano_dir", default=os.environ.get("MANO_MODEL_DIR"))
    args = ap.parse_args()

    if not args.mano_dir:
        sys.exit("set MANO_MODEL_DIR (or --mano_dir) to the real MANO pickle dir")

    from cs_vit_tpu.mano import ManoLayer, find_and_load

    try:
        assets = find_and_load(args.mano_dir, is_rhand=True, allow_synthetic=False)
    except FileNotFoundError as e:
        sys.exit(str(e))

    betas, go, hp = make_inputs(args.n)
    layer = ManoLayer(assets, flat_hand_mean=False)
    ours = layer(betas, go, hp)
    verts = np.asarray(ours["vertices"], np.float32)
    joints = np.asarray(ours["joints"], np.float32)
    source = "cs_vit_tpu"

    try:
        import smplx
        import torch

        ref_layer = smplx.create(
            args.mano_dir, "mano", is_rhand=True, use_pca=False,
            flat_hand_mean=False,
        )
        with torch.no_grad():
            ref = ref_layer(
                betas=torch.from_numpy(betas),
                global_orient=torch.from_numpy(go),
                hand_pose=torch.from_numpy(hp),
            )
        ref_verts = ref.vertices.numpy()
        err = np.abs(ref_verts - verts).max()
        print(f"ours vs smplx max |dv| = {err:.2e} m")
        assert err <= args.atol, f"MANO layer diverges from smplx: {err}"
        verts = ref_verts
        joints = ref.joints.numpy() if hasattr(ref, "joints") else joints
        source = "smplx"
    except ImportError:
        print("smplx not importable — storing cs_vit_tpu outputs as golden")

    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    np.savez_compressed(
        args.out,
        betas=betas, global_orient=go, hand_pose=hp,
        vertices=verts, joints=joints,
        source=np.asarray(source),
    )
    print(f"wrote {args.out} ({args.n} samples, source={source})")


if __name__ == "__main__":
    main()
