"""Convert a reference CS-ViT torch checkpoint (.pt) to an orbax checkpoint.

Usage:
  python tools/convert_torch_ckpt.py <checkpoint.pt> <exp_config.json> <out_dir>

Reads ``ckpt["merged"]`` (the reference's eval-weights key,
`scripts/eval.py:151`) — falling back to ``ckpt["model"]`` or a raw
state_dict — maps names via ``cs_vit_tpu.train.convert`` and writes
``<out_dir>/checkpoint_0`` restorable by the finetune/eval CLIs.

torch (CPU) is used ONLY here, to unpickle the .pt file; the framework's
compute path never imports it.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def load_torch_state_dict(path: str) -> dict:
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "merged" in ckpt:
        sd = ckpt["merged"]
    elif isinstance(ckpt, dict) and "model" in ckpt:
        sd = ckpt["model"]
    else:
        sd = ckpt
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v) for k, v in sd.items()}


def main(ckpt_path: str, config_path: str, out_dir: str):
    from cs_vit_tpu.cli.common import poser_config_from
    from cs_vit_tpu.config import FinetuneConfig
    from cs_vit_tpu.train.checkpoint import save_checkpoint
    from cs_vit_tpu.train.convert import convert_poser_state_dict

    cfg = FinetuneConfig.from_json_file(config_path)
    pcfg = poser_config_from(cfg)
    sd = load_torch_state_dict(ckpt_path)
    params, batch_stats = convert_poser_state_dict(sd, pcfg)
    path = save_checkpoint(out_dir, 0, {"params": params, "batch_stats": batch_stats})
    print(f"wrote {path}")


if __name__ == "__main__":
    if len(sys.argv) != 4:
        print(__doc__)
        sys.exit(1)
    main(sys.argv[1], sys.argv[2], sys.argv[3])
