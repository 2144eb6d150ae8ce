"""Export an orbax Poser checkpoint back to a reference-style .pt file.

Usage:
  python tools/export_torch_ckpt.py <orbax_ckpt_dir> <exp_config.json> <out.pt>

Writes ``{"model": sd, "merged": sd, "epoch": E}`` with the reference's
state_dict naming so reference tooling (scripts/eval.py etc.) can consume
weights trained here. Requires torch only for the final save.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(ckpt_dir: str, config_path: str, out_path: str):
    import torch

    from cs_vit_tpu.cli.common import poser_config_from
    from cs_vit_tpu.config import FinetuneConfig
    from cs_vit_tpu.train.checkpoint import restore_checkpoint
    from cs_vit_tpu.train.convert import export_poser_state_dict

    cfg = FinetuneConfig.from_json_file(config_path)
    pcfg = poser_config_from(cfg)
    loaded = restore_checkpoint(ckpt_dir)
    sd_np = export_poser_state_dict(
        loaded["params"], loaded.get("batch_stats", {}), pcfg
    )
    sd = {k: torch.from_numpy(v.copy()) if hasattr(v, "ndim") else torch.tensor(v)
          for k, v in sd_np.items()}
    torch.save(
        {"model": sd, "merged": sd, "epoch": int(loaded.get("epoch", 0))}, out_path
    )
    print(f"wrote {out_path} ({len(sd)} tensors)")


if __name__ == "__main__":
    if len(sys.argv) != 4:
        print(__doc__)
        sys.exit(1)
    main(sys.argv[1], sys.argv[2], sys.argv[3])
