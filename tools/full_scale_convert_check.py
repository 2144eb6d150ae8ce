"""Full-scale checkpoint-converter exercise (VERDICT r3 item 8).

Builds a RANDOM-INIT full-size Swin-B reference torch Poser in the
"spenc_addpat" configuration (the shape-richest released experiment:
`/root/reference/checkpoints/spatial_dexycb_swinb_spenc_addpat_noti_20250522_1/
config.json` — spatial_layer_type=encoder, persp_decorate=patch,
num_latent_layer=2, 6 spatial / 2 temporal layers, swinv2-base-256), saves a
reference-style ``checkpoint.pt`` (`scripts/finetune.py:332-348` schema),
converts it through the REAL file path (tools/convert_torch_ckpt.py ->
orbax), restores it, and asserts our jit predict matches the torch
``predict_batch`` (`scripts/eval.py:151,259-266` semantics) on one batch.

This is the one converter surface the unit tests never cover at scale: a
full-size ``merged`` dict with every Swin-B stage shape, the 21-ish config
knobs, and the orbax round-trip in the middle. No released weights exist in
this environment (`/root/reference/.gitignore:10`), so random-init weights
stand in — the converter exercises identically.

  python tools/full_scale_convert_check.py [--platform cpu|tpu] [--batch 2]

CPU (default): exact f32 parity vs torch (~minutes on one core).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FULL = dict(image_size=256, patch_size=4, embed_dim=128, depths=(2, 2, 18, 2),
            num_heads=(4, 8, 16, 32), window_size=16)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default="cpu", choices=["cpu", "tpu"])
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--keep", help="keep artifacts under this dir")
    args = ap.parse_args()

    if args.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
        # The axon plugin can have already won the backend-init race at
        # interpreter boot (sitecustomize pre-imports jax); drop cached
        # clients so re-init honors jax_platforms=cpu (same guard as
        # tests/conftest.py — a silent TPU run here fails pose_aa parity at
        # 1e-4: MXU default-precision f32 + 6D->axis-angle amplification).
        if jax.default_backend() != "cpu":
            try:
                from jax.extend.backend import clear_backends
            except ImportError:  # older jax
                clear_backends = jax.clear_backends
            clear_backends()
        assert jax.default_backend() == "cpu", jax.default_backend()

    import numpy as np
    import torch
    import transformers

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from tests.helpers import import_reference, ref_stub_mano

    import jax.numpy as jnp

    from cs_vit_tpu.models import Poser, PoserConfig
    from cs_vit_tpu.models.swinv2 import SwinV2Config
    from cs_vit_tpu.train.checkpoint import (
        latest_checkpoint,
        restore_checkpoint,
    )

    ti_poser = import_reference("net.ti_poser")

    work = args.keep or tempfile.mkdtemp(prefix="fullconv_")
    os.makedirs(work, exist_ok=True)

    # 1. random-init full-size HF swinv2-base backbone --------------------
    hf_dir = os.path.join(work, "hf_swinb")
    if not os.path.isdir(hf_dir):
        hf_cfg = transformers.Swinv2Config(
            image_size=FULL["image_size"], patch_size=FULL["patch_size"],
            num_channels=3, embed_dim=FULL["embed_dim"],
            depths=list(FULL["depths"]), num_heads=list(FULL["num_heads"]),
            window_size=FULL["window_size"], mlp_ratio=4.0, qkv_bias=True,
            hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
            drop_path_rate=0.0,
            pretrained_window_sizes=[0] * len(FULL["depths"]),
        )
        torch.manual_seed(0)
        transformers.Swinv2Model(hf_cfg, add_pooling_layer=False).save_pretrained(hf_dir)
    print(f"[1/5] HF swinv2-base random-init at {hf_dir}")

    # 2. reference torch Poser (spenc_addpat config) + checkpoint.pt ------
    kw = dict(
        num_pose_query=16, num_spatial_layer=6, spatial_layer_type="encoder",
        num_temporal_layer=2, num_latent_layer=2, persp_decorate="patch",
        temporal_supervision="realtime", temporal_init_method="zero",
        image_size=FULL["image_size"],
    )
    torch.manual_seed(1)
    ref = ti_poser.Poser(backbone=hf_dir, smplx_path="/nonexistent", **kw)
    ref.eval()
    sd = ref.state_dict()
    ckpt_pt = os.path.join(work, "checkpoint.pt")
    torch.save({"epoch": 0, "model": sd, "merged": sd}, ckpt_pt)
    cfg_json = os.path.join(work, "config.json")
    with open(cfg_json, "w") as f:
        json.dump({
            "exp": "full_scale_convert_check", "backbone": "swinv2-base-256",
            "num_joints": 16, "num_spatial_layer": 6,
            "spatial_layer_type": "encoder", "num_temporal_layer": 2,
            "img_size": 256, "num_latent_layer": 2, "persp_decorate": "patch",
            "temporal_supervision": "realtime", "phase": "spatial",
            "data": "dexycb", "seq_len": 1, "batch_size": args.batch,
        }, f)
    n_params = sum(v.numel() for v in sd.values())
    print(f"[2/5] reference checkpoint.pt written ({len(sd)} tensors, "
          f"{n_params/1e6:.1f} M params)")

    # 3. convert through the real CLI path (torch -> orbax) ---------------
    from tools.convert_torch_ckpt import main as convert_main

    out_dir = os.path.join(work, "orbax")
    convert_main(ckpt_pt, cfg_json, out_dir)
    loaded = restore_checkpoint(latest_checkpoint(out_dir))
    print(f"[3/5] orbax restore ok "
          f"({len(list(loaded['params'].keys()))} top-level param groups)")

    # 4. torch forward on one batch ---------------------------------------
    rng = np.random.default_rng(0)
    B, T, img = args.batch, 1, FULL["image_size"]

    # num_latent_layer=2 draws a random scale/rotation per sample at predict
    # time on BOTH sides; pin the draws to identical values (the pattern of
    # tests/test_poser_full_graph.py::test_poser_full_graph_latent2x) so the
    # transformed output half is comparable.
    import jax

    scale_raw = (rng.uniform(-0.25, 0.25, size=B)).astype(np.float32)
    angle_u = rng.uniform(0.05, 0.95, size=B).astype(np.float32)
    _orig_randn, _orig_rand = torch.randn, torch.rand

    def _fake_randn(*a, size=None, **kw):
        if size == (B,):
            return torch.from_numpy(scale_raw.copy())
        return _orig_randn(*a, size=size, **kw)

    def _fake_rand(*a, size=None, **kw):
        if size == (B,):
            return torch.from_numpy(angle_u.copy())
        return _orig_rand(*a, size=size, **kw)

    _orig_jnormal, _orig_juniform = jax.random.normal, jax.random.uniform

    def _fake_jnormal(key, shape=(), dtype=jnp.float32):
        if tuple(shape) == (B,):
            return jnp.asarray(scale_raw)
        return _orig_jnormal(key, shape, dtype)

    def _fake_juniform(key, shape=(), dtype=jnp.float32, minval=0.0, maxval=1.0):
        if tuple(shape) == (B,):
            return jnp.asarray(angle_u)
        return _orig_juniform(key, shape, dtype, minval, maxval)

    import contextlib

    @contextlib.contextmanager
    def pinned_latent_draws():
        # The fakes intercept any (B,)-shaped draw: that shape appears only
        # in the latent scale/angle sampling (`ti_vit.py:426,430` and our
        # latent group's mirror) for today's graph. Scoped to exactly the
        # two forwards so a future (B,)-shaped draw elsewhere (e.g. a new
        # augmentation) cannot be silently pinned and mask real divergence.
        torch.randn, torch.rand = _fake_randn, _fake_rand
        jax.random.normal, jax.random.uniform = _fake_jnormal, _fake_juniform
        try:
            yield
        finally:
            torch.randn, torch.rand = _orig_randn, _orig_rand
            jax.random.normal = _orig_jnormal
            jax.random.uniform = _orig_juniform

    imgs = rng.uniform(size=(B, T, 3, img, img)).astype(np.float32)
    bboxes = np.stack([
        rng.uniform(50, 120, size=(B, T)), rng.uniform(60, 130, size=(B, T)),
        rng.uniform(260, 380, size=(B, T)), rng.uniform(270, 390, size=(B, T)),
    ], axis=-1).astype(np.float32)
    ts = np.zeros((B, T), np.float32)
    focal = rng.uniform(500, 700, size=(B, T, 2)).astype(np.float32)
    princpt = rng.uniform(300, 340, size=(B, T, 2)).astype(np.float32)
    t0 = time.time()
    with pinned_latent_draws(), torch.no_grad():
        want = {k: v.numpy() for k, v in ref.predict_batch(
            torch.from_numpy(imgs), torch.from_numpy(bboxes.copy()),
            torch.from_numpy(ts), torch.from_numpy(focal),
            torch.from_numpy(princpt),
        ).items()}
    print(f"[4/5] torch predict_batch done ({time.time()-t0:.1f}s)")

    # 5. our jit predict on the converted params --------------------------
    pcfg = PoserConfig(
        backbone="custom",
        custom_swin=SwinV2Config(
            **{**FULL, "depths": FULL["depths"],
               "num_heads": FULL["num_heads"], "drop_path_rate": 0.0,
               "pretrained_window_sizes": (0,) * len(FULL["depths"])},
        ),
        **kw,
    )
    jreg = np.load(
        "/root/reference/cs_vit/net/sh_joint_regressor.npy"
    ).astype(np.float32)
    ours = Poser(config=pcfg, mano=ref_stub_mano(True), j_regressor=jreg)
    variables = {"params": loaded["params"],
                 "batch_stats": loaded.get("batch_stats", {})}
    import jax

    @jax.jit
    def predict(v, im, bb, tt, fo, pp):
        # num_latent_layer>0 samples latent perspective augmentations even at
        # predict time (matching the reference's predict_batch); the torch
        # side runs with torch.manual_seed so both draws are exercised, and
        # the latent group's predict path is rotation-averaged (un-rotated),
        # so outputs agree regardless of the draw.
        return ours.apply(v, im, bb, tt, fo, pp, "inference",
                          method=ours.predict,
                          rngs={"latent": jax.random.key(0)})

    t0 = time.time()
    with pinned_latent_draws():
        got = {k: np.asarray(v) for k, v in predict(
            variables, jnp.asarray(imgs.transpose(0, 1, 3, 4, 2)),
            jnp.asarray(bboxes), jnp.asarray(ts), jnp.asarray(focal),
            jnp.asarray(princpt),
        ).items()}
    print(f"[5/5] jax predict done ({time.time()-t0:.1f}s, "
          f"platform={jax.devices()[0].platform})")

    for k in got:
        assert np.isfinite(got[k]).all(), f"{k} not finite"
    tol = dict(pose_aa=1e-4, shape=1e-4, root_transl_norm=1e-4)
    worst = {}
    for k, atol in {**tol, "root_transl": 2e-2, "joint_cam": 2e-2,
                    "verts_cam": 2e-2}.items():
        err = np.abs(got[k] - want[k]).max()
        worst[k] = float(err)
        np.testing.assert_allclose(got[k], want[k], atol=atol,
                                   err_msg=f"field {k}")
    print("PARITY OK — max abs err per field:",
          json.dumps({k: f"{v:.2e}" for k, v in worst.items()}))
    if not args.keep:
        import shutil

        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
