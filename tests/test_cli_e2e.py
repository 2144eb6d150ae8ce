"""End-to-end CLI smoke: finetune -> checkpoint -> evaluate -> benchmark.

Runs the real entry points on synthetic fixtures with the 'test' backbone,
exercising: config load-or-create, dataset/loader build, init, mesh sharding,
jitted train steps, orbax save/resume, eval H5 dump, and metric computation.
"""

import json
import os

import numpy as np
import pytest

from cs_vit_tpu.cli import benchmark as cli_benchmark
from cs_vit_tpu.cli import evaluate as cli_evaluate
from cs_vit_tpu.cli import finetune as cli_finetune
from cs_vit_tpu.cli.common import load_or_create_config
from cs_vit_tpu.config import FinetuneConfig
from cs_vit_tpu.data.fixtures import make_synthetic_dexycb


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    base = tmp_path_factory.mktemp("e2e")
    data_root = make_synthetic_dexycb(str(base / "dexycb"), seq_len=6)
    ckpt_root = str(base / "checkpoints")
    os.makedirs(ckpt_root, exist_ok=True)
    return {"data_root": data_root, "ckpt_root": ckpt_root}


def make_cfg(env, **over):
    cfg = FinetuneConfig(
        exp="smoke",
        epoch=1,
        backbone="test",
        data=["dexycb"],
        seq_len=2,
        batch_size=4,
        phase="spatial",
        temporal_supervision="full",
        lr=1e-3,
        lr_scheduler="warmup",
        img_size=32,
        dexycb_root=env["data_root"],
    )
    for k, v in over.items():
        setattr(cfg, k, v)
    return cfg


def test_finetune_eval_benchmark_roundtrip(env, capsys):
    cfg = make_cfg(env)
    state = cli_finetune.main(cfg, ckpt_root=env["ckpt_root"], log_every=1)
    assert int(state.step) > 0

    exp_dir = os.path.join(env["ckpt_root"], "smoke")
    assert os.path.exists(os.path.join(exp_dir, "checkpoint_1"))
    assert os.path.islink(os.path.join(exp_dir, "checkpoint"))

    # resume: second run starts at epoch 2 and saves checkpoint_2
    cfg2 = make_cfg(env, epoch=2)
    cli_finetune.main(cfg2, ckpt_root=env["ckpt_root"], log_every=1)
    assert os.path.exists(os.path.join(exp_dir, "checkpoint_2"))

    # evaluate with the trained checkpoint
    ecfg = make_cfg(env, eval_ckpt=os.path.join(exp_dir, "checkpoint"))
    h5_path = os.path.join(exp_dir, "eval_smoke.h5")
    out_path = cli_evaluate.main(ecfg, ckpt_root=env["ckpt_root"], h5_path=h5_path)

    metrics = cli_benchmark.main(out_path)
    for key in ("mprpe", "mpjpe_cs", "mpjpe_rs", "mpjpe_pa"):
        assert np.isfinite(metrics[key]) and metrics[key] >= 0
    captured = capsys.readouterr().out
    assert "mpjpe_pa" in captured


def test_tb_reprojection_image_logged(env):
    """Train-loop reprojection grids reach TensorBoard
    (ref `scripts/finetune.py:245-255`)."""
    tb_dir = os.path.join(env["ckpt_root"], "smoke", "tb_logs")
    assert os.path.isdir(tb_dir), "run after the roundtrip test"
    blob = b"".join(
        open(os.path.join(tb_dir, f), "rb").read() for f in os.listdir(tb_dir)
    )
    assert b"train/reprojection" in blob
    assert b"train/lr" in blob


def test_analysis_tools_on_fixtures(env, tmp_path):
    """`tools/analyze_eval_h5.py` + `tools/scan_ih26m_annotations.py` (the two
    reference-notebook ports) run on the e2e eval dump / synthetic seq.h5."""
    import importlib.util

    tools_dir = os.path.join(os.path.dirname(__file__), "..", "tools")

    def load(name):
        spec = importlib.util.spec_from_file_location(
            name, os.path.join(tools_dir, f"{name}.py")
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    h5_path = os.path.join(env["ckpt_root"], "smoke", "eval_smoke.h5")
    assert os.path.exists(h5_path), "run after the roundtrip test"
    analyze = load("analyze_eval_h5")
    res = analyze.analyze(h5_path)
    assert "metrics" in res and np.isfinite(res["root_err"]).all()
    png = str(tmp_path / "roots.png")
    analyze.plot_roots({h5_path: res}, png)
    assert os.path.getsize(png) > 0

    from cs_vit_tpu.data.fixtures import make_synthetic_ih26mseq

    seq_root = make_synthetic_ih26mseq(str(tmp_path / "ih26m"))
    scanner = load("scan_ih26m_annotations")
    bad = scanner.scan(
        os.path.join(seq_root, "annotations", "train", "seq.h5"),
        ["joint_img", "joint_cam"],
    )
    assert bad == []  # synthetic fixture is NaN-free


def test_config_load_or_create(env, tmp_path):
    root = str(tmp_path / "ck")
    args = {"exp": "cfgtest", "backbone": "test", "batch_size": 2, "epoch": 5}
    cfg = load_or_create_config("cfgtest", args, ckpt_root=root)
    assert cfg.backbone == "test"
    path = os.path.join(root, "cfgtest", "config.json")
    assert os.path.exists(path)

    # json takes precedence over new CLI args (except epoch)
    cfg2 = load_or_create_config(
        "cfgtest", {"exp": "cfgtest", "backbone": "swinv2-base-256", "epoch": 9},
        ckpt_root=root,
    )
    assert cfg2.backbone == "test"
    assert cfg2.epoch == 9

    with open(path) as f:
        assert json.load(f)["backbone"] == "test"


def test_temporal_phase_from_spatial_ckpt(env):
    """Cross-phase transfer: temporal run loads the spatial checkpoint."""
    exp_dir = os.path.join(env["ckpt_root"], "smoke")
    spatial_ckpt = os.path.join(exp_dir, "checkpoint")
    assert os.path.exists(spatial_ckpt), "run after the roundtrip test"
    cfg = make_cfg(
        env, exp="smoke_temporal", phase="temporal", seq_len=5, epoch=1,
        spatial_ckpt=spatial_ckpt, batch_size=2,
    )
    state = cli_finetune.main(cfg, ckpt_root=env["ckpt_root"], log_every=1)
    assert int(state.step) > 0
