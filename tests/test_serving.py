"""PoserSession serving API tests (tiny model, CPU)."""

import numpy as np
import pytest

from cs_vit_tpu.config import FinetuneConfig
from cs_vit_tpu.serving import PoserSession


@pytest.fixture(scope="module")
def session():
    cfg = FinetuneConfig(
        exp="serve", backbone="test", img_size=32, phase="inference",
        data=["dexycb"], batch_size=4,
    )
    s = PoserSession(cfg, batch_size=4, seq_len=1, dtype="float32")
    s.warmup()
    return s


def test_predict_crops_padding(session, rng):
    # N=6 with B=4 -> two chunks, second padded by 2
    N, S = 6, 32
    out = session.predict_crops(
        rng.uniform(size=(N, 1, S, S, 3)).astype(np.float32),
        np.tile(np.asarray([10, 10, 200, 200], np.float32), (N, 1, 1)),
        np.zeros((N, 1), np.float32),
        np.full((N, 1, 2), 300.0, np.float32),
        np.full((N, 1, 2), 100.0, np.float32),
    )
    assert out["joint_cam"].shape == (N, 1, 21, 3)
    assert out["verts_cam"].shape == (N, 1, 778, 3)
    assert np.isfinite(out["joint_cam"]).all()
    assert out["joint_cam"].dtype == np.float32


def test_predict_images_end_to_end(session, rng):
    N = 3
    images = rng.uniform(size=(N, 120, 160, 3)).astype(np.float32)
    bboxes = np.tile(np.asarray([40, 30, 120, 100], np.float32), (N, 1))
    out = session.predict_images(
        images, bboxes,
        np.full((N, 2), 240.0, np.float32),
        np.full((N, 2), 80.0, np.float32),
    )
    assert out["joint_cam"].shape == (N, 21, 3)
    assert np.isfinite(out["joint_cam"]).all()

    # determinism: same input -> same output (pure jitted program)
    out2 = session.predict_images(
        images, bboxes,
        np.full((N, 2), 240.0, np.float32),
        np.full((N, 2), 80.0, np.float32),
    )
    np.testing.assert_array_equal(out["joint_cam"], out2["joint_cam"])


def test_from_experiment_roundtrip(tmp_path, rng):
    import json
    import os

    from cs_vit_tpu.cli.common import build_model, init_variables
    from cs_vit_tpu.train import save_checkpoint

    cfg = FinetuneConfig(
        exp="serve2", backbone="test", img_size=32, phase="inference",
        data=["dexycb"], batch_size=2,
    )
    exp_dir = tmp_path / "serve2"
    exp_dir.mkdir()
    (exp_dir / "config.json").write_text(cfg.to_json())
    model = build_model(cfg)
    variables = init_variables(model, cfg, 1)
    save_checkpoint(str(exp_dir), 1, {
        "params": variables["params"],
        "batch_stats": variables.get("batch_stats", {}),
    })

    sess = PoserSession.from_experiment(str(exp_dir), batch_size=2, dtype="float32")
    out = sess.predict_crops(
        rng.uniform(size=(2, 1, 32, 32, 3)).astype(np.float32),
        np.tile(np.asarray([10, 10, 60, 60], np.float32), (2, 1, 1)),
        np.zeros((2, 1), np.float32),
        np.full((2, 1, 2), 100.0, np.float32),
        np.full((2, 1, 2), 16.0, np.float32),
    )
    assert np.isfinite(out["joint_cam"]).all()
