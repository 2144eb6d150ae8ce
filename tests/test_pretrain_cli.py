"""TI pretraining CLI smoke tests (tiny models, synthetic image folder)."""

import os

import numpy as np
import pytest

from cs_vit_tpu.cli.pretrain_ti import build_argparser, main
from cs_vit_tpu.data.fixtures import make_synthetic_image_folder


@pytest.fixture(scope="module")
def img_root(tmp_path_factory):
    return make_synthetic_image_folder(
        str(tmp_path_factory.mktemp("coco") / "imgs"), n=8, img_hw=(48, 48)
    )


def run_mode(mode, img_root, tmp_path, extra=()):
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        args = build_argparser().parse_args(
            [
                "--exp", f"smoke_{mode}", "--mode", mode,
                "--dataset", "coco", "--data_root", img_root,
                "--img_size", "32", "--patch_size", "8",
                "--hidden_size", "16", "--num_layers", "1", "--num_heads", "2",
                "--epochs", "1", "--batch_size", "4", "--log_every", "1",
                *extra,
            ]
        )
        main(args)
        assert os.path.exists(f"checkpoints/smoke_{mode}/checkpoint_1")
    finally:
        os.chdir(cwd)


def test_tivit_pretrain(img_root, tmp_path):
    run_mode("tivit", img_root, tmp_path)


def test_dino_stage(img_root, tmp_path):
    run_mode("dino", img_root, tmp_path)


def test_ti_stage(img_root, tmp_path):
    run_mode("ti", img_root, tmp_path)
