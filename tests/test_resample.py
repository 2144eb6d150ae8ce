"""Resampling ops vs torch grid_sample ground truth (kornia conventions)."""

import jax.numpy as jnp
import numpy as np
import pytest

from cs_vit_tpu.ops.resample import (
    bbox_to_corners,
    crop_and_resize,
    crop_and_resize_np,
    crop_with_square_box_np,
    expand_bbox_square,
    scale_rotate_img,
)

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def torch_crop_gt(images_nchw, corners, out_size):
    """Ground truth: affine grid from corner map + grid_sample(align_corners=True)."""
    N, C, H, W = images_nchw.shape
    h, w = out_size
    outs = []
    for i in range(N):
        tl, tr, br, bl = corners[i]
        xs = np.linspace(0, 1, w)
        ys = np.linspace(0, 1, h)
        gx = tl[None, None] + xs[None, :, None] * (tr - tl)[None, None] \
            + ys[:, None, None] * (bl - tl)[None, None]
        # to normalized coords (align_corners=True)
        gn = np.stack(
            [2 * gx[..., 0] / (W - 1) - 1, 2 * gx[..., 1] / (H - 1) - 1], axis=-1
        )
        out = F.grid_sample(
            torch.from_numpy(images_nchw[i : i + 1]),
            torch.from_numpy(gn[None]).float(),
            mode="bilinear",
            padding_mode="zeros",
            align_corners=True,
        )
        outs.append(out[0].numpy())
    return np.stack(outs)


def test_axis_aligned_crop_matches_grid_sample(rng):
    imgs = rng.uniform(size=(3, 40, 50, 2)).astype(np.float32)
    bboxes = np.asarray(
        [[5.0, 6.0, 30.0, 31.0], [-4.0, 2.0, 20.0, 26.0], [10.0, 10.0, 55.0, 55.0]],
        np.float32,
    )  # includes out-of-bounds boxes -> zero padding
    corners = bbox_to_corners(bboxes)
    ours_np = crop_and_resize_np(imgs, corners, (16, 16))
    ours_jax = np.asarray(crop_and_resize(jnp.asarray(imgs), jnp.asarray(corners), (16, 16)))
    gt = torch_crop_gt(imgs.transpose(0, 3, 1, 2), corners, (16, 16)).transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours_np, gt, atol=1e-5)
    np.testing.assert_allclose(ours_jax, gt, atol=1e-5)


def test_rotated_corner_crop_matches_grid_sample(rng):
    """The DexYCB/HO3D train augmentation path: rotated square corners."""
    imgs = rng.uniform(size=(2, 48, 48, 3)).astype(np.float32)
    theta = np.asarray([0.4, -1.1])
    c = 24.0
    half = 12.0
    corners = []
    for t in theta:
        R = np.asarray([[np.cos(t), -np.sin(t)], [np.sin(t), np.cos(t)]])
        base = np.asarray([[-half, -half], [half, -half], [half, half], [-half, half]])
        corners.append(base @ R.T + c)
    corners = np.asarray(corners, np.float32)
    ours = crop_and_resize_np(imgs, corners, (20, 20))
    ours_jax = np.asarray(crop_and_resize(jnp.asarray(imgs), jnp.asarray(corners), (20, 20)))
    gt = torch_crop_gt(imgs.transpose(0, 3, 1, 2), corners, (20, 20)).transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, gt, atol=1e-5)
    np.testing.assert_allclose(ours_jax, gt, atol=1e-5)


def test_expand_bbox_square():
    bb = np.asarray([[0.0, 0.0, 10.0, 20.0]], np.float32)
    sq = expand_bbox_square(bb, 1.0)
    np.testing.assert_allclose(sq[0], [-5.0, 0.0, 15.0, 20.0])
    sq2 = expand_bbox_square(bb, 2.0)
    np.testing.assert_allclose(sq2[0], [-15.0, -10.0, 25.0, 30.0])


def test_crop_with_square_box_outputs(rng):
    imgs = rng.uniform(size=(2, 64, 64, 3)).astype(np.float32)
    tight = np.asarray([[10, 12, 40, 30], [5, 5, 25, 45]], np.float32)
    patches, scales, squares = crop_with_square_box_np(imgs, tight, 2.0, 32)
    assert patches.shape == (2, 32, 32, 3)
    # square box side = max(w,h) * ratio
    np.testing.assert_allclose(squares[0, 2] - squares[0, 0], 30 * 2.0)
    np.testing.assert_allclose(scales[0], 60.0 / 32.0)


def test_scale_rotate_identity(rng):
    imgs = rng.uniform(size=(1, 16, 16, 1)).astype(np.float32)
    out = np.asarray(
        scale_rotate_img(jnp.asarray(imgs), jnp.ones(1), jnp.zeros(1))
    )
    np.testing.assert_allclose(out, imgs, atol=1e-6)


def test_scale_rotate_matches_kornia_convention(rng):
    """Ground truth via torch affine_grid with kornia's rotation matrix."""
    imgs = rng.uniform(size=(1, 17, 23, 2)).astype(np.float32)
    N, H, W, C = imgs.shape
    angle, scale = 33.0, 1.2

    # kornia get_rotation_matrix2d: alpha = s*cos, beta = s*sin
    # M = [[alpha, beta, (1-alpha)*cx - beta*cy], [-beta, alpha, beta*cx + (1-alpha)*cy]]
    a = np.deg2rad(angle)
    alpha, beta = scale * np.cos(a), scale * np.sin(a)
    cx, cy = W / 2.0, H / 2.0
    M = np.asarray(
        [
            [alpha, beta, (1 - alpha) * cx - beta * cy],
            [-beta, alpha, beta * cx + (1 - alpha) * cy],
        ]
    )
    # dst->src map in pixel coords
    Minv = np.linalg.inv(np.vstack([M, [0, 0, 1]]))[:2]
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    pts = np.stack([xs, ys, np.ones_like(xs)], axis=-1).astype(np.float64)
    src = pts @ Minv.T  # [H,W,2]
    gn = np.stack(
        [2 * src[..., 0] / (W - 1) - 1, 2 * src[..., 1] / (H - 1) - 1], axis=-1
    )
    gt = F.grid_sample(
        torch.from_numpy(imgs.transpose(0, 3, 1, 2)).double(),
        torch.from_numpy(gn[None]),
        mode="bilinear",
        padding_mode="reflection",
        align_corners=True,
    ).numpy().transpose(0, 2, 3, 1)

    ours = np.asarray(
        scale_rotate_img(
            jnp.asarray(imgs), jnp.asarray([scale]), jnp.asarray([angle])
        )
    )
    np.testing.assert_allclose(ours, gt, atol=2e-3)


def test_native_fastcrop_matches_numpy(rng):
    """C fast path == numpy path to float rounding (same arithmetic)."""
    from cs_vit_tpu import native
    from cs_vit_tpu.ops import resample

    if not native.native_available():
        pytest.skip("no C compiler available")

    imgs = rng.uniform(size=(3, 37, 53, 3)).astype(np.float32)
    theta = np.asarray([0.0, 0.7, -2.0])
    corners = []
    for t in theta:
        R = np.asarray([[np.cos(t), -np.sin(t)], [np.sin(t), np.cos(t)]])
        base = np.asarray([[-20, -15], [20, -15], [20, 15], [-20, 15]], np.float64)
        corners.append(base @ R.T + [26, 18])
    corners = np.asarray(corners, np.float32)

    fast = native.crop_affine_bilinear_batch(imgs, corners, 24, 32)
    slow = np.empty((3, 24, 32, 3), np.float32)
    for i in range(3):
        grid = resample._sample_coords(corners[i], 24, 32, np)
        slow[i] = resample._bilinear_gather_np(imgs[i], grid)
    np.testing.assert_allclose(fast, slow, atol=2e-6)


def test_native_fastcrop_speed(rng):
    """Native crop must beat numpy by a wide margin (the point of it)."""
    import time

    from cs_vit_tpu import native

    if not native.native_available():
        pytest.skip("no C compiler available")
    from cs_vit_tpu.ops import resample

    img = rng.uniform(size=(1, 480, 640, 3)).astype(np.float32)
    corners = np.asarray([[[100, 100], [400, 100], [400, 400], [100, 400]]], np.float32)

    t0 = time.perf_counter()
    for _ in range(5):
        native.crop_affine_bilinear_batch(img, corners, 256, 256)
    t_native = (time.perf_counter() - t0) / 5

    t0 = time.perf_counter()
    grid = resample._sample_coords(corners[0], 256, 256, np)
    for _ in range(5):
        resample._bilinear_gather_np(img[0], grid)
    t_np = (time.perf_counter() - t0) / 5
    assert t_native < t_np / 3, f"native {t_native*1e3:.2f}ms vs numpy {t_np*1e3:.2f}ms"


def test_uint8_crop_matches_float():
    """uint8-source crop (1/255 folded into the kernel) must match the
    float-source path to float rounding, through both the native C kernel
    and the numpy fallback."""
    rng = np.random.default_rng(12)
    imgs_u8 = rng.integers(0, 256, (3, 40, 48, 3), dtype=np.uint8)
    imgs_f32 = imgs_u8.astype(np.float32) / 255.0
    corners = np.stack(
        [
            np.array([[4.5, 3.2], [43.1, 3.2], [43.1, 36.9], [4.5, 36.9]]),
            np.array([[-5.0, -2.0], [30.0, -2.0], [30.0, 30.0], [-5.0, 30.0]]),
            np.array([[10.0, 10.0], [52.0, 10.0], [52.0, 45.0], [10.0, 45.0]]),
        ]
    ).astype(np.float32)
    out_u8 = crop_and_resize_np(imgs_u8, corners, (16, 16))
    out_f32 = crop_and_resize_np(imgs_f32, corners, (16, 16))
    assert out_u8.dtype == np.float32
    np.testing.assert_allclose(out_u8, out_f32, atol=2e-6)

    import os
    os.environ["CSVIT_DISABLE_NATIVE"] = "1"
    try:
        import cs_vit_tpu.native as native_mod
        old_lib, old_tried = native_mod._lib, native_mod._tried
        native_mod._lib, native_mod._tried = None, True
        out_np = crop_and_resize_np(imgs_u8, corners, (16, 16))
        np.testing.assert_allclose(out_np, out_f32, atol=2e-6)
    finally:
        del os.environ["CSVIT_DISABLE_NATIVE"]
        native_mod._lib, native_mod._tried = old_lib, old_tried
