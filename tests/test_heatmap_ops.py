"""Soft-argmax / fisheye / affine-patch helper tests."""

import numpy as np
import pytest

import jax.numpy as jnp

from cs_vit_tpu.ops.heatmap import (
    apply_affine,
    distort_projection_fisheye,
    gen_trans_from_patch,
    soft_argmax_2d,
    soft_argmax_3d,
)


def test_soft_argmax_2d_peak(rng):
    H, W = 16, 24
    hm = np.full((2, 3, H, W), -20.0, np.float32)
    peaks = [(4, 7), (11, 2), (9, 20)]
    for j, (y, x) in enumerate(peaks):
        hm[:, j, y, x] = 20.0
    out = np.asarray(soft_argmax_2d(jnp.asarray(hm)))
    for j, (y, x) in enumerate(peaks):
        np.testing.assert_allclose(out[:, j], np.tile([x, y], (2, 1)), atol=1e-2)


def test_soft_argmax_3d_peak():
    D, H, W = 6, 8, 10
    hm = np.full((1, 2, D, H, W), -20.0, np.float32)
    hm[0, 0, 2, 3, 4] = 20.0
    hm[0, 1, 5, 1, 9] = 20.0
    out = np.asarray(soft_argmax_3d(jnp.asarray(hm)))
    np.testing.assert_allclose(out[0, 0], [4, 3, 2], atol=1e-2)
    np.testing.assert_allclose(out[0, 1], [9, 1, 5], atol=1e-2)


def test_fisheye_zero_distortion_is_pinhole(rng):
    pts = np.stack(
        [
            rng.uniform(-0.02, 0.02, (1, 5)),
            rng.uniform(-0.02, 0.02, (1, 5)),
            rng.uniform(0.4, 0.6, (1, 5)),
        ],
        axis=-1,
    ).astype(np.float32)
    focal = np.asarray([[300.0, 300.0]], np.float32)
    princpt = np.asarray([[160.0, 120.0]], np.float32)
    D = np.zeros((1, 4), np.float32)
    out = np.asarray(
        distort_projection_fisheye(
            jnp.asarray(pts), jnp.asarray(focal), jnp.asarray(princpt), jnp.asarray(D)
        )
    )
    # with tiny angles and D=0, theta_d/r ~ atan(r)/r ~ 1
    u = 300.0 * pts[..., 0] / pts[..., 2] + 160.0
    np.testing.assert_allclose(out[..., 0], u, rtol=1e-3)
    np.testing.assert_allclose(out[..., 2], pts[..., 2])


def test_gen_trans_from_patch_identity_and_roundtrip():
    # identity: same src/dst geometry
    M = gen_trans_from_patch(50, 40, 100, 80, 100, 80, 1.0, 0.0)
    pts = np.asarray([[0.0, 0.0], [50.0, 40.0], [99.0, 79.0]], np.float32)
    np.testing.assert_allclose(apply_affine(pts, M), pts, atol=1e-4)

    # forward then inverse returns originals
    M = gen_trans_from_patch(64, 48, 120, 90, 32, 32, 1.2, 33.0)
    Mi = gen_trans_from_patch(64, 48, 120, 90, 32, 32, 1.2, 33.0, inv=True)
    out = apply_affine(pts, M)
    back = apply_affine(out, Mi)
    np.testing.assert_allclose(back, pts, atol=1e-3)

    # cv2 ground truth for the same 3-point problem
    import cv2

    src = np.asarray([[64, 48], [64, 48 + 54 * 0.0 + 0], [64 + 0, 48]], np.float32)
    # use cv2.getAffineTransform on the same correspondences the helper builds
    rot_rad = np.pi * 33.0 / 180
    sw, sh = 120 * 1.2, 90 * 1.2
    sd = np.asarray([-np.sin(rot_rad) * sh * 0.5, np.cos(rot_rad) * sh * 0.5])
    sr = np.asarray([np.cos(rot_rad) * sw * 0.5, np.sin(rot_rad) * sw * 0.5])
    src = np.stack([[64, 48], np.asarray([64, 48]) + sd, np.asarray([64, 48]) + sr]).astype(np.float32)
    dst = np.asarray([[16, 16], [16, 32], [32, 16]], np.float32)
    M_cv = cv2.getAffineTransform(src, dst)
    np.testing.assert_allclose(M, M_cv, atol=1e-4)
