"""Heatmap / projection / patch-transform utilities (vendored-IH26M parity).

JAX/numpy ports of the remaining InterWild-style numeric helpers
(`cs_vit/dataset/InterHand26M/utils/transforms.py:46-85` and
`utils/preprocessing.py:150-231`): differentiable soft-argmax over 2D/3D
heatmaps, fisheye-distorted projection, and the 3-point affine patch
transform used for crop augmentation.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np


def soft_argmax_2d(heatmap2d: jnp.ndarray) -> jnp.ndarray:
    """[B, J, H, W] logits -> [B, J, 2] expected (x, y) coordinates."""
    B, J, H, W = heatmap2d.shape
    p = jax.nn.softmax(heatmap2d.reshape(B, J, H * W), axis=2).reshape(B, J, H, W)
    accu_x = p.sum(axis=2) * jnp.arange(W, dtype=p.dtype)
    accu_y = p.sum(axis=3) * jnp.arange(H, dtype=p.dtype)
    return jnp.stack([accu_x.sum(axis=2), accu_y.sum(axis=2)], axis=2)


def soft_argmax_3d(heatmap3d: jnp.ndarray) -> jnp.ndarray:
    """[B, J, D, H, W] logits -> [B, J, 3] expected (x, y, z) coordinates."""
    B, J, D, H, W = heatmap3d.shape
    p = jax.nn.softmax(heatmap3d.reshape(B, J, -1), axis=2).reshape(B, J, D, H, W)
    accu_x = p.sum(axis=(2, 3)) * jnp.arange(W, dtype=p.dtype)
    accu_y = p.sum(axis=(2, 4)) * jnp.arange(H, dtype=p.dtype)
    accu_z = p.sum(axis=(3, 4)) * jnp.arange(D, dtype=p.dtype)
    return jnp.stack(
        [accu_x.sum(axis=2), accu_y.sum(axis=2), accu_z.sum(axis=2)], axis=2
    )


def distort_projection_fisheye(
    point: jnp.ndarray,    # [B, J, 3] camera coords
    focal: jnp.ndarray,    # [B, 2]
    princpt: jnp.ndarray,  # [B, 2]
    D: jnp.ndarray,        # [B, 4] distortion coefficients
) -> jnp.ndarray:
    """Kannala-Brandt fisheye projection -> [B, J, 3] (u, v, z)."""
    z = point[:, :, 2]
    ndc = point[:, :, :2] / z[:, :, None]
    r = jnp.sqrt(jnp.sum(ndc**2, axis=2))
    theta = jnp.arctan(r)
    theta_d = theta * (
        1
        + D[:, None, 0] * theta**2
        + D[:, None, 1] * theta**4
        + D[:, None, 2] * theta**6
        + D[:, None, 3] * theta**8
    )
    ndc = ndc * (theta_d / jnp.maximum(r, 1e-12))[:, :, None]
    u = ndc[:, :, 0] * focal[:, None, 0] + princpt[:, None, 0]
    v = ndc[:, :, 1] * focal[:, None, 1] + princpt[:, None, 1]
    return jnp.stack([u, v, z], axis=2)


def _rotate_2d(pt: np.ndarray, rot_rad: float) -> np.ndarray:
    sn, cs = np.sin(rot_rad), np.cos(rot_rad)
    return np.asarray(
        [pt[0] * cs - pt[1] * sn, pt[0] * sn + pt[1] * cs], np.float32
    )


def gen_trans_from_patch(
    c_x: float, c_y: float,
    src_width: float, src_height: float,
    dst_width: float, dst_height: float,
    scale: float, rot_deg: float, inv: bool = False,
) -> np.ndarray:
    """2x3 affine mapping a (scaled, rotated) source patch to the dst rect.

    Port of ``gen_trans_from_patch_cv`` (preprocessing.py:174-207) without the
    cv2.getAffineTransform dependency: the transform is solved from the same
    3 point correspondences (center, center+down, center+right).
    """
    src_w, src_h = src_width * scale, src_height * scale
    rot_rad = np.pi * rot_deg / 180.0
    src_center = np.asarray([c_x, c_y], np.float32)
    src_down = _rotate_2d(np.asarray([0, src_h * 0.5], np.float32), rot_rad)
    src_right = _rotate_2d(np.asarray([src_w * 0.5, 0], np.float32), rot_rad)

    dst_center = np.asarray([dst_width * 0.5, dst_height * 0.5], np.float32)
    dst_down = np.asarray([0, dst_height * 0.5], np.float32)
    dst_right = np.asarray([dst_width * 0.5, 0], np.float32)

    src = np.stack([src_center, src_center + src_down, src_center + src_right])
    dst = np.stack([dst_center, dst_center + dst_down, dst_center + dst_right])
    if inv:
        src, dst = dst, src

    # solve [x y 1] @ M^T = dst for the 2x3 affine M
    A = np.concatenate([src, np.ones((3, 1), np.float32)], axis=1)
    M = np.linalg.solve(A, dst).T  # [2,3]
    return M.astype(np.float32)


def apply_affine(points: np.ndarray, trans: np.ndarray) -> np.ndarray:
    """[N,2] points through a 2x3 affine."""
    pts = np.concatenate([points, np.ones((len(points), 1), points.dtype)], axis=1)
    return pts @ trans.T
