"""Rotation-representation conversions in pure jax.numpy.

Functionally equivalent to the reference's pytorch3d-derived converters
(`cs_vit/utils/geometry.py`), re-derived branch-free for XLA: every
data-dependent branch of the original (near-pi handling, sign selection)
is a `jnp.where`, so everything here traces cleanly under `jax.jit` and
differentiates.

Conventions: quaternions are (w, x, y, z) real-part-first; axis-angle is a
3-vector whose magnitude is the rotation angle (radians, CCW about the axis);
matrices act on column vectors (y = R @ v).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS_NORMALIZE = 1e-12


def _normalize(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """L2-normalize along `axis` (clamped denominator, torch.F.normalize style)."""
    n = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(n, _EPS_NORMALIZE)


def _sinc(x: jnp.ndarray) -> jnp.ndarray:
    """Normalized sinc: sin(pi x) / (pi x), sinc(0) = 1 (matches torch.sinc)."""
    return jnp.sinc(x)


def safe_norm(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """L2 norm with a zero subgradient at x == 0 (torch.norm semantics).

    jnp.linalg.norm backpropagates NaN through exactly-zero vectors; losses
    like root-relative joint error hit that case at the wrist joint.
    """
    sq = jnp.sum(x * x, axis=axis)
    is_zero = sq == 0
    safe = jnp.where(is_zero, 1.0, sq)
    return jnp.where(is_zero, 0.0, jnp.sqrt(safe))


def rotation_matrix_z(rad: jnp.ndarray) -> jnp.ndarray:
    """Right-handed rotation about +z; `rad` has shape [...]; returns [..., 3, 3]."""
    c, s = jnp.cos(rad), jnp.sin(rad)
    z = jnp.zeros_like(rad)
    o = jnp.ones_like(rad)
    return jnp.stack(
        [c, -s, z, s, c, z, z, z, o], axis=-1
    ).reshape(rad.shape + (3, 3))


def rotation_matrix_x(rad: jnp.ndarray) -> jnp.ndarray:
    """Right-handed rotation about +x; shape as `rotation_matrix_z`."""
    c, s = jnp.cos(rad), jnp.sin(rad)
    z = jnp.zeros_like(rad)
    o = jnp.ones_like(rad)
    return jnp.stack(
        [o, z, z, z, c, -s, z, s, c], axis=-1
    ).reshape(rad.shape + (3, 3))


def rotation_matrix_y(rad: jnp.ndarray, compat: bool = True) -> jnp.ndarray:
    """Rotation about +y.

    With ``compat=True`` (default) this reproduces the reference's
    non-standard matrix fill (`cs_vit/utils/geometry.py:77-108`:
    rows [sin, 0, cos; 0, 1, 0; cos, 0, -sin]) because released checkpoints
    using `global_positioning="orientation"` were trained against it.
    ``compat=False`` gives the textbook right-handed y-rotation.
    """
    c, s = jnp.cos(rad), jnp.sin(rad)
    z = jnp.zeros_like(rad)
    o = jnp.ones_like(rad)
    if compat:
        flat = jnp.stack([s, z, c, z, o, z, c, z, -s], axis=-1)
    else:
        flat = jnp.stack([c, z, s, z, o, z, -s, z, c], axis=-1)
    return flat.reshape(rad.shape + (3, 3))


def rotation_6d_to_matrix(d6: jnp.ndarray) -> jnp.ndarray:
    """6D rotation representation (Zhou et al. 2019) -> rotation matrix.

    Gram-Schmidt on the two 3-vectors; rows of the result are the basis
    (matches reference `cs_vit/utils/geometry.py:111-132`).
    """
    a1, a2 = d6[..., :3], d6[..., 3:]
    b1 = _normalize(a1)
    b2 = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = _normalize(b2)
    b3 = jnp.cross(b1, b2)
    return jnp.stack((b1, b2, b3), axis=-2)


def matrix_to_rotation_6d(matrix: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> 6D representation (first two rows, flattened)."""
    return matrix[..., :2, :].reshape(matrix.shape[:-2] + (6,))


def standardize_quaternion(quaternions: jnp.ndarray) -> jnp.ndarray:
    """Flip sign so the real part is non-negative."""
    return jnp.where(quaternions[..., 0:1] < 0, -quaternions, quaternions)


def _sqrt_positive_part(x: jnp.ndarray) -> jnp.ndarray:
    """sqrt(max(0, x)) with zero subgradient at x <= 0."""
    positive = x > 0
    safe = jnp.where(positive, x, 1.0)
    return jnp.where(positive, jnp.sqrt(safe), jnp.zeros_like(x))


def matrix_to_quaternion(matrix: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrices [..., 3, 3] -> quaternions [..., 4] (w, x, y, z).

    Branch-free rewrite of the pytorch3d candidate-selection algorithm
    (reference `cs_vit/utils/geometry.py:164-223`).
    """
    batch_dim = matrix.shape[:-2]
    m = matrix.reshape(batch_dim + (9,))
    m00, m01, m02, m10, m11, m12, m20, m21, m22 = jnp.moveaxis(m, -1, 0)

    q_abs = _sqrt_positive_part(
        jnp.stack(
            [
                1.0 + m00 + m11 + m22,
                1.0 + m00 - m11 - m22,
                1.0 - m00 + m11 - m22,
                1.0 - m00 - m11 + m22,
            ],
            axis=-1,
        )
    )

    quat_by_rijk = jnp.stack(
        [
            jnp.stack([q_abs[..., 0] ** 2, m21 - m12, m02 - m20, m10 - m01], axis=-1),
            jnp.stack([m21 - m12, q_abs[..., 1] ** 2, m10 + m01, m02 + m20], axis=-1),
            jnp.stack([m02 - m20, m10 + m01, q_abs[..., 2] ** 2, m12 + m21], axis=-1),
            jnp.stack([m10 - m01, m20 + m02, m21 + m12, q_abs[..., 3] ** 2], axis=-1),
        ],
        axis=-2,
    )

    flr = jnp.asarray(0.1, dtype=q_abs.dtype)
    quat_candidates = quat_by_rijk / (2.0 * jnp.maximum(q_abs[..., None], flr))

    best = jnp.argmax(q_abs, axis=-1)
    onehot = jax.nn.one_hot(best, 4, dtype=quat_candidates.dtype)
    out = jnp.sum(quat_candidates * onehot[..., None], axis=-2)
    return standardize_quaternion(out)


def quaternion_to_matrix(quaternions: jnp.ndarray) -> jnp.ndarray:
    """Quaternions [..., 4] (w, x, y, z) -> rotation matrices [..., 3, 3]."""
    r, i, j, k = jnp.moveaxis(quaternions, -1, 0)
    two_s = 2.0 / jnp.sum(quaternions * quaternions, axis=-1)
    o = jnp.stack(
        (
            1 - two_s * (j * j + k * k),
            two_s * (i * j - k * r),
            two_s * (i * k + j * r),
            two_s * (i * j + k * r),
            1 - two_s * (i * i + k * k),
            two_s * (j * k - i * r),
            two_s * (i * k - j * r),
            two_s * (j * k + i * r),
            1 - two_s * (i * i + j * j),
        ),
        axis=-1,
    )
    return o.reshape(quaternions.shape[:-1] + (3, 3))


def quaternion_to_axis_angle(quaternions: jnp.ndarray) -> jnp.ndarray:
    """Quaternions [..., 4] -> axis-angle [..., 3]."""
    norms = jnp.linalg.norm(quaternions[..., 1:], axis=-1, keepdims=True)
    half_angles = jnp.arctan2(norms, quaternions[..., :1])
    sin_half_over = 0.5 * _sinc(half_angles / jnp.pi)
    return quaternions[..., 1:] / sin_half_over


def axis_angle_to_quaternion(axis_angle: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle [..., 3] -> quaternions [..., 4] (w, x, y, z)."""
    angles = jnp.linalg.norm(axis_angle, axis=-1, keepdims=True)
    sin_half_over = 0.5 * _sinc(angles * 0.5 / jnp.pi)
    return jnp.concatenate(
        [jnp.cos(angles * 0.5), axis_angle * sin_half_over], axis=-1
    )


def axis_angle_to_matrix(axis_angle: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle [..., 3] -> rotation matrices [..., 3, 3] (Rodrigues, branch-free)."""
    shape = axis_angle.shape
    angles = jnp.linalg.norm(axis_angle, axis=-1, keepdims=True)[..., None]

    rx, ry, rz = axis_angle[..., 0], axis_angle[..., 1], axis_angle[..., 2]
    zeros = jnp.zeros(shape[:-1], dtype=axis_angle.dtype)
    K = jnp.stack(
        [zeros, -rz, ry, rz, zeros, -rx, -ry, rx, zeros], axis=-1
    ).reshape(shape + (3,))
    K2 = K @ K

    eye = jnp.eye(3, dtype=axis_angle.dtype)
    angles_sq = angles * angles
    angles_sq = jnp.where(angles_sq == 0, 1.0, angles_sq)
    return (
        eye
        + _sinc(angles / jnp.pi) * K
        + ((1 - jnp.cos(angles)) / angles_sq) * K2
    )


def matrix_to_axis_angle(matrix: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrices [..., 3, 3] -> axis-angle [..., 3].

    Uses the quaternion route (the reference default, `geometry.py:297-298`)
    which is well-conditioned near pi and has no data-dependent branches.
    """
    return quaternion_to_axis_angle(matrix_to_quaternion(matrix))
