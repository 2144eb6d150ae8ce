"""Unit tests for cs_vit_tpu.core.geometry against scipy closed forms."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from cs_vit_tpu.core import geometry as G

jax.config.update("jax_enable_x64", False)


def random_rotvecs(rng, n=64, max_angle=np.pi - 1e-3):
    axes = rng.normal(size=(n, 3))
    axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
    angles = rng.uniform(0, max_angle, size=(n, 1))
    return (axes * angles).astype(np.float32)


def test_axis_angle_to_matrix_vs_scipy(rng):
    aa = random_rotvecs(rng)
    ours = np.asarray(G.axis_angle_to_matrix(jnp.asarray(aa)))
    ref = Rotation.from_rotvec(aa).as_matrix()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_matrix_to_axis_angle_roundtrip(rng):
    aa = random_rotvecs(rng)
    mat = Rotation.from_rotvec(aa).as_matrix().astype(np.float32)
    ours = np.asarray(G.matrix_to_axis_angle(jnp.asarray(mat)))
    ref = Rotation.from_matrix(mat).as_rotvec()
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_matrix_to_axis_angle_near_pi(rng):
    # Angles very close to pi exercise the ill-conditioned region.
    aa = random_rotvecs(rng, n=32)
    aa = aa / np.linalg.norm(aa, axis=-1, keepdims=True) * (np.pi - 1e-4)
    mat = Rotation.from_rotvec(aa).as_matrix().astype(np.float32)
    ours = np.asarray(G.matrix_to_axis_angle(jnp.asarray(mat)))
    rec = Rotation.from_rotvec(ours).as_matrix()
    np.testing.assert_allclose(rec, mat, atol=1e-3)


def test_quaternion_conversions(rng):
    aa = random_rotvecs(rng)
    q = np.asarray(G.axis_angle_to_quaternion(jnp.asarray(aa)))
    # scipy quats are (x,y,z,w); ours (w,x,y,z)
    q_scipy = Rotation.from_rotvec(aa).as_quat()
    q_scipy_wfirst = np.concatenate([q_scipy[:, 3:], q_scipy[:, :3]], axis=-1)
    sign = np.sign(q_scipy_wfirst[:, :1])
    sign[sign == 0] = 1.0
    np.testing.assert_allclose(q, q_scipy_wfirst * sign, atol=1e-5)

    mat = np.asarray(G.quaternion_to_matrix(jnp.asarray(q)))
    np.testing.assert_allclose(mat, Rotation.from_rotvec(aa).as_matrix(), atol=1e-5)

    q_back = np.asarray(G.matrix_to_quaternion(jnp.asarray(mat)))
    np.testing.assert_allclose(q_back, q, atol=1e-5)


def test_rotation_6d_roundtrip(rng):
    aa = random_rotvecs(rng)
    mat = Rotation.from_rotvec(aa).as_matrix().astype(np.float32)
    d6 = np.asarray(G.matrix_to_rotation_6d(jnp.asarray(mat)))
    mat_back = np.asarray(G.rotation_6d_to_matrix(jnp.asarray(d6)))
    np.testing.assert_allclose(mat_back, mat, atol=1e-5)


def test_rotation_6d_from_raw_is_orthonormal(rng):
    d6 = rng.normal(size=(32, 6)).astype(np.float32)
    mat = np.asarray(G.rotation_6d_to_matrix(jnp.asarray(d6)))
    eye = np.einsum("bij,bkj->bik", mat, mat)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(mat), 1.0, atol=1e-5)


def test_axis_rotation_matrices(rng):
    rad = rng.uniform(-np.pi, np.pi, size=(16,)).astype(np.float32)

    def euler(axis, r):
        return Rotation.from_euler(axis, r[:, None]).as_matrix()
    np.testing.assert_allclose(
        np.asarray(G.rotation_matrix_z(jnp.asarray(rad))),
        euler("z", rad),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(G.rotation_matrix_x(jnp.asarray(rad))),
        euler("x", rad),
        atol=1e-5,
    )
    # Standard mode matches scipy; compat mode replicates the reference fill.
    np.testing.assert_allclose(
        np.asarray(G.rotation_matrix_y(jnp.asarray(rad), compat=False)),
        euler("y", rad),
        atol=1e-5,
    )
    compat = np.asarray(G.rotation_matrix_y(jnp.asarray(rad), compat=True))
    c, s = np.cos(rad), np.sin(rad)
    assert np.allclose(compat[:, 0, 0], s) and np.allclose(compat[:, 0, 2], c)
    assert np.allclose(compat[:, 2, 0], c) and np.allclose(compat[:, 2, 2], -s)


def test_zero_rotation_edge_cases():
    aa = jnp.zeros((4, 3))
    mat = G.axis_angle_to_matrix(aa)
    np.testing.assert_allclose(np.asarray(mat), np.broadcast_to(np.eye(3), (4, 3, 3)), atol=1e-6)
    aa_back = G.matrix_to_axis_angle(mat)
    np.testing.assert_allclose(np.asarray(aa_back), 0.0, atol=1e-6)


def test_geometry_is_jittable_and_differentiable(rng):
    aa = jnp.asarray(random_rotvecs(rng, n=8))

    @jax.jit
    def f(x):
        return jnp.sum(G.matrix_to_axis_angle(G.axis_angle_to_matrix(x)) ** 2)

    g = jax.grad(f)(aa)
    assert np.all(np.isfinite(np.asarray(g)))


def test_reorder_and_bone_length(rng):
    from cs_vit_tpu.constants import (
        HO3D_JOINTS_ORDER,
        TARGET_JOINTS_CONNECTION,
        TARGET_JOINTS_ORDER,
    )
    from cs_vit_tpu.core import joints as J

    x = rng.normal(size=(2, 21, 3)).astype(np.float32)
    y = np.asarray(
        J.reorder_joints(jnp.asarray(x), HO3D_JOINTS_ORDER, TARGET_JOINTS_ORDER)
    )
    for tgt_i, name in enumerate(TARGET_JOINTS_ORDER):
        src_i = HO3D_JOINTS_ORDER.index(name)
        np.testing.assert_array_equal(y[:, tgt_i], x[:, src_i])

    lengths = np.asarray(
        J.mean_connection_length(jnp.asarray(x), TARGET_JOINTS_CONNECTION)
    )
    ref = np.mean(
        [
            np.linalg.norm(x[:, a] - x[:, b], axis=-1)
            for a, b in TARGET_JOINTS_CONNECTION
        ],
        axis=0,
    )
    np.testing.assert_allclose(lengths, ref, rtol=1e-5)
