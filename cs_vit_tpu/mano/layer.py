"""MANO forward kinematics (linear blend skinning) in pure JAX.

Replaces the reference's torch ``smplx`` MANO layer
(`cs_vit/net/ti_poser.py:268-270`, `cs_vit/utils/mano.py:27-230`) with a
jit-friendly implementation: shape blendshapes + pose-corrective blendshapes +
per-joint rigid transform chain + LBS, all as batched matmuls that XLA maps
onto the MXU. The 16-step kinematic chain is statically unrolled (J=16 is a
compile-time constant).

Outputs are in meters, matching smplx.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..constants import (
    FINGERTIP_VERTEX_IDX,
    MANO_JOINTS_ORDER,
    NUM_MANO_JOINTS,
    TARGET_JOINTS_ORDER,
)
from ..core.geometry import axis_angle_to_matrix
from .assets import ManoAssets


def sh_joint_regressor(assets: ManoAssets) -> np.ndarray:
    """Build the 21-joint regressor in TARGET_JOINTS_ORDER.

    Rows for the 16 articulated joints come from the MANO ``J_regressor``
    (renamed from kinematic order to target order); the five fingertips are
    one-hot rows selecting mesh vertices (reference `utils/mano.py:149-171`).
    """
    V = assets.j_regressor.shape[1]
    out = np.zeros((len(TARGET_JOINTS_ORDER), V), dtype=np.float32)
    for src_idx, name in enumerate(MANO_JOINTS_ORDER):
        out[TARGET_JOINTS_ORDER.index(name)] = assets.j_regressor[src_idx]
    for name, vidx in FINGERTIP_VERTEX_IDX.items():
        row = np.zeros(V, dtype=np.float32)
        row[vidx] = 1.0
        out[TARGET_JOINTS_ORDER.index(name)] = row
    return out


class ManoLayer:
    """Batched MANO LBS: (betas, global_orient, hand_pose) -> vertices/joints."""

    def __init__(
        self,
        assets: ManoAssets,
        flat_hand_mean: bool = False,
        dtype: jnp.dtype = jnp.float32,
    ):
        self.assets = assets
        self.flat_hand_mean = flat_hand_mean
        self.dtype = dtype

        self.v_template = jnp.asarray(assets.v_template, dtype)        # [V,3]
        self.shapedirs = jnp.asarray(assets.shapedirs, dtype)          # [V,3,10]
        self.posedirs = jnp.asarray(assets.posedirs, dtype)            # [135,V*3]
        self.j_regressor = jnp.asarray(assets.j_regressor, dtype)      # [16,V]
        self.lbs_weights = jnp.asarray(assets.lbs_weights, dtype)      # [V,16]
        self.parents = np.asarray(assets.parents)                      # [16] static
        mean = np.zeros(45) if flat_hand_mean else assets.hands_mean
        self.pose_mean = jnp.asarray(
            np.concatenate([np.zeros(3), mean]), dtype
        )  # [48]

    @property
    def num_verts(self) -> int:
        return self.v_template.shape[0]

    def __call__(
        self,
        betas: jnp.ndarray,          # [B,10]
        global_orient: jnp.ndarray,  # [B,3] axis-angle
        hand_pose: jnp.ndarray,      # [B,45] axis-angle (15 joints)
        transl: Optional[jnp.ndarray] = None,  # [B,3]
    ) -> dict:
        B = betas.shape[0]
        J = NUM_MANO_JOINTS

        full_pose = jnp.concatenate([global_orient, hand_pose], axis=-1)
        full_pose = full_pose + self.pose_mean

        # Shape blendshapes: v_shaped = T + shapedirs . betas
        v_shaped = self.v_template + jnp.einsum(
            "bl,vdl->bvd", betas.astype(self.dtype), self.shapedirs
        )
        joints = jnp.einsum("jv,bvd->bjd", self.j_regressor, v_shaped)  # [B,16,3]

        # Pose-corrective blendshapes from the 15 non-root rotations.
        rot_mats = axis_angle_to_matrix(full_pose.reshape(B, J, 3))    # [B,16,3,3]
        eye = jnp.eye(3, dtype=self.dtype)
        pose_feature = (rot_mats[:, 1:] - eye).reshape(B, -1)          # [B,135]
        pose_offsets = (pose_feature @ self.posedirs).reshape(B, -1, 3)
        v_posed = v_shaped + pose_offsets

        # Forward-kinematic chain (statically unrolled over 16 joints).
        rel_joints = joints.at[:, 1:].add(-joints[:, self.parents[1:]])
        transforms_mat = jnp.concatenate(
            [
                jnp.concatenate([rot_mats, rel_joints[..., None]], axis=-1),
                jnp.broadcast_to(
                    jnp.asarray([0.0, 0.0, 0.0, 1.0], self.dtype), (B, J, 1, 4)
                ),
            ],
            axis=-2,
        )  # [B,16,4,4]

        chain = [transforms_mat[:, 0]]
        for i in range(1, J):
            chain.append(chain[self.parents[i]] @ transforms_mat[:, i])
        transforms = jnp.stack(chain, axis=1)                          # [B,16,4,4]

        posed_joints = transforms[:, :, :3, 3]                         # [B,16,3]

        # Remove the rest-pose joint location from each transform (smplx style).
        joints_h = jnp.concatenate([joints, jnp.zeros((B, J, 1), self.dtype)], -1)
        correction = jnp.einsum("bjik,bjk->bji", transforms, joints_h) # [B,16,4]
        rel_transforms = transforms.at[:, :, :, 3].add(-correction)

        # Linear blend skinning.
        T = jnp.einsum("vj,bjik->bvik", self.lbs_weights, rel_transforms)
        v_h = jnp.concatenate(
            [v_posed, jnp.ones((B, v_posed.shape[1], 1), self.dtype)], axis=-1
        )
        verts = jnp.einsum("bvik,bvk->bvi", T, v_h)[..., :3]

        if transl is not None:
            verts = verts + transl[:, None]
            posed_joints = posed_joints + transl[:, None]

        return {"vertices": verts, "joints": posed_joints}
