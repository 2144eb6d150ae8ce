"""Poser: camera-space MANO hand poser on a SwinV2 backbone, in flax.

Functional parity target: `cs_vit/net/ti_poser.py:185-855` (class ``Poser``),
rebuilt TPU-first:

* One pure jitted graph: [B,T] frames fold into the batch axis for the
  backbone (`ti_poser.py:424`), every branch (phase, latent doubling,
  realtime-vs-full temporal) is selected statically at trace time, shapes are
  static, and the MANO FK is the pure-JAX LBS from ``cs_vit_tpu.mano``.
* Training phases are NOT implemented by mutating requires_grad; the phase is
  a static argument controlling (a) which submodules run with batch-stat
  updates (BatchNorm train mode) and (b) the optimizer param mask produced by
  :func:`phase_trainable_mask` (used by optax.multi_transform in train/).
* Host-side visualization lives in ``cs_vit_tpu.utils.vis`` — the reference
  reads images from disk inside forward (`ti_poser.py:780-813`), which would
  stall the MXU; here forward is pure.

Reference quirk notes:
  - The ``global_positioning="orientation"`` path calls
    ``matrix_to_axis_angle(pose_root_aa)`` on a [B,T,3] vector
    (`ti_poser.py:709`) — a crash for T != 3 in torch; we implement the
    evident intent (convert the ORIENTED matrix) and keep the non-standard
    ``rotation_matrix_y`` fill via ``compat`` (see core.geometry).
  - Frozen-at-init latent group during spatial finetuning is replicated via
    the optimizer mask (the reference never marks it trainable in
    `finetune.py`'s phases).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..constants import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    TARGET_JOINTS_CONNECTION,
)
from ..core.geometry import (
    axis_angle_to_matrix,
    matrix_to_axis_angle,
    rotation_6d_to_matrix,
    rotation_matrix_x,
    rotation_matrix_y,
    safe_norm,
)
from ..core.joints import mean_connection_length
from ..mano.layer import ManoLayer
from .latent import ScaleRotComplexEmbedTransformationGroup
from .modules import (
    CrossAttnDecoder,
    DecoderBlock,
    EncoderBlock,
    PositionalEncoding,
    TorchBatchNorm,
)
from .swinv2 import SwinV2, SwinV2Config, swinv2_base_256, swinv2_tiny_256

PHASES = ("spatial", "temporal", "inference")


@dataclasses.dataclass(frozen=True)
class PoserConfig:
    """Static architecture knobs (reference ``Poser.__init__`` args)."""

    backbone: str = "swinv2-tiny-256"
    num_pose_query: int = 16
    num_spatial_layer: int = 6
    spatial_layer_type: str = "decoder"     # "decoder" | "encoder"
    num_temporal_layer: int = 2
    temporal_init_method: str = "zero"      # "zero" | "random"
    expansion_ratio: float = 1.25
    temporal_supervision: str = "full"      # "full" | "realtime"
    trope_scalar: float = 20.0
    num_latent_layer: Optional[int] = None
    persp_embed_method: str = "dense"       # "dense" | "sparse"
    persp_decorate: str = "query"           # "query" | "patch"
    image_size: int = 256
    global_positioning: str = "direct"      # "direct" | "orientation"
    compat_scale: bool = True               # MHA sqrt(d_h)-multiply quirk
    compat_swap: bool = True                # latent embedder swap quirk
    custom_swin: Optional[SwinV2Config] = None  # override (tests / experiments)
    attention_impl: str = "xla"  # "xla" | "fused" (whole-block Pallas) | "pallas" | "hybrid"
    remat: bool = False                     # rematerialize backbone blocks

    def __post_init__(self):
        assert self.spatial_layer_type in ("decoder", "encoder")
        assert self.temporal_supervision in ("full", "realtime")
        assert self.persp_embed_method in ("dense", "sparse")
        assert self.persp_decorate in ("query", "patch")
        assert self.global_positioning in ("direct", "orientation")
        assert self.num_latent_layer is None or self.persp_decorate == "patch", (
            "latent constraints require persp_decorate='patch' "
            "(reference ti_poser.py:213-215)"
        )

    def swin_config(self) -> SwinV2Config:
        if self.custom_swin is not None:
            return self.custom_swin
        name = self.backbone.lower()
        if "base" in name:
            return swinv2_base_256(image_size=self.image_size, remat=self.remat)
        if "tiny" in name:
            return swinv2_tiny_256(image_size=self.image_size, remat=self.remat)
        if "test" in name:  # minimal arch for smoke tests / CI
            return SwinV2Config(
                image_size=self.image_size, embed_dim=8, depths=(1, 1),
                num_heads=(2, 2), window_size=4, drop_path_rate=0.0,
                pretrained_window_sizes=(0, 0),
            )
        raise ValueError(f"unknown backbone spec: {self.backbone}")

    @property
    def hidden_dim(self) -> int:
        return self.swin_config().num_features

    @property
    def num_heads(self) -> int:
        return self.swin_config().num_heads[-1]

    @property
    def num_p(self) -> int:
        sw = self.swin_config()
        return self.image_size // (sw.patch_size * 2 ** (sw.num_layers - 1))


class PerspectiveEncoder(nn.Module):
    """Linear proj + 3x[BN -> Linear -> ReLU] + Linear (ref `ti_poser.py:161-182`)."""

    embed_dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        y = nn.Dense(self.embed_dim, name="proj")(x)
        for i in range(3):
            y = TorchBatchNorm(name=f"bn{i}")(y, use_running_average=not train)
            y = nn.Dense(self.embed_dim, name=f"fc{i}")(y)
            y = nn.relu(y)
        return nn.Dense(self.embed_dim, name="out")(y)


class SpatialEncoder(nn.Module):
    """Query/patch fusion (ref `ti_poser.py:54-97`)."""

    embed_dim: int
    num_heads: int
    num_layer: int
    layer_type: str = "decoder"
    compat_scale: bool = True

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, ctx: jnp.ndarray, *, train: bool = False
    ) -> jnp.ndarray:
        pe = PositionalEncoding(self.embed_dim, mode="absolute", name="pe_spatial")
        if self.layer_type == "decoder":
            y = pe(x)
            for i in range(self.num_layer):
                y = DecoderBlock(
                    self.embed_dim, self.num_heads, self.compat_scale, name=f"layer{i}"
                )(y, ctx, train=train)
            return y
        else:
            # Reference quirk (`ti_poser.py:95-97`): the loop writes `x_embeb`
            # but keeps reading `x_embed`, so the encoder layers do NOT chain —
            # every layer consumes the same PE'd input and only the LAST
            # layer's output is returned. Checkpoints trained with
            # layer_type='encoder' bake this in (earlier layers receive no
            # gradient and stay at init), so it is replicated: all layers
            # still run (their BatchNorm statistics update in train mode,
            # exactly as in torch), but only the last output survives.
            y0 = pe(jnp.concatenate([x, ctx], axis=1))
            y = y0
            for i in range(self.num_layer):
                y = EncoderBlock(
                    self.embed_dim, self.num_heads, self.compat_scale, name=f"layer{i}"
                )(y0, train=train)
            return y[:, : x.shape[1]]


class TemporalEncoder(nn.Module):
    """Cross-frame fusion with zero-init output projection (ControlNet-style).

    target='full': absolute PE + encoder blocks over T, residual outside.
    target='realtime': continuous-time RoPE + cross-attn decoders, last-frame
    query only. Reference `ti_poser.py:100-158`.
    """

    embed_dim: int
    num_heads: int
    num_layer: int
    target: str = "realtime"
    trope_scalar: float = 20.0
    zero_init: bool = True
    compat_scale: bool = True

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        timestamp: Optional[jnp.ndarray] = None,
        *,
        train: bool = False,
    ) -> jnp.ndarray:
        zero_conv = nn.Dense(
            self.embed_dim,
            use_bias=False,
            kernel_init=nn.initializers.zeros if self.zero_init
            else nn.initializers.lecun_normal(),
            name="zero_conv",
        )
        if self.target == "realtime":
            assert timestamp is not None
            time_index = timestamp / self.trope_scalar
            pe = PositionalEncoding(self.embed_dim, mode="trope", name="pe_temporal")
            x_embed = pe(x, time_index)
            x_last, x_seq = x_embed[:, -1:], x_embed
            for i in range(self.num_layer):
                x_last = CrossAttnDecoder(
                    self.embed_dim, self.num_heads, self.compat_scale, name=f"layer{i}"
                )(x_last, x_seq, train=train)
            return zero_conv(x_last)
        else:
            pe = PositionalEncoding(self.embed_dim, mode="absolute", name="pe_temporal")
            x_embed = pe(x)
            for i in range(self.num_layer):
                x_embed = EncoderBlock(
                    self.embed_dim, self.num_heads, self.compat_scale, name=f"layer{i}"
                )(x_embed, train=train)
            return zero_conv(x_embed)


def sample_persp_dir_vec(
    num_sample: int,
    bbox: jnp.ndarray,     # [B,T,4] xyxy
    focal: jnp.ndarray,    # [B,T,2]
    princpt: jnp.ndarray,  # [B,T,2]
) -> jnp.ndarray:
    """Dense perspective ray-direction grid, [B,T,p,p,2] (ref `ti_poser.py:609-639`)."""
    grid = jnp.linspace(
        1 / num_sample * 0.5, 1 - 1 / num_sample * 0.5, num_sample
    )  # [p]
    x_grid = bbox[:, :, 0:1] + (bbox[:, :, 2:3] - bbox[:, :, 0:1]) * grid[None, None]
    y_grid = bbox[:, :, 1:2] + (bbox[:, :, 3:4] - bbox[:, :, 1:2]) * grid[None, None]
    p = num_sample
    gx = jnp.broadcast_to(x_grid[:, :, :, None], x_grid.shape + (p,))
    gy = jnp.broadcast_to(y_grid[:, :, None, :], y_grid.shape[:2] + (p, p))
    g = jnp.stack([gx, gy], axis=-1)  # [B,T,p,p,2]
    directions = (g - princpt[:, :, None, None]) / focal[:, :, None, None]
    ones = jnp.ones_like(directions[..., :1])
    d3 = jnp.concatenate([directions, ones], axis=-1)
    d3 = d3 / jnp.linalg.norm(d3, axis=-1, keepdims=True)
    return d3[..., :2]


def sparse_corner_coords(
    bbox: jnp.ndarray, focal: jnp.ndarray, princpt: jnp.ndarray
) -> jnp.ndarray:
    """Normalized bbox-corner coordinates, [B,T,2,2,2] (ref `ti_poser.py:670-683`)."""
    um = (bbox[:, :, 0] - princpt[:, :, 0]) / focal[:, :, 0]
    uM = (bbox[:, :, 2] - princpt[:, :, 0]) / focal[:, :, 0]
    vm = (bbox[:, :, 1] - princpt[:, :, 1]) / focal[:, :, 1]
    vM = (bbox[:, :, 3] - princpt[:, :, 1]) / focal[:, :, 1]
    tl = jnp.stack([um, vm], axis=-1)
    tr = jnp.stack([uM, vm], axis=-1)
    dl = jnp.stack([um, vM], axis=-1)
    dr = jnp.stack([uM, vM], axis=-1)
    r0 = jnp.stack([tl, tr], axis=2)  # [B,T,2,2]
    r1 = jnp.stack([dl, dr], axis=2)
    return jnp.stack([r0, r1], axis=2)  # [B,T,2,2,2]


def derivative(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Central finite difference along `axis` (ref `ti_poser.py:31-51`)."""
    assert x.shape[axis] >= 3, "derivative needs >=3 frames along the time axis"
    nxt = jax.lax.slice_in_dim(x, 2, x.shape[axis], axis=axis)
    prv = jax.lax.slice_in_dim(x, 0, x.shape[axis] - 2, axis=axis)
    return (nxt - prv) / 2.0


class Poser(nn.Module):
    """Camera-space hand poser. Apply with ``method=`` for sub-entry points."""

    config: PoserConfig
    mano: ManoLayer
    j_regressor: np.ndarray  # [21, 778] numpy, baked as constant

    def setup(self):
        cfg = self.config
        D = cfg.hidden_dim
        self.backbone = SwinV2(
            cfg.swin_config(), attention_impl=cfg.attention_impl, name="backbone"
        )

        if cfg.num_latent_layer is not None:
            self.latent_trans = ScaleRotComplexEmbedTransformationGroup(
                num_layers=cfg.num_latent_layer,
                embed_dim=D,
                num_heads=cfg.num_heads,
                num_p=cfg.num_p,
                num_q=cfg.num_p,
                compat_scale=cfg.compat_scale,
                compat_swap=cfg.compat_swap,
                name="latent_trans",
            )
        else:
            self.latent_trans = None

        self.query_token = self.param(
            "query_token",
            lambda key: jax.random.normal(key, (3, D)) * (1.0 / D**0.5),
        )

        self.perspective_mlp = PerspectiveEncoder(D, name="perspective_mlp")
        self.spatial_encoder = SpatialEncoder(
            D, cfg.num_heads, cfg.num_spatial_layer, cfg.spatial_layer_type,
            cfg.compat_scale, name="spatial_encoder",
        )
        tkw = dict(
            embed_dim=D,
            num_heads=cfg.num_heads,
            num_layer=cfg.num_temporal_layer,
            target=cfg.temporal_supervision,
            trope_scalar=cfg.trope_scalar,
            zero_init=(cfg.temporal_init_method == "zero"),
            compat_scale=cfg.compat_scale,
        )
        self.pose_temporal_encoder = TemporalEncoder(**tkw, name="pose_temporal_encoder")
        self.shape_temporal_encoder = TemporalEncoder(**tkw, name="shape_temporal_encoder")
        self.root_temporal_encoder = TemporalEncoder(**tkw, name="root_temporal_encoder")

        self.pose_decoder = nn.Dense(cfg.num_pose_query * 6, name="pose_decoder")
        self.shape_decoder = nn.Dense(10, name="shape_decoder")
        self.root_decoder = nn.Dense(3, name="root_decoder")

        self._jreg = jnp.asarray(self.j_regressor, jnp.float32)
        mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
        std = jnp.asarray(IMAGENET_STD, jnp.float32)
        self._img_mean, self._img_std = mean, std

    # -- core graph -------------------------------------------------------

    def decode_pose(
        self,
        imgs: jnp.ndarray,       # [B,T,H,W,3] in [0,1]
        timestamp: jnp.ndarray,  # [B,T] ms
        persp_vec: jnp.ndarray,  # [B,T,p,q,2]
        phase: str = "inference",
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Images -> (pose_aa [nB,T',16,3], shape [nB,T',10], root_norm [nB,T',3]).

        Ref `ti_poser.py:404-559`. n=2 when latent constraints are active.
        T' is 1 in realtime temporal mode, else T.
        """
        cfg = self.config
        assert phase in PHASES
        B, T = imgs.shape[:2]
        spatial_train = phase == "spatial"
        temporal_train = phase == "temporal"
        n = 1

        x = imgs.reshape((B * T,) + imgs.shape[2:])
        # Normalize with f32 statistics but KEEP the caller's activation
        # dtype: the f32 mean/std constants would otherwise promote bf16
        # images to f32 and drag the entire backbone (incl. the fused Pallas
        # blocks, which compute in their input dtype) off the bf16 MXU path
        # — measured +27 ms at batch 256 on v5e.
        x = (
            (x.astype(jnp.float32) - self._img_mean) / self._img_std
        ).astype(imgs.dtype)
        patches = self.backbone(x, deterministic=not spatial_train)  # [BT,64,D]

        persp_bias = self.perspective_mlp(
            persp_vec.reshape(B * T, -1), train=spatial_train
        ).astype(patches.dtype)  # [BT,D] (f32 persp inputs must not promote)

        query_patches = jnp.broadcast_to(
            self.query_token[None], (B * T,) + self.query_token.shape
        )
        if cfg.persp_decorate == "query":
            query_patches = query_patches + persp_bias[:, None]
        else:
            patches = patches + persp_bias[:, None]

        scale_coef = angle_rad = None
        if self.latent_trans is not None:
            rng = self.make_rng("latent")
            k1, k2 = jax.random.split(rng)
            scale_coef = jnp.clip(jax.random.normal(k1, (B,)), -0.3, 0.3) + 1.0
            angle_rad = jax.random.uniform(k2, (B,)) * 2 * jnp.pi
            # per-frame broadcast of the per-sample transform
            sc_bt = jnp.repeat(scale_coef, T)
            an_bt = jnp.repeat(angle_rad, T)
            patches_trans = self.latent_trans(
                patches, sc_bt, an_bt, train=False
            )
            n = 2
            patches = jnp.concatenate([patches, patches_trans], axis=0)
            query_patches = jnp.concatenate([query_patches, query_patches], axis=0)
            timestamp = jnp.concatenate([timestamp, timestamp], axis=0)

        # Spatial fusion -> [n*B*T, 3, D]
        fused = self.spatial_encoder(query_patches, patches, train=spatial_train)

        if phase == "temporal":
            # Only the temporal encoders train in this phase
            # (`ti_poser.py:367-393`); cutting the gradient here skips the
            # entire backbone+spatial backward pass, whose grads the masked
            # optimizer would discard anyway.
            fused = jax.lax.stop_gradient(fused)

        apply_temporal = phase in ("inference", "temporal")
        if apply_temporal:
            # [nBT, 3, D] -> [3, nB, T, D]
            q = fused.reshape(n * B, T, 3, -1).transpose(2, 0, 1, 3)
            pose_q, shape_q, root_q = q[0], q[1], q[2]
            if cfg.temporal_supervision == "full":
                pose_q = pose_q + self.pose_temporal_encoder(pose_q, train=temporal_train)
                shape_q = shape_q + self.shape_temporal_encoder(shape_q, train=temporal_train)
                root_q = root_q + self.root_temporal_encoder(root_q, train=temporal_train)
            else:
                ts = timestamp.reshape(n * B, T) if timestamp.ndim == 2 else timestamp
                pose_q = pose_q[:, -1:] + self.pose_temporal_encoder(
                    pose_q, ts, train=temporal_train
                )
                shape_q = shape_q[:, -1:] + self.shape_temporal_encoder(
                    shape_q, ts, train=temporal_train
                )
                root_q = root_q[:, -1:] + self.root_temporal_encoder(
                    root_q, ts, train=temporal_train
                )
            T_out = pose_q.shape[1]
            pose_patches, shape_patches, root_patches = pose_q, shape_q, root_q
        else:
            q = fused.reshape(n * B, T, 3, -1)
            pose_patches = q[:, :, 0]
            shape_patches = q[:, :, 1]
            root_patches = q[:, :, 2]
            T_out = T

        pose_6d = self.pose_decoder(pose_patches).reshape(
            n * B, T_out, cfg.num_pose_query, 6
        )
        pose_aa = matrix_to_axis_angle(rotation_6d_to_matrix(pose_6d))
        shape = self.shape_decoder(shape_patches)
        root_transl_norm = self.root_decoder(root_patches)

        if self.latent_trans is not None:
            # Undo the latent rotation on the transformed half
            # (ref `ti_poser.py:537-557`).
            sin = jnp.sin(-angle_rad)
            cos = jnp.cos(-angle_rad)
            z = jnp.zeros_like(cos)
            o = jnp.ones_like(cos)
            rot_z = jnp.stack(
                [cos, -sin, z, sin, cos, z, z, z, o], axis=-1
            ).reshape(B, 1, 3, 3)
            rot_z = jnp.broadcast_to(rot_z, (B, T_out, 3, 3))

            pose_mat_trans = axis_angle_to_matrix(pose_aa[B:])
            pose_mat_trans = rot_z[:, :, None] @ pose_mat_trans
            pose_aa = pose_aa.at[B:].set(matrix_to_axis_angle(pose_mat_trans))

            root_new = jnp.einsum(
                "btk,btkc->btc", root_transl_norm[B:], rot_z.transpose(0, 1, 3, 2)
            ) / scale_coef[:, None, None]
            root_transl_norm = root_transl_norm.at[B:].set(root_new)

        return pose_aa, shape, root_transl_norm

    def pose_fk(
        self,
        pose_aa: jnp.ndarray,          # [B,T,16,3]
        shape: jnp.ndarray,            # [B,T,10]
        root_transl_norm: jnp.ndarray,  # [B,T,3]
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """MANO FK -> (joint_cam [B,T,21,3] mm, verts_cam [B,T,778,3] mm, root mm).

        Ref `ti_poser.py:561-607`: joints regressed from vertices with the
        21x778 regressor; root depth denormalized by 1e3 * mean bone length.
        """
        B, T = pose_aa.shape[:2]
        flat_pose = pose_aa.reshape(B * T, -1)
        mano_out = self.mano(
            betas=shape.reshape(B * T, -1),
            global_orient=flat_pose[:, :3],
            hand_pose=flat_pose[:, 3:],
        )
        verts = mano_out["vertices"]                              # [BT,778,3] m
        joints_mano = jnp.einsum("nvd,jv->njd", verts, self._jreg)  # [BT,21,3] m

        mean_len = mean_connection_length(joints_mano, TARGET_JOINTS_CONNECTION)
        mean_len = 1e3 * mean_len.reshape(B, T, 1)                # [B,T,1] mm
        root_transl = root_transl_norm * mean_len                 # [B,T,3] mm

        verts_cam = ((verts - joints_mano[:, :1]) * 1e3).reshape(B, T, -1, 3)
        verts_cam = verts_cam + root_transl[:, :, None]
        joint_cam = ((joints_mano - joints_mano[:, :1]) * 1e3).reshape(B, T, -1, 3)
        joint_cam = joint_cam + root_transl[:, :, None]
        return joint_cam, verts_cam, root_transl

    def predict(
        self,
        img_tensor: jnp.ndarray,     # [B,T,H,W,3]
        square_bboxes: jnp.ndarray,  # [B,T,4] xyxy
        timestamp: jnp.ndarray,      # [B,T] ms
        focal: jnp.ndarray,          # [B,T,2]
        princpt: jnp.ndarray,        # [B,T,2]
        phase: str = "inference",
    ) -> Dict[str, jnp.ndarray]:
        """Public inference API (ref ``predict_batch``, `ti_poser.py:641-722`)."""
        cfg = self.config

        center = None
        if cfg.global_positioning == "orientation":
            center = (square_bboxes[:, :, :2] + square_bboxes[:, :, 2:]) / 2.0
            shiftv = center + princpt
            square_bboxes = jnp.concatenate(
                [square_bboxes[:, :, :2] - shiftv, square_bboxes[:, :, 2:] - shiftv],
                axis=-1,
            )

        if cfg.persp_embed_method == "dense":
            directions = sample_persp_dir_vec(16, square_bboxes, focal, princpt)
        else:
            directions = sparse_corner_coords(square_bboxes, focal, princpt)

        pose_aa, shape, root_transl_norm = self.decode_pose(
            img_tensor, timestamp, directions, phase=phase
        )

        if cfg.global_positioning == "orientation":
            v_half = (center[:, :, 1] - princpt[:, :, 1]) / focal[:, :, 1]
            u_half = (center[:, :, 0] - princpt[:, :, 0]) / focal[:, :, 0]
            pitch = jnp.arctan(v_half)
            roll = jnp.arctan(u_half)
            # pad to prediction T (realtime collapses to last frame)
            T_out = pose_aa.shape[1]
            pitch, roll = pitch[:, -T_out:], roll[:, -T_out:]
            trans = rotation_matrix_y(roll) @ rotation_matrix_x(pitch)
            nrep = pose_aa.shape[0] // trans.shape[0]
            trans = jnp.concatenate([trans] * nrep, axis=0)

            root_transl_norm = jnp.einsum("btnd,btd->btn", trans, root_transl_norm)
            pose_root_mat = axis_angle_to_matrix(pose_aa[:, :, 0])
            pose_root_mat = trans @ pose_root_mat
            pose_aa = pose_aa.at[:, :, 0].set(matrix_to_axis_angle(pose_root_mat))

        joint_cam, verts_cam, root_transl = self.pose_fk(
            pose_aa, shape, root_transl_norm
        )
        return {
            "joint_cam": joint_cam,
            "verts_cam": verts_cam,
            "pose_aa": pose_aa,
            "shape": shape,
            "root_transl_norm": root_transl_norm,
            "root_transl": root_transl,
        }

    def criterion(
        self, predict: Dict[str, jnp.ndarray], batch: Dict[str, jnp.ndarray],
        phase: str,
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        """Joint/shape/smoothness losses (ref `ti_poser.py:724-778`)."""
        cfg = self.config
        realtime = cfg.temporal_supervision == "realtime"

        def tsel(x):  # select supervised frames
            return x[:, -1:] if realtime else x

        pj = tsel(predict["joint_cam"])
        gj = tsel(batch["joint_cam"])
        valid = tsel(batch["joint_valid"])

        loss_joint_cam = jnp.mean(safe_norm(pj - gj) * valid)
        loss_joint_rel = jnp.mean(
            safe_norm((pj - pj[:, :, :1]) - (gj - gj[:, :, :1])) * valid
        )
        loss_shape = jnp.mean(
            jnp.abs(tsel(predict["shape"]) - tsel(batch["mano_shape"]))
        )

        if phase == "temporal" and cfg.temporal_supervision == "full":
            vel_p = derivative(predict["joint_cam"], 1)
            acc_p = derivative(vel_p, 1)
            vel_g = derivative(batch["joint_cam"], 1)
            acc_g = derivative(vel_g, 1)
            loss_vel = jnp.mean(safe_norm(vel_p - vel_g))
            loss_accel = jnp.mean(safe_norm(acc_p - acc_g))
            loss_temporal = 1e-2 * (loss_vel + loss_accel)
        else:
            loss_vel = loss_accel = loss_temporal = jnp.zeros(())

        logs = {
            "cam": loss_joint_cam,
            "rel": loss_joint_rel,
            "shape": loss_shape,
            "loss_vel": loss_vel,
            "loss_accel": loss_accel,
        }
        return loss_joint_cam + loss_joint_rel + loss_shape + loss_temporal, logs

    def __call__(
        self, batch: Dict[str, jnp.ndarray], phase: str = "spatial"
    ) -> Dict[str, Any]:
        """Training forward: predict -> losses (ref `ti_poser.py:815-855`).

        Returns {"loss", "logs": {"scalar": ...}, "predict": origin predictions}.
        """
        B = batch["patches"].shape[0]
        predict = self.predict(
            img_tensor=batch["patches"],
            square_bboxes=batch["square_bboxes"],
            timestamp=batch["timestamp"],
            focal=batch["focal"],
            princpt=batch["princpt"],
            phase=phase,
        )
        predict_origin = {k: v[:B] for k, v in predict.items()}

        loss_origin, origin_logs = self.criterion(predict_origin, batch, phase)
        loss = loss_origin
        trans_logs: Dict[str, jnp.ndarray] = {}
        loss_trans = jnp.zeros(())
        if self.latent_trans is not None:
            predict_trans = {k: v[B:] for k, v in predict.items()}
            loss_trans, trans_logs = self.criterion(predict_trans, batch, phase)
            loss = loss + 1e-2 * loss_trans

        return {
            "loss": loss,
            "logs": {
                "scalar": {
                    "total": loss,
                    "origin": {"origin": loss_origin, **origin_logs},
                    "trans": {"trans": loss_trans, **trans_logs},
                },
            },
            "predict": predict_origin,
        }


# ---------------------------------------------------------------------------
# Phase -> trainable-parameter masks (replaces requires_grad toggling)
# ---------------------------------------------------------------------------

_SPATIAL_TRAINED = (
    "backbone", "perspective_mlp", "spatial_encoder",
    "pose_decoder", "shape_decoder", "root_decoder", "query_token",
)
_TEMPORAL_TRAINED = (
    "pose_temporal_encoder", "shape_temporal_encoder", "root_temporal_encoder",
)


def phase_trainable_mask(params: Dict, phase: str) -> Dict:
    """Pytree of bools: which top-level submodules train in `phase`.

    Mirrors reference `ti_poser.py:339-397`: spatial trains backbone +
    spatial stack + heads (latent group stays frozen, as in
    `finetune.py`); temporal trains only the temporal encoders; inference
    trains nothing.
    """
    assert phase in PHASES
    trained = {
        "spatial": _SPATIAL_TRAINED,
        "temporal": _TEMPORAL_TRAINED,
        "inference": (),
    }[phase]

    def mark(subtree, flag):
        return jax.tree.map(lambda _: flag, subtree)

    return {
        k: mark(v, k in trained) for k, v in params.items()
    }
