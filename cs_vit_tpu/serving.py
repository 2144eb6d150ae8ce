"""Production inference session for the Poser.

The reference's deployment story is a notebook (`notebook/demo.ipynb`); this
module is the TPU-native equivalent of a serving wrapper: build + load once,
compile a fixed-shape predict program, and serve numpy in / numpy out with
automatic batch padding (static shapes keep one compiled executable hot).

    sess = PoserSession.from_experiment("checkpoints/myexp")
    out = sess.predict_images(frames, tight_bboxes, focal, princpt)
    out["joint_cam"]  # [N, 21, 3] mm
"""

from __future__ import annotations

import os.path as osp
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .cli.common import build_model, init_variables
from .config import FinetuneConfig
from .ops.resample import crop_with_square_box_np
from .train import merge_params, restore_checkpoint


class PoserSession:
    """Load-once, fixed-shape Poser inference."""

    def __init__(
        self,
        cfg: FinetuneConfig,
        checkpoint: Optional[str] = None,
        batch_size: int = 8,
        seq_len: int = 1,
        dtype: str = "bfloat16",
    ):
        self.cfg = cfg
        self.batch_size = batch_size
        self.seq_len = seq_len
        self.model = build_model(cfg)
        variables = init_variables(self.model, cfg, seq_len)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        if checkpoint:
            loaded = restore_checkpoint(checkpoint)
            params, _ = merge_params(params, loaded.get("params", loaded))
            if isinstance(loaded, dict) and "batch_stats" in loaded:
                batch_stats, _ = merge_params(batch_stats, loaded["batch_stats"])
        if dtype == "bfloat16":
            params = jax.tree.map(
                lambda x: x.astype(jnp.bfloat16)
                if hasattr(x, "dtype") and jnp.issubdtype(np.asarray(x).dtype, np.floating)
                else x,
                params,
            )
        self._params = jax.tree.map(jnp.asarray, params)
        self._stats = jax.tree.map(jnp.asarray, batch_stats)
        self._dtype = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32

        model = self.model

        @jax.jit
        def _predict(params, stats, patches, bboxes, ts, focal, princpt):
            return model.apply(
                {"params": params, "batch_stats": stats},
                patches, bboxes, ts, focal, princpt, "inference",
                method=model.predict,
            )

        self._predict = _predict

    @classmethod
    def from_experiment(
        cls, exp_dir: str, batch_size: int = 8, seq_len: int = 1, **kw
    ) -> "PoserSession":
        """Build from checkpoints/<exp>/ (config.json + checkpoint symlink)."""
        cfg = FinetuneConfig.from_json_file(osp.join(exp_dir, "config.json"))
        ckpt = osp.join(exp_dir, "checkpoint")
        return cls(cfg, checkpoint=ckpt if osp.exists(ckpt) else None,
                   batch_size=batch_size, seq_len=seq_len, **kw)

    def warmup(self):
        """Compile the predict program ahead of the first request."""
        S = self.cfg.img_size
        B, T = self.batch_size, self.seq_len
        self._run(
            np.zeros((B, T, S, S, 3), np.float32),
            np.tile(np.asarray([0, 0, S, S], np.float32), (B, T, 1)),
            np.zeros((B, T), np.float32),
            np.full((B, T, 2), 500.0, np.float32),
            np.full((B, T, 2), S / 2.0, np.float32),
        )

    def _run(self, patches, bboxes, ts, focal, princpt):
        return self._predict(
            self._params, self._stats,
            jnp.asarray(patches, self._dtype), jnp.asarray(bboxes),
            jnp.asarray(ts), jnp.asarray(focal), jnp.asarray(princpt),
        )

    def predict_crops(
        self,
        patches: np.ndarray,        # [N, T, S, S, 3] float in [0,1]
        square_bboxes: np.ndarray,  # [N, T, 4] xyxy
        timestamps: np.ndarray,     # [N, T] ms
        focal: np.ndarray,          # [N, T, 2]
        princpt: np.ndarray,        # [N, T, 2]
    ) -> Dict[str, np.ndarray]:
        """Batched inference with padding to the compiled batch size."""
        N = patches.shape[0]
        B = self.batch_size
        outs = []
        for s in range(0, N, B):
            e = min(s + B, N)
            pad = B - (e - s)

            def padded(x):
                chunk = np.asarray(x[s:e])
                if pad:
                    chunk = np.concatenate(
                        [chunk, np.repeat(chunk[-1:], pad, axis=0)], axis=0
                    )
                return chunk

            result = self._run(
                padded(patches), padded(square_bboxes), padded(timestamps),
                padded(focal), padded(princpt),
            )
            outs.append(
                {k: np.asarray(v[: e - s], np.float32) for k, v in result.items()}
            )
        return {k: np.concatenate([o[k] for o in outs], axis=0) for k in outs[0]}

    def predict_images(
        self,
        images: np.ndarray,      # [N, H, W, 3] float in [0,1]
        tight_bboxes: np.ndarray,  # [N, 4] xyxy
        focal: np.ndarray,       # [N, 2]
        princpt: np.ndarray,     # [N, 2]
        timestamps: Optional[np.ndarray] = None,  # [N] ms
    ) -> Dict[str, np.ndarray]:
        """Full-frame API: host-side square crop (native fast path) + predict.

        Single-frame (T=1); returns per-image outputs with the T axis dropped.
        """
        N = images.shape[0]
        patches, _, squares = crop_with_square_box_np(
            images.astype(np.float32), np.asarray(tight_bboxes, np.float32),
            self.cfg.expansion_ratio, self.cfg.img_size,
        )
        ts = np.zeros((N, 1), np.float32) if timestamps is None else \
            np.asarray(timestamps, np.float32).reshape(N, 1)
        out = self.predict_crops(
            patches[:, None], squares[:, None], ts,
            np.asarray(focal, np.float32)[:, None],
            np.asarray(princpt, np.float32)[:, None],
        )
        return {k: v[:, 0] for k, v in out.items()}
