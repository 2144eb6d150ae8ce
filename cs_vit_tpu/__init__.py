"""cs_vit_tpu — a TPU-native (JAX/XLA/Pallas) framework for camera-space 3D
hand-pose estimation, built from scratch with the capabilities of the CS-ViT
reference (see SURVEY.md).

Layout:
  core/        rotation geometry, joint utilities (pure jax.numpy)
  mano/        MANO linear-blend-skinning layer in JAX
  models/      SwinV2 backbone, transformer modules, Poser, TI pretraining
  ops/         Pallas TPU kernels + fused image resampling ops
  data/        H5-backed datasets, host decode pipeline, device prefetch
  parallel/    mesh construction, sharding specs, collective helpers
  train/       optimizer/schedules/phase masks, train step, checkpointing
  evaluation/  distributed eval -> HDF5 dumps, MPJPE/MPRPE metrics
  cli/         finetune / eval / benchmark entry points
"""

__version__ = "0.1.0"


def _honor_jax_platforms_env() -> None:
    """Make ``JAX_PLATFORMS=cpu python -m cs_vit_tpu.cli...`` deterministic.

    Hosts that pre-register an out-of-tree TPU plugin (via sitecustomize
    entry points) can initialize that plugin even when ``JAX_PLATFORMS``
    says ``cpu``; if the TPU transport is unreachable the process then hangs
    in backend init instead of running on CPU.  Applying the env var through
    ``jax.config`` *before* any backend is initialized pins the selection.
    No-op when the variable is unset or a backend already exists.
    """
    import os

    plats = os.environ.get("JAX_PLATFORMS")
    if not plats:
        return
    try:
        import jax

        jax.config.update("jax_platforms", plats)
    except Exception:  # backend already initialized -> selection already made
        pass


_honor_jax_platforms_env()
