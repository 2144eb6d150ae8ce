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
