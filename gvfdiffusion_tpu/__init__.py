"""gvfdiffusion_tpu — TPU-native video-to-4D generation framework.

A from-scratch JAX/XLA/Pallas/pjit re-design of the capabilities of
GVFDiffusion (ForeverFancy/GVFDiffusion, ICCV 2025): video -> animated
3D Gaussian-Splat asset.

Layer map (mirrors SURVEY.md §1, rebuilt TPU-first):
  ops/              L0  Pallas kernels + jnp primitives (curves, attention,
                        rasterizer, fps/knn, sh, ssim)
  sparse/           L1  static-shape sparse-voxel runtime (padded ragged pytree)
  nn/               L2  neural-net module library (flax.linen)
  models/           L3  DiT, motion VAE, static VAE, TRELLIS model family
  diffusion/        L4  diffusion math + samplers (scan/while_loop compiled)
  representations/  L5  Gaussians, cameras
  render/           L5  renderer API over the rasterizer kernels
  train/            L6  jitted train steps, optax/EMA/orbax state
  parallel/         x   mesh + sharding utilities (DP/FSDP over ICI)
  data/             L7  dataset loaders
  pipelines/        L7  trellis image->3D, video->4D
  cli/              L7  entry points
  utils/            x   logger, config, checkpointing
"""

__version__ = "0.1.0"
