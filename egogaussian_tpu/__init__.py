"""EgoGaussian-TPU: a TPU-native JAX framework for dynamic 3D Gaussian Splatting
from egocentric video.

Re-designed from scratch (TPU-first: jit/pjit + Pallas + functional pytrees) with
the capabilities of the reference EgoGaussian pipeline (zdwww/EgoGaussian):
static 3DGS training with hand-masked gradients and trainable object labels,
object segmentation, per-frame rigid SE(3) object-pose optimization through
dynamic clips, joint shape+pose fine-tuning, pose interpolation, full-scene
fine-tuning, and hand-masked PSNR/SSIM/LPIPS evaluation.

Layer map (TPU-native):
  ops/       pure-jnp math kernels (quaternion, covariance, SE(3), SH, losses, kNN)
  render/    differentiable rasterization: jnp oracle, tiled XLA renderer,
             Pallas TPU kernels (replaces the CUDA diff-gaussian-rasterization)
  models/    GaussianModel as a capacity+alive-mask pytree; densify/prune;
             hand-rolled Adam with moment surgery; object pose params
  data/      COLMAP parsing, camera/mask loading, frame splits, synthetic scenes
  train/     jitted per-stage step functions + python stage drivers
  eval/      PSNR/SSIM/LPIPS (VGG), render buckets, results.txt
  parallel/  jax.sharding Mesh helpers: frame-data-parallel and multi-scene steps
"""

__version__ = "0.1.0"
