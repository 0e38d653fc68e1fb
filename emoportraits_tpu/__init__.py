"""emoportraits_tpu — TPU-native (JAX/XLA/Pallas/pjit) one-shot volumetric head avatars.

A brand-new framework with the capabilities of EMOPortraits (CVPR 2024): from a single
source portrait, build a canonical 3D latent feature volume and drive it frame-by-frame
with a driver video's head pose and extreme/asymmetric expressions.

Top-level layout (mirrors SURVEY.md §2's component inventory):
  ops/       Pallas kernels + functional building blocks (grid-sample, blocks, norms)
  geometry/  similarity transforms, identity grids, keypoint alignment
  models/    generator subnets, discriminators, stage-1/stage-2 orchestration
  losses/    GAN + perceptual + expression-contrastive losses, eval metrics
  data/      pair-sampling datasets, augmentation, multi-stream interleave
  parallel/  device mesh + sharding definitions
  train/     train state (dual optimizer), jitted train step, checkpointing, logging
  infer/     InferenceWrapper equivalent: jitted encode_source + drive
  port/      PyTorch checkpoint -> param pytree porting tools
"""

__version__ = "0.1.0"
