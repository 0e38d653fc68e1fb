"""Core ops: grid sampling, building blocks, adaptive projectors, StyleGAN2 resampling."""
from .adaptive import ProjectorNorm, ProjectorNormLinear
from .blocks import (
    AdaGroupNorm,
    Conv,
    ConvBlock,
    Dense,
    GroupNorm,
    NormAct,
    ResBlock,
    activation_fn,
    avg_pool,
    upsample_nearest,
)
from .grid_sample import (
    grid_sample_2d,
    grid_sample_3d,
    grid_sample_3d_norm_grad,
    make_identity_grid_2d,
    make_identity_grid_3d,
)
from .upfirdn import (
    blur,
    downsample_2x,
    fused_leaky_relu,
    make_resample_kernel,
    upfirdn2d,
    upsample_2x,
)
