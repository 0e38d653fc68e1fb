"""Perceptual loss engine: multi-backbone, multi-scale feature L1 on frozen towers.

Reference: losses/perceptual.py:14-346 — the same engine serves vgg19 (ImageNet),
vgg_face_dag (VGGFace), and further towers; prod uses vgg19 (weight 18, 4 scales) and
vgg19_face (weight 10, 2 scales, resize to 224) per init_losses
(va_losses_and_visuals.py:735-742) with per-layer weights (0.03125, 0.0625, 0.125,
0.25, 1.0) over the first conv activation of each stage.

The towers are pure apply-functions over frozen param trees (reference converts params to
buffers and pins eval mode, perceptual.py:250-256, 228). Weights are ported from
torchvision / the VGGFace release by emoportraits_tpu.port; randomly-initialized towers
still exercise the full code path for tests.
"""
from __future__ import annotations

import functools
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..models.identity_embedder import IMAGENET_MEAN, IMAGENET_STD
from ..ops.blocks import Conv

# torchvision VGG configs: number of 3x3 convs per stage and channel width.
VGG19_STAGES = ((2, 64), (2, 128), (4, 256), (4, 512), (4, 512))
VGG16_STAGES = ((2, 64), (2, 128), (3, 256), (3, 512), (3, 512))

# Raw-mean normalization used by the reference's face_resnet/SENet tower
# (perceptual.py:163-166, face_norm=True with apply_normalization=False): the mean is
# subtracted in 0-255 space, so callers must feed 0-255-scaled images in this mode.
# NOTE: the vgg19_face tower does NOT use this — it uses ImageNet normalization
# (PerceptualLoss defaults, init_losses va_losses_and_visuals.py:739-742).
FACE_RESNET_MEAN = jnp.array([131.0912, 103.8827, 91.4953])


class VGGFeatures(nn.Module):
    """VGG feature extractor returning the relu_{s}_1 activation of every stage.

    Parameter names follow `conv{stage}_{idx}` so torch `features.*` weights map 1:1.
    """
    stages: Tuple[Tuple[int, int], ...] = VGG19_STAGES
    pool: str = "max"

    @nn.compact
    def __call__(self, x: jax.Array) -> Dict[str, jax.Array]:
        feats = {}
        for si, (n_convs, ch) in enumerate(self.stages, start=1):
            for ci in range(1, n_convs + 1):
                x = Conv(ch, (3, 3), name=f"conv{si}_{ci}")(x)
                x = jax.nn.relu(x)
                if ci == 1:
                    feats[f"relu_{si}_1"] = x
            if si < len(self.stages):
                if self.pool == "max":
                    x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                              (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
                else:
                    x = jax.lax.reduce_window(x, 0.0, jax.lax.add,
                                              (1, 2, 2, 1), (1, 2, 2, 1), "VALID") / 4
        return feats


DEFAULT_LAYERS = ("relu_1_1", "relu_2_1", "relu_3_1", "relu_4_1", "relu_5_1")
DEFAULT_WEIGHTS = (0.03125, 0.0625, 0.125, 0.25, 1.0)


def _resize_by(x: jax.Array, factor: float) -> jax.Array:
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, int(h * factor), int(w * factor), c),
                            method="linear")


def perceptual_loss(
    tower_apply,
    tower_params,
    pred: jax.Array,
    target: jax.Array,
    *,
    num_scales: int = 4,
    layers: Sequence[str] = DEFAULT_LAYERS,
    layer_weights: Sequence[float] = DEFAULT_WEIGHTS,
    normalization: str = "imagenet",  # 'imagenet' | 'vggface' | 'none'
    resize_to: Optional[int] = None,
    scale_factor: float = 0.5,
) -> jax.Array:
    """Multi-scale feature L1 (reference PerceptualLoss.forward, perceptual.py:108-231).

    tower_apply(params, img) -> {layer: activation}. Target features are
    stop-gradiented; the pyramid downscales bilinearly by `scale_factor`
    between scales (the reference's vgg_emotions config uses 0.8; default 0.5).
    """
    if normalization == "imagenet":
        pred = (pred - IMAGENET_MEAN.astype(pred.dtype)) / IMAGENET_STD.astype(pred.dtype)
        target = (target - IMAGENET_MEAN.astype(target.dtype)) / IMAGENET_STD.astype(target.dtype)
    elif normalization == "face_resnet":
        # SENet/face_resnet mode: raw 0-255-space mean subtraction (reference
        # face_norm, perceptual.py:163-166); inputs here are [0,1] so scale up first.
        pred = pred * 255.0 - FACE_RESNET_MEAN.astype(pred.dtype)
        target = target * 255.0 - FACE_RESNET_MEAN.astype(target.dtype)
    if resize_to is not None:
        def rs(im):
            return jax.image.resize(im, (im.shape[0], resize_to, resize_to, im.shape[3]),
                                    method="linear")
        pred, target = rs(pred), rs(target)

    b = pred.shape[0]
    loss = 0.0
    for scale in range(num_scales):
        # ONE tower call per scale on the stacked [pred; target] batch: halves the
        # program size (the 512px prod step was hitting compile-payload limits with
        # per-image instantiation) and keeps the MXU matmuls twice as large. The
        # target half is stop-gradiented after the split — identical math.
        feats = tower_apply(tower_params, jnp.concatenate([pred, target], axis=0))
        for name, w in zip(layers, layer_weights):
            pf, tf = feats[name][:b], jax.lax.stop_gradient(feats[name][b:])
            loss = loss + w * jnp.mean(jnp.abs(pf - tf))
        if scale != num_scales - 1:
            pred = _resize_by(pred, scale_factor)
            target = _resize_by(target, scale_factor)
    return loss / num_scales


def make_vgg19_tower(rng: jax.Array, image_size: int = 512):
    """Build (apply_fn, params) for the VGG19 loss tower. Params are frozen constants;
    replace with ported torchvision weights via emoportraits_tpu.port for fidelity."""
    tower = VGGFeatures(stages=VGG19_STAGES)
    params = tower.init(rng, jnp.zeros((1, image_size, image_size, 3)))
    return tower.apply, params


def make_vggface_tower(rng: jax.Array, image_size: int = 224):
    tower = VGGFeatures(stages=VGG16_STAGES)
    params = tower.init(rng, jnp.zeros((1, image_size, image_size, 3)))
    return tower.apply, params
