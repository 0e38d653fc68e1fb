"""Face-vector identity/expression matching losses on frozen recognition towers.

Reference:
  * Face_vector_resnet (networks/volumetric_avatar/utils.py:1449): a frozen SENet50/
    ResNet18 face recognizer producing an embedding; the `resnet18_fv_mix` loss (prod
    weight 35) cosine-matches embeddings of the mixing output and the target
    (va_losses_and_visuals.py:324-355);
  * Face_vector (utils.py: head-pose-crop variant) feeding idt-contrastive terms.

Implemented as a thin functional wrapper over the flax ResNet backbone: crop the face
box (2x zoom like the expression crop), embed, and compare with cosine similarity.
Weights port from the SENet50/ResNet18 face-recognition releases.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ..models.backbones.resnet import ResNet
from ..models.identity_embedder import IMAGENET_MEAN, IMAGENET_STD
from .expression import cosine_embedding_loss


def make_face_vector_tower(rng: jax.Array, image_size: int = 224,
                           backbone: str = "resnet18"):
    layers = (2, 2, 2, 2) if backbone == "resnet18" else (3, 4, 6, 3)
    block = "basic" if backbone == "resnet18" else "bottleneck"
    net = ResNet(layers=layers, block=block, norm="bn")
    params = net.init(rng, jnp.zeros((1, image_size, image_size, 3)))

    def embed(p, img):
        x = jax.image.resize(img, (img.shape[0], image_size, image_size, 3),
                             method="linear")
        x = (x - IMAGENET_MEAN.astype(x.dtype)) / IMAGENET_STD.astype(x.dtype)
        feat = net.apply(p, x)
        return jnp.mean(feat, axis=(1, 2))  # (B, 512*expansion)

    return embed, params


def face_vector_cosine_loss(embed_fn: Callable, params, pred: jax.Array,
                            target: jax.Array, margin: float = 0.1) -> jax.Array:
    """1 - cos between frozen face vectors of pred and target
    (reference resnet18_fv_mix assembly, va_losses_and_visuals.py:324-355)."""
    ep = embed_fn(params, pred)
    et = jax.lax.stop_gradient(embed_fn(params, target))
    return cosine_embedding_loss(ep, et, target=1, margin=margin)
