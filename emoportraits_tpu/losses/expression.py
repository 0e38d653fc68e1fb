"""Latent expression-space losses: cosine pull/push, source-target margin ("stm"), and
the InfoNCE-style contrastive loss.

Reference: models/stage_1/volumetric_avatar/va_losses_and_visuals.py:457-578 (pull/push/
stm composition inside calc_train_losses) and :827-831 (contrastive_loss). The torch
primitives are CosineEmbeddingLoss (margin 0.1 / 0.3 / 0.5) and CosineSimilarity
(:779-783); replicated here in jnp. The negatives history queue (`prev_targets`,
:480-487) is carried as explicit state by the train step, not hidden module state.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def cosine_sim(a: jax.Array, b: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Row-wise cosine similarity, torch.nn.CosineSimilarity semantics. (B, D) -> (B,)."""
    an = jnp.linalg.norm(a, axis=-1)
    bn = jnp.linalg.norm(b, axis=-1)
    return jnp.sum(a * b, axis=-1) / jnp.maximum(an * bn, eps)


def cosine_embedding_loss(a: jax.Array, b: jax.Array, target: int,
                          margin: float = 0.0, reduce: bool = True) -> jax.Array:
    """torch.nn.CosineEmbeddingLoss: target=+1 -> 1 - cos; target=-1 -> relu(cos - margin)."""
    cos = cosine_sim(a, b)
    loss = (1.0 - cos) if target == 1 else jax.nn.relu(cos - margin)
    return jnp.mean(loss) if reduce else loss


def pull_loss(pred_exp: jax.Array, target_exp: jax.Array,
              margin: float = 0.1) -> jax.Array:
    """Pull predicted/cycled expression vectors toward the target's
    (reference :458-470, cosin_sim_pos margin 0.1)."""
    return cosine_embedding_loss(pred_exp, target_exp, target=1, margin=margin)


def push_loss(pred_exp: jax.Array, negatives: jax.Array,
              margin: float = 0.3) -> jax.Array:
    """Push away from rolled in-batch negatives: sum over all b-1 rolls
    (reference :489-499, cosin_sim margin 0.3). negatives: (B, D) batch to roll."""
    b = pred_exp.shape[0]
    loss = 0.0
    for i in range(1, b):
        loss = loss + cosine_embedding_loss(
            pred_exp, jnp.roll(negatives, i, axis=0), target=-1, margin=margin)
    return loss


def stm_loss_elems(source_exp: jax.Array, target_exp: jax.Array,
                   margin: float = 0.5) -> jax.Array:
    """Per-element source-target-margin terms, (B,) — no reduction. The prod
    `separate_stm` branch (reference :500-506) weights batch element 0 (the
    FEED-spliced extreme-emotion sample) differently from the rest."""
    return cosine_embedding_loss(
        jax.lax.stop_gradient(source_exp), target_exp, target=-1,
        margin=margin, reduce=False)


def stm_loss(source_exp: jax.Array, target_exp: jax.Array,
             margin: float = 0.5) -> jax.Array:
    """Source-target margin: source and target of the same identity should differ in
    expression (reference :501-509, cosin_sim_2 margin 0.5)."""
    return jnp.mean(stm_loss_elems(source_exp, target_exp, margin))


def contrastive_loss(pos_dot: jax.Array, neg_dot: jax.Array,
                     t: float = 0.2, m: float = 0.2, n: int = 1) -> jax.Array:
    """InfoNCE with margin on the positive (reference contrastive_loss, :827-831).

    pos_dot: (B,) positive cosine sims; neg_dot: (K, B) negatives.
    """
    a = jnp.exp((pos_dot - m) / t)
    b = jnp.exp(neg_dot / t)
    loss = -jnp.log(a / (a + jnp.sum(b, axis=0))) / n
    return jnp.sum(loss)


def barlow_twins_loss(a: jax.Array, b: jax.Array, lambd: float = 1.0 / 512,
                      axis_name: str | None = None) -> jax.Array:
    """Barlow-twins decorrelation between two embedding batches (off in prod, weight 0;
    reference va_losses_and_visuals.py:440-456 — batch-normalized cross-correlation,
    `all_reduce(c)` across ranks -> here an optional `psum` over the mesh axis).
    a, b: (B, D)."""
    def bn(x):
        mu = jnp.mean(x, axis=0, keepdims=True)
        sd = jnp.std(x, axis=0, keepdims=True) + 1e-5
        return (x - mu) / sd

    c = bn(a).T @ bn(b) / a.shape[0]
    if axis_name is not None:
        c = jax.lax.psum(c, axis_name)
    on_diag = jnp.sum((jnp.diagonal(c) - 1.0) ** 2)
    off = c - jnp.diag(jnp.diagonal(c))
    off_diag = jnp.sum(off ** 2)
    return on_diag + lambd * off_diag


def contrastive_exp_loss(pred_exp: jax.Array, target_exp: jax.Array,
                         source_exp: Optional[jax.Array] = None,
                         t: float = 0.2, m: float = 0.2) -> jax.Array:
    """Full contrastive assembly: positives pred<->target, negatives = rolled targets
    (+ stm source negatives when given) (reference :538-578)."""
    b = pred_exp.shape[0]
    if b <= 1:
        return jnp.zeros(())
    negs = [cosine_sim(pred_exp, jnp.roll(target_exp, i, axis=0)) for i in range(1, b)]
    if source_exp is not None:
        negs.append(cosine_embedding_loss(
            jax.lax.stop_gradient(source_exp), target_exp, target=-1,
            margin=0.5, reduce=False))
    pos = cosine_sim(pred_exp, target_exp)
    return contrastive_loss(pos, jnp.stack(negs, axis=0), t=t, m=m)
