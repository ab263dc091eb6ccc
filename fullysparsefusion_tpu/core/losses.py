"""Loss functions — plain-JAX replacements for mmcv/mmdet CUDA losses.

Covers the reference's loss surface (FSF_nuScenes_config.py:129-138,87-94):
  * sigmoid focal loss (gamma=4.0, alpha=0.25 in shipped configs) — replaces
    the mmcv CUDA SigmoidFocalLoss kernel;
  * L1 loss with elementwise weights;
  * softmax cross-entropy with per-class weights (segmentation head,
    class_weight 0.1 for background).

All losses take an explicit weight/mask and an ``avg_factor`` so the caller
controls normalization — including globally-synced avg factors, which under a
sharded jit step are just sums over the global batch (the reference needed
explicit ``reduce_mean`` all-reduces: sparse_cluster_head.py:140-161).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def sigmoid_focal_loss(
    logits: jax.Array,
    targets_onehot: jax.Array,
    gamma: float = 2.0,
    alpha: float = 0.25,
) -> jax.Array:
    """Per-element focal loss (no reduction). targets_onehot ∈ {0,1}."""
    p = jax.nn.sigmoid(logits)
    ce = optax_sigmoid_ce(logits, targets_onehot)
    p_t = p * targets_onehot + (1 - p) * (1 - targets_onehot)
    alpha_t = alpha * targets_onehot + (1 - alpha) * (1 - targets_onehot)
    return alpha_t * ((1 - p_t) ** gamma) * ce


def optax_sigmoid_ce(logits, labels):
    """Numerically-stable sigmoid cross entropy."""
    return jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def l1_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.abs(pred - target)


def softmax_ce_loss(
    logits: jax.Array,
    labels: jax.Array,
    class_weight: Optional[jax.Array] = None,
) -> jax.Array:
    """Per-element weighted CE. labels int [N]; returns [N]."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    n_cls = logits.shape[-1]
    safe = jnp.clip(labels, 0, n_cls - 1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    if class_weight is not None:
        nll = nll * class_weight[safe]
    return nll


def weighted_reduce(
    loss: jax.Array,
    weight: jax.Array,
    avg_factor: jax.Array,
) -> jax.Array:
    """sum(loss * weight) / max(avg_factor, 1)."""
    return jnp.sum(loss * weight) / jnp.maximum(avg_factor, 1.0)
