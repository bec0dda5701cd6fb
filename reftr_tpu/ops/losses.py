"""Segmentation losses in pure jnp.

Matches /root/reference/models/modeling/segmentation.py:178-221 bit-for-bit
in float32, with optional per-sample weights so padded batch slots can be
zeroed without dynamic shapes (the reference instead relies on variable-size
batches).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def dice_loss(
    inputs: jnp.ndarray,
    targets: jnp.ndarray,
    num_boxes: jnp.ndarray | float,
    weights: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """DICE loss over flattened masks.

    inputs: [N, L] logits; targets: [N, L] binary; weights: optional [N]
    validity weights (1 for live samples, 0 for padding).
    """
    probs = jax.nn.sigmoid(inputs)
    numerator = 2.0 * jnp.sum(probs * targets, axis=1)
    denominator = jnp.sum(probs, axis=-1) + jnp.sum(targets, axis=-1)
    loss = 1.0 - (numerator + 1.0) / (denominator + 1.0)
    if weights is not None:
        loss = loss * weights
    return jnp.sum(loss) / num_boxes


def sigmoid_focal_loss(
    inputs: jnp.ndarray,
    targets: jnp.ndarray,
    num_boxes: jnp.ndarray | float,
    alpha: float = 0.25,
    gamma: float = 2.0,
    weights: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Sigmoid focal loss (RetinaNet), mean over the last axis then
    sum / num_boxes, exactly as segmentation.py:195-221.

    inputs: [N, L] logits; targets: [N, L] binary in {0, 1}.
    """
    prob = jax.nn.sigmoid(inputs)
    # binary_cross_entropy_with_logits, numerically stable form
    ce_loss = jnp.clip(inputs, a_min=0) - inputs * targets + jnp.log1p(
        jnp.exp(-jnp.abs(inputs))
    )
    p_t = prob * targets + (1.0 - prob) * (1.0 - targets)
    loss = ce_loss * (1.0 - p_t) ** gamma
    if alpha >= 0:
        alpha_t = alpha * targets + (1.0 - alpha) * (1.0 - targets)
        loss = alpha_t * loss
    loss = jnp.mean(loss, axis=1)
    if weights is not None:
        loss = loss * weights
    return jnp.sum(loss) / num_boxes
