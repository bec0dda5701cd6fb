"""Bounding-box utilities in pure jnp.

Numerically matches the reference semantics (/root/reference/util/box_ops.py)
but is fully batched: all functions accept arbitrary leading dimensions, and
the loss path uses *aligned* (elementwise) IoU/GIoU instead of building the
full NxN pairwise matrix and taking its diagonal as the reference does
(criterion.py:148-151) — same values, O(N) instead of O(N^2).

Degenerate boxes are NOT asserted against at runtime (XLA has no cheap
data-dependent assert); the criterion guarantees positivity via sigmoid
outputs, mirroring the reference's assert (criterion.py:147).
"""

from __future__ import annotations

import jax.numpy as jnp


def box_cxcywh_to_xyxy(b: jnp.ndarray) -> jnp.ndarray:
    """[..., 4] (cx, cy, w, h) -> (x0, y0, x1, y1)."""
    cx, cy, w, h = jnp.split(b, 4, axis=-1)
    return jnp.concatenate(
        [cx - 0.5 * w, cy - 0.5 * h, cx + 0.5 * w, cy + 0.5 * h], axis=-1
    )


def box_xyxy_to_cxcywh(b: jnp.ndarray) -> jnp.ndarray:
    """[..., 4] (x0, y0, x1, y1) -> (cx, cy, w, h)."""
    x0, y0, x1, y1 = jnp.split(b, 4, axis=-1)
    return jnp.concatenate(
        [(x0 + x1) * 0.5, (y0 + y1) * 0.5, x1 - x0, y1 - y0], axis=-1
    )


def box_area(b: jnp.ndarray) -> jnp.ndarray:
    """[..., 4] xyxy -> [...] area."""
    return (b[..., 2] - b[..., 0]) * (b[..., 3] - b[..., 1])


def box_iou_aligned(boxes1: jnp.ndarray, boxes2: jnp.ndarray):
    """Elementwise IoU of aligned box arrays [..., 4] xyxy.

    Returns (iou, union), both [...].
    """
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)
    lt = jnp.maximum(boxes1[..., :2], boxes2[..., :2])
    rb = jnp.minimum(boxes1[..., 2:], boxes2[..., 2:])
    wh = jnp.clip(rb - lt, a_min=0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1 + area2 - inter
    return inter / union, union


def generalized_box_iou_aligned(boxes1: jnp.ndarray, boxes2: jnp.ndarray):
    """Elementwise GIoU of aligned box arrays [..., 4] xyxy -> [...].

    Equals diag(generalized_box_iou(boxes1, boxes2)) of the reference
    (util/box_ops.py:48-69) without materializing the pairwise matrix.
    """
    iou, union = box_iou_aligned(boxes1, boxes2)
    lt = jnp.minimum(boxes1[..., :2], boxes2[..., :2])
    rb = jnp.maximum(boxes1[..., 2:], boxes2[..., 2:])
    wh = jnp.clip(rb - lt, a_min=0)
    area = wh[..., 0] * wh[..., 1]
    return iou - (area - union) / area


def box_iou_pairwise(boxes1: jnp.ndarray, boxes2: jnp.ndarray):
    """Pairwise IoU: [N, 4] x [M, 4] xyxy -> ([N, M], [N, M] union)."""
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)
    lt = jnp.maximum(boxes1[:, None, :2], boxes2[None, :, :2])
    rb = jnp.minimum(boxes1[:, None, 2:], boxes2[None, :, 2:])
    wh = jnp.clip(rb - lt, a_min=0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1[:, None] + area2[None, :] - inter
    return inter / union, union


def generalized_box_iou_pairwise(boxes1: jnp.ndarray, boxes2: jnp.ndarray):
    """Pairwise GIoU: [N, 4] x [M, 4] xyxy -> [N, M].

    Used by the (capability-parity) Hungarian matcher cost.
    """
    iou, union = box_iou_pairwise(boxes1, boxes2)
    lt = jnp.minimum(boxes1[:, None, :2], boxes2[None, :, :2])
    rb = jnp.maximum(boxes1[:, None, 2:], boxes2[None, :, 2:])
    wh = jnp.clip(rb - lt, a_min=0)
    area = wh[..., 0] * wh[..., 1]
    return iou - (area - union) / area


def masks_to_boxes(masks: jnp.ndarray) -> jnp.ndarray:
    """[N, H, W] binary masks -> [N, 4] xyxy boxes.

    Matches util/box_ops.py:72-96: max of index*mask for the upper corner,
    min with empty pixels filled by 1e8 for the lower corner. Empty masks
    produce (1e8, 1e8, 0, 0) like the reference.
    """
    n, h, w = masks.shape
    y = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    x = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    m = masks.astype(jnp.float32)
    mb = masks.astype(bool)

    x_mask = m * x
    x_max = x_mask.reshape(n, -1).max(axis=-1)
    x_min = jnp.where(mb, x_mask, 1e8).reshape(n, -1).min(axis=-1)
    y_mask = m * y
    y_max = y_mask.reshape(n, -1).max(axis=-1)
    y_min = jnp.where(mb, y_mask, 1e8).reshape(n, -1).min(axis=-1)
    return jnp.stack([x_min, y_min, x_max, y_max], axis=1)


def mask_iou(masks: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Scalar IoU of two boolean mask stacks (util/box_ops.py:99-103)."""
    i = jnp.sum(jnp.logical_and(masks, target))
    u = jnp.sum(jnp.logical_or(masks, target))
    return i.astype(jnp.float32) / u.astype(jnp.float32)
