"""Output decoding and evaluation metrics.

Rebuilds PostProcessVGMultiPhrase (/root/reference/models/post_process.py:
41-83) and the eval accumulation of engine_vg.py:127-140 as static-shape,
jit-safe functions. The reference's per-sample masked_select loop becomes a
validity-weighted reduction.

EVAL SEMANTICS TRAP (preserved faithfully): P@0.5 and mIoU are computed in
*normalized* cxcywh->xyxy space — predictions are NOT rescaled to pixels
(engine_vg.py:127-140); rescaling happens only for the JSON result dump.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp

from reftr_tpu.ops.boxes import box_cxcywh_to_xyxy, box_iou_aligned


def decode_boxes(
    pred_boxes: jnp.ndarray,  # [B, P, k, 4] cxcywh normalized
    target_sizes: jnp.ndarray | None = None,  # [B, 2] (h, w)
    scale_to_original_shape: bool = False,
) -> jnp.ndarray:
    """Take query 0 per phrase, convert to xyxy, optionally scale to pixels.

    Returns [B, P, 4].
    """
    boxes = box_cxcywh_to_xyxy(pred_boxes[:, :, 0, :])
    if scale_to_original_shape:
        assert target_sizes is not None
        h, w = target_sizes[:, 0], target_sizes[:, 1]
        scale = jnp.stack([w, h, w, h], axis=1).astype(boxes.dtype)
        boxes = boxes * scale[:, None, :]
    return boxes


def rec_metrics(
    pred_boxes: jnp.ndarray,  # [B, P, k, 4] cxcywh normalized
    target_boxes: jnp.ndarray,  # [B, P, 4] cxcywh normalized
    box_valid: jnp.ndarray,  # [B, P] bool
    iou_threshold: float = 0.5,
) -> Dict[str, jnp.ndarray]:
    """Sums for P@0.5 / mIoU accumulators (engine_vg.py:131-140,207-219).

    Returns dict of scalar sums: accu (correct count), iou (IoU sum),
    cnt (evaluated boxes). Ratios are formed host-side after cross-process
    reduction, matching the reference's all_reduce of raw sums.
    """
    pred = decode_boxes(pred_boxes)
    tgt = box_cxcywh_to_xyxy(target_boxes)
    iou, _ = box_iou_aligned(pred, tgt)  # [B, P]
    v = box_valid.astype(jnp.float32)
    iou = jnp.nan_to_num(iou, nan=0.0) * v
    return {
        "sum_accu": ((iou > iou_threshold).astype(jnp.float32) * v).sum(),
        "sum_iou": iou.sum(),
        "cnt": v.sum(),
    }


def segm_metrics(
    pred_mask_logits: jnp.ndarray,  # [B, k, h, w]
    target_masks: jnp.ndarray,  # [B, H, W] binary at canvas resolution
    image_valid: jnp.ndarray,  # [B, H, W] bool (crop-to-size semantics)
    threshold: float = 0.5,
    mask_valid: jnp.ndarray | None = None,  # [B] bool (batch padding)
) -> Dict[str, jnp.ndarray]:
    """Per-batch seg IoU sums (engine_vg.py:144-155 semantics).

    The reference bilinear-upsamples logits to the padded batch max size,
    thresholds sigmoid > 0.5, crops to each sample's resized extent, and
    takes mask IoU against the resized GT mask. With fixed canvases the
    crop becomes an AND with the validity mask.
    """
    import jax.image

    b, k = pred_mask_logits.shape[:2]
    H, W = target_masks.shape[1:]
    up = jax.image.resize(pred_mask_logits, (b, k, H, W), method="linear")
    pred = (jax.nn.sigmoid(up[:, 0]) > threshold) & image_valid
    tgt = (target_masks > 0.5) & image_valid
    inter = jnp.logical_and(pred, tgt).sum(axis=(1, 2)).astype(jnp.float32)
    union = jnp.logical_or(pred, tgt).sum(axis=(1, 2)).astype(jnp.float32)
    iou = jnp.where(union > 0, inter / jnp.maximum(union, 1.0), 0.0)
    if mask_valid is None:
        w = jnp.ones(b, jnp.float32)
    else:
        w = mask_valid.astype(jnp.float32)
    return {"sum_seg_iou": (iou * w).sum(), "cnt_seg": w.sum()}


def segm_masks(
    pred_mask_logits: jnp.ndarray,  # [B, k, h, w]
    out_size: Tuple[int, int],
    threshold: float = 0.5,
) -> jnp.ndarray:
    """Bilinear-upsample logits to out_size then threshold sigmoid>0.5
    (reftr_segmentation.py:282-302 order: upsample logits FIRST, then
    threshold). Returns [B, k, H, W] bool."""
    import jax.image

    b, k, h, w = pred_mask_logits.shape
    up = jax.image.resize(
        pred_mask_logits, (b, k, out_size[0], out_size[1]), method="bilinear")
    return jax.nn.sigmoid(up) > threshold
