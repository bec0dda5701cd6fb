"""Training losses for REC/RES, fully vectorized and jit-safe.

Rebuilds CriterionVGMultiPhrase (/root/reference/models/criterion.py:101-202)
and CriterionVGOnePhraseSeg (/root/reference/models/reftr_segmentation.py:
305-337) without host loops or masked_select: targets are padded to the
static phrase dimension and weighted by a validity mask — identical sums.

Normalization matches the reference exactly:
  * num_boxes is the GLOBAL number of target boxes averaged over workers and
    clamped at 1 per worker (criterion.py:176-180). Inside a pjit'd global
    program the batch is already global, so the denominator is
    max(global_num_boxes, world_size).
  * L1 and GIoU sums are divided by num_boxes * k (k = queries/phrase)
    (criterion.py:145,151).
  * aux losses per decoder layer get '_{i}' suffixes; masks are skipped in
    aux (criterion.py:189-201).

Targets dict (static shapes):
  boxes [B, P, 4] normalized cxcywh, box_valid [B, P] bool,
  (RES) masks [B, Hm, Wm] binary, mask_valid [B] bool.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp

from reftr_tpu.core.config import LossConfig
from reftr_tpu.ops.boxes import box_cxcywh_to_xyxy, generalized_box_iou_aligned
from reftr_tpu.ops.losses import dice_loss, sigmoid_focal_loss


def loss_boxes(
    pred_boxes: jnp.ndarray,  # [B, P, k, 4] cxcywh in (0,1)
    phrase_mask: jnp.ndarray,  # [B, P*k] bool True = valid query
    target_boxes: jnp.ndarray,  # [B, P, 4] cxcywh
    num_boxes: jnp.ndarray,  # scalar, already world-normalized
) -> Dict[str, jnp.ndarray]:
    b, p, k, _ = pred_boxes.shape
    valid = phrase_mask.reshape(b, p, k).astype(pred_boxes.dtype)
    tgt = jnp.broadcast_to(target_boxes[:, :, None, :], pred_boxes.shape)

    l1 = jnp.abs(pred_boxes - tgt).sum(-1) * valid
    giou = 1.0 - generalized_box_iou_aligned(
        box_cxcywh_to_xyxy(pred_boxes), box_cxcywh_to_xyxy(tgt))
    giou = giou * valid
    denom = num_boxes * k
    return {
        "loss_bbox": l1.sum() / denom,
        "loss_giou": giou.sum() / denom,
    }


def loss_masks(
    pred_masks: jnp.ndarray,  # [B, k, h, w] logits (k=1 live path)
    target_masks: jnp.ndarray,  # [B, Hm, Wm] binary (at pred resolution or up)
    mask_valid: jnp.ndarray,  # [B] bool
    cfg: LossConfig,
) -> Dict[str, jnp.ndarray]:
    """Focal + dice on upsampled logits (reftr_segmentation.py:314-337).

    Predictions are bilinear-upsampled (align_corners=False semantics,
    which jax.image.resize 'linear' matches) to the target resolution.
    num_boxes for masks is bs * num_q (reftr_segmentation.py:332-333).
    """
    b, k = pred_masks.shape[:2]
    if pred_masks.shape[2:] != target_masks.shape[1:]:
        import jax.image

        pred_masks = jax.image.resize(
            pred_masks, (b, k) + tuple(target_masks.shape[1:]),
            method="linear")
    tgt = jnp.broadcast_to(target_masks[:, None], pred_masks.shape)
    src = pred_masks.reshape(b * k, -1)
    tgt = tgt.reshape(b * k, -1).astype(src.dtype)
    w = jnp.repeat(mask_valid.astype(src.dtype), k)
    denom = jnp.asarray(b * k, src.dtype)
    return {
        "loss_mask": sigmoid_focal_loss(
            src, tgt, denom, cfg.focal_alpha, cfg.focal_gamma, weights=w),
        "loss_dice": dice_loss(src, tgt, denom, weights=w),
    }


def loss_vision(
    outputs: Dict[str, Any],
    targets: Dict[str, jnp.ndarray],
) -> Dict[str, jnp.ndarray]:
    """Dense in-box BCE on the encoder's image tokens (vision_aux).

    Target grid: cell (i, j) is positive iff its center — in the same
    normalized frame as the boxes (the VALID image extent, see
    data/transforms.py) — lies inside ANY valid target box. Masked-mean
    BCE over valid cells, averaged over levels. From-scratch aid (no
    reference equivalent): makes the language-only solution non-optimal,
    see core/config.py::vision_aux.
    """
    boxes = targets["boxes"].astype(jnp.float32)  # [B, P, 4] cxcywh
    bval = targets["box_valid"].astype(bool)  # [B, P]
    total = 0.0
    for logits, valid in zip(outputs["vision_logits"],
                             outputs["vision_valid"]):
        b, h, w = logits.shape
        # valid extent in cells (>=1); centers normalized by it so the
        # grid frame matches the boxes' resized-extent normalization
        ncol = jnp.maximum(valid.any(1).sum(-1), 1).astype(jnp.float32)
        nrow = jnp.maximum(valid.any(2).sum(-1), 1).astype(jnp.float32)
        cx = (jnp.arange(w, dtype=jnp.float32) + 0.5)[None] / ncol[:, None]
        cy = (jnp.arange(h, dtype=jnp.float32) + 0.5)[None] / nrow[:, None]
        inx = (jnp.abs(cx[:, None] - boxes[..., 0:1])
               <= boxes[..., 2:3] / 2)  # [B, P, w]
        iny = (jnp.abs(cy[:, None] - boxes[..., 1:2])
               <= boxes[..., 3:4] / 2)  # [B, P, h]
        inside = (iny[:, :, :, None] & inx[:, :, None, :]
                  & bval[:, :, None, None]).any(1)  # [B, h, w]
        tgt = inside.astype(jnp.float32)
        lg = logits.astype(jnp.float32)
        bce = jnp.maximum(lg, 0.0) - lg * tgt + jnp.log1p(jnp.exp(-jnp.abs(lg)))
        vw = valid.astype(jnp.float32)
        total += (bce * vw).sum() / jnp.maximum(vw.sum(), 1.0)
    return {"loss_vision": total / len(outputs["vision_logits"])}


def compute_num_boxes(box_valid: jnp.ndarray, world_size: int = 1):
    """Global box count with the reference's per-worker clamp at 1."""
    n = box_valid.astype(jnp.float32).sum()
    return jnp.maximum(n, float(world_size))


def criterion(
    outputs: Dict[str, Any],
    targets: Dict[str, jnp.ndarray],
    cfg: LossConfig,
    world_size: int = 1,
    with_masks: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Returns the unweighted loss dict (weights applied by weight_dict)."""
    num_boxes = compute_num_boxes(targets["box_valid"], world_size)
    losses = loss_boxes(outputs["pred_boxes"], outputs["phrase_mask"],
                        targets["boxes"], num_boxes)
    if "vision_logits" in outputs:
        losses.update(loss_vision(outputs, targets))
    if with_masks and "pred_masks" in outputs:
        losses.update(loss_masks(outputs["pred_masks"], targets["masks"],
                                 targets["mask_valid"], cfg))
        if "cem_loss" in outputs:
            losses["loss_cem"] = outputs["cem_loss"]
    for i, aux in enumerate(outputs.get("aux_outputs", [])):
        aux_losses = loss_boxes(aux["pred_boxes"], aux["phrase_mask"],
                                targets["boxes"], num_boxes)
        losses.update({f"{k}_{i}": v for k, v in aux_losses.items()})
    return losses


def weight_dict(cfg: LossConfig, dec_layers: int, aux_loss: bool,
                with_masks: bool = False,
                vision_aux: bool = False,
                heatmap_box: bool = False) -> Dict[str, float]:
    """Loss weights (reftr_transformer.py:320-329, reftr_segmentation.py:
    349-360). With heatmap_box the decoder's last layer is an extra aux
    entry (models/reftr.py), so the aux range extends by one."""
    wd = {"loss_giou": cfg.giou_loss_coef, "loss_bbox": cfg.bbox_loss_coef}
    if vision_aux:
        wd["loss_vision"] = cfg.vision_aux_coef
    if with_masks:
        wd.update({"loss_dice": cfg.dice_loss_coef,
                   "loss_mask": cfg.mask_loss_coef,
                   "loss_cem": cfg.cem_loss_coef})
    if aux_loss:
        base = dict(wd)
        n_aux = dec_layers if (vision_aux and heatmap_box) else dec_layers - 1
        for i in range(n_aux):
            wd.update({f"{k}_{i}": v for k, v in base.items()
                       if not k.startswith(
                           ("loss_dice", "loss_mask", "loss_cem",
                            "loss_vision"))})
    return wd


def total_loss(losses: Dict[str, jnp.ndarray],
               wd: Dict[str, float]) -> jnp.ndarray:
    """Weighted sum over losses present in the weight dict
    (engine_vg.py:44)."""
    return sum(losses[k] * wd[k] for k in losses if k in wd)
