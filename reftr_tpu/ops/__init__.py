from reftr_tpu.ops.boxes import (
    box_area,
    box_cxcywh_to_xyxy,
    box_iou_aligned,
    box_iou_pairwise,
    box_xyxy_to_cxcywh,
    generalized_box_iou_aligned,
    generalized_box_iou_pairwise,
    mask_iou,
    masks_to_boxes,
)
from reftr_tpu.ops.losses import dice_loss, sigmoid_focal_loss
from reftr_tpu.ops.posenc import sine_position_embedding

__all__ = [
    "box_area",
    "box_cxcywh_to_xyxy",
    "box_iou_aligned",
    "box_iou_pairwise",
    "box_xyxy_to_cxcywh",
    "generalized_box_iou_aligned",
    "generalized_box_iou_pairwise",
    "mask_iou",
    "masks_to_boxes",
    "dice_loss",
    "sigmoid_focal_loss",
    "sine_position_embedding",
]
