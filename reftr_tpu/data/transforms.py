"""Image + target transform pipeline (host side, numpy + native C++ ops).

Rebuilds the reference pipelines (/root/reference/datasets/refer_resc.py:
100-119 and datasets/transforms.py) with static-shape outputs:

  train: RandomIntensitySaturation -> aspect-preserving resize (long side
         capped at max_img_size) -> pack onto a fixed canvas -> box
         normalization xyxy -> cxcywh / (resized h, w)
  test:  same without the color jitter.

Key semantics preserved:
  * resize target computation == transforms.py:82-110 (short side `size`,
    long side capped; with size == max_size the long side lands on 640),
  * boxes are normalized by the RESIZED image size (transforms.py:247-263
    normalizes after resize, before the batch-level padding) — the canvas
    padding is masked, not part of the coordinate frame,
  * masks resized with nearest + >0.5 threshold (transforms.py:133-135).

Images stay uint8 on the host; the /255 + ImageNet mean/std normalization
runs on-device inside the jitted step (reftr_tpu.ops.image).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import numpy as np

from reftr_tpu.data import native

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def crop(image: np.ndarray, boxes_xyxy: np.ndarray,
         region: Tuple[int, int, int, int],
         masks: Optional[np.ndarray] = None):
    """Paired crop, DETR semantics (reference datasets/transforms.py:21-61).

    region = (top, left, h, w). Boxes are translated, clamped to the crop,
    and entries whose clamped box degenerates (any side <= 0) are dropped;
    masks (leading [N, H, W]) are sliced and filtered by the same keep set.
    Returns (image, boxes, keep_indices[, masks]) — declared-capability
    parity: these ops are outside every live reference pipeline (the
    RandomCrop family is never added to make_refer_transforms).
    """
    i, j, h, w = region
    out_img = image[i:i + h, j:j + w]
    boxes = np.asarray(boxes_xyxy, np.float32).reshape(-1, 4).copy()
    boxes -= np.array([j, i, j, i], np.float32)
    boxes = np.minimum(boxes.reshape(-1, 2, 2),
                       np.array([w, h], np.float32))
    boxes = np.clip(boxes, 0, None)
    keep = np.all(boxes[:, 1, :] > boxes[:, 0, :], axis=1)
    boxes = boxes.reshape(-1, 4)[keep]
    if masks is not None:
        out_masks = masks[..., i:i + h, j:j + w]
        if out_masks.ndim == 3:
            out_masks = out_masks[keep]
        return out_img, boxes, keep, out_masks
    return out_img, boxes, keep


def hflip(image: np.ndarray, boxes_xyxy: np.ndarray,
          masks: Optional[np.ndarray] = None):
    """Paired horizontal flip (reference datasets/transforms.py:64-78)."""
    out_img = image[:, ::-1].copy()
    w = image.shape[1]
    boxes = np.asarray(boxes_xyxy, np.float32).reshape(-1, 4)
    boxes = (boxes[:, [2, 1, 0, 3]] * np.array([-1, 1, -1, 1], np.float32)
             + np.array([w, 0, w, 0], np.float32))
    if masks is not None:
        return out_img, boxes, np.flip(masks, axis=-1).copy()
    return out_img, boxes


def center_crop_region(h: int, w: int, crop_h: int,
                       crop_w: int) -> Tuple[int, int, int, int]:
    """CenterCrop's region math (reference datasets/transforms.py:174-183)."""
    top = int(round((h - crop_h) / 2.0))
    left = int(round((w - crop_w) / 2.0))
    return top, left, crop_h, crop_w


def random_crop_region(h: int, w: int, crop_h: int, crop_w: int,
                       rng: np.random.Generator):
    """torchvision RandomCrop.get_params equivalent (transforms.py:158)."""
    if h == crop_h and w == crop_w:
        return 0, 0, h, w
    top = int(rng.integers(0, h - crop_h + 1))
    left = int(rng.integers(0, w - crop_w + 1))
    return top, left, crop_h, crop_w


def resize_target_hw(h: int, w: int, size: int,
                     max_size: Optional[int]) -> Tuple[int, int]:
    """Output (h, w) of the reference's aspect-preserving resize."""
    if max_size is not None:
        mn, mx = float(min(w, h)), float(max(w, h))
        if mx / mn * size > max_size:
            size = int(round(max_size * mn / mx))
    if (w <= h and w == size) or (h <= w and h == size):
        return h, w
    if w < h:
        ow = size
        oh = int(size * h / w)
    else:
        oh = size
        ow = int(size * w / h)
    return oh, ow


@dataclasses.dataclass
class TransformedSample:
    canvas: np.ndarray  # [S, S, 3] uint8
    valid_hw: Tuple[int, int]  # resized image extent inside the canvas
    boxes_cxcywh: np.ndarray  # [N, 4] normalized to valid_hw
    mask_canvas: Optional[np.ndarray] = None  # [S, S] float {0,1}
    orig_hw: Tuple[int, int] = (0, 0)


def transform_sample(
    image: np.ndarray,  # [H, W, 3] uint8 RGB
    boxes_xyxy: np.ndarray,  # [N, 4] pixels in the original image
    img_size: int,
    max_img_size: int,
    train: bool,
    rng: Optional[np.random.Generator] = None,
    hsv_fraction: float = 0.5,
    seg_mask: Optional[np.ndarray] = None,  # [H, W] binary
) -> TransformedSample:
    h, w = image.shape[:2]
    if train:
        assert rng is not None
        # NB the reference's RandomIntensitySaturation draws a saturation
        # factor but never multiplies it into S (transforms.py:272-275 only
        # clips) — the live behavior is VALUE-only jitter. We draw both
        # factors (same rng stream shape) but apply s=1.0 to match.
        _s_unused = float((rng.random() * 2 - 1) * hsv_fraction + 1)
        v = float((rng.random() * 2 - 1) * hsv_fraction + 1)
        image = native.hsv_jitter(image, 1.0, v)

    oh, ow = resize_target_hw(h, w, img_size, max_img_size)
    resized = native.resize_bilinear(image, (oh, ow))
    canvas = native.pack_canvas(resized, (max_img_size, max_img_size))

    boxes = np.asarray(boxes_xyxy, np.float32).reshape(-1, 4).copy()
    rw, rh = ow / w, oh / h
    boxes *= np.array([rw, rh, rw, rh], np.float32)
    # xyxy -> cxcywh normalized by the resized extent
    cx = (boxes[:, 0] + boxes[:, 2]) / 2 / ow
    cy = (boxes[:, 1] + boxes[:, 3]) / 2 / oh
    bw = (boxes[:, 2] - boxes[:, 0]) / ow
    bh = (boxes[:, 3] - boxes[:, 1]) / oh
    out_boxes = np.stack([cx, cy, bw, bh], axis=1).astype(np.float32)

    mask_canvas = None
    if seg_mask is not None:
        # nearest resize + >0.5 (mask is binary so nearest subsample)
        ys = np.floor(np.arange(oh) * (h / oh)).astype(np.int64)
        xs = np.floor(np.arange(ow) * (w / ow)).astype(np.int64)
        mres = (seg_mask[ys][:, xs] > 0.5).astype(np.float32)
        mask_canvas = np.zeros((max_img_size, max_img_size), np.float32)
        mask_canvas[:oh, :ow] = mres

    return TransformedSample(
        canvas=canvas, valid_hw=(oh, ow), boxes_cxcywh=out_boxes,
        mask_canvas=mask_canvas, orig_hw=(h, w))
