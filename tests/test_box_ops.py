"""Golden tests for box ops against independent torch implementations of the
published DETR/GIoU formulas (computed in-test, not imported from anywhere)."""

import numpy as np
import pytest
import torch

from reftr_tpu.ops import (
    box_cxcywh_to_xyxy,
    box_iou_aligned,
    box_iou_pairwise,
    box_xyxy_to_cxcywh,
    generalized_box_iou_aligned,
    generalized_box_iou_pairwise,
    mask_iou,
    masks_to_boxes,
)


def random_xyxy(rng, n):
    lt = rng.uniform(0, 0.5, size=(n, 2))
    wh = rng.uniform(0.05, 0.5, size=(n, 2))
    return np.concatenate([lt, lt + wh], axis=1).astype(np.float32)


def torch_giou_pairwise(b1, b2):
    b1 = torch.from_numpy(b1)
    b2 = torch.from_numpy(b2)
    area1 = (b1[:, 2] - b1[:, 0]) * (b1[:, 3] - b1[:, 1])
    area2 = (b2[:, 2] - b2[:, 0]) * (b2[:, 3] - b2[:, 1])
    lt = torch.max(b1[:, None, :2], b2[:, :2])
    rb = torch.min(b1[:, None, 2:], b2[:, 2:])
    wh = (rb - lt).clamp(min=0)
    inter = wh[:, :, 0] * wh[:, :, 1]
    union = area1[:, None] + area2 - inter
    iou = inter / union
    lt = torch.min(b1[:, None, :2], b2[:, :2])
    rb = torch.max(b1[:, None, 2:], b2[:, 2:])
    wh = (rb - lt).clamp(min=0)
    area = wh[:, :, 0] * wh[:, :, 1]
    return (iou - (area - union) / area).numpy(), iou.numpy()


def test_format_roundtrip(rng):
    b = random_xyxy(rng, 32)
    out = np.asarray(box_cxcywh_to_xyxy(box_xyxy_to_cxcywh(b)))
    np.testing.assert_allclose(out, b, rtol=1e-6, atol=1e-6)


def test_cxcywh_to_xyxy_values():
    b = np.array([[0.5, 0.5, 0.2, 0.4]], dtype=np.float32)
    out = np.asarray(box_cxcywh_to_xyxy(b))
    np.testing.assert_allclose(out, [[0.4, 0.3, 0.6, 0.7]], rtol=1e-6)


def test_pairwise_iou_giou_vs_torch(rng):
    b1 = random_xyxy(rng, 17)
    b2 = random_xyxy(rng, 23)
    giou_t, iou_t = torch_giou_pairwise(b1, b2)
    iou_j, _ = box_iou_pairwise(b1, b2)
    giou_j = generalized_box_iou_pairwise(b1, b2)
    np.testing.assert_allclose(np.asarray(iou_j), iou_t, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(giou_j), giou_t, rtol=1e-5, atol=1e-6)


def test_aligned_equals_pairwise_diag(rng):
    b1 = random_xyxy(rng, 19)
    b2 = random_xyxy(rng, 19)
    giou_pair = np.asarray(generalized_box_iou_pairwise(b1, b2))
    giou_aligned = np.asarray(generalized_box_iou_aligned(b1, b2))
    np.testing.assert_allclose(giou_aligned, np.diag(giou_pair), rtol=1e-5, atol=1e-6)
    iou_pair, _ = box_iou_pairwise(b1, b2)
    iou_aligned, _ = box_iou_aligned(b1, b2)
    np.testing.assert_allclose(
        np.asarray(iou_aligned), np.diag(np.asarray(iou_pair)), rtol=1e-5, atol=1e-6
    )


def test_aligned_batched_shape(rng):
    b1 = random_xyxy(rng, 24).reshape(2, 3, 4, 4)
    b2 = random_xyxy(rng, 24).reshape(2, 3, 4, 4)
    out = generalized_box_iou_aligned(b1, b2)
    assert out.shape == (2, 3, 4)


def test_identical_boxes_giou_is_one(rng):
    b = random_xyxy(rng, 8)
    np.testing.assert_allclose(
        np.asarray(generalized_box_iou_aligned(b, b)), np.ones(8), rtol=1e-5
    )


def test_masks_to_boxes():
    m = np.zeros((2, 16, 20), dtype=np.float32)
    m[0, 3:9, 4:15] = 1  # y 3..8, x 4..14
    m[1, 0:2, 0:5] = 1
    out = np.asarray(masks_to_boxes(m))
    np.testing.assert_allclose(out[0], [4, 3, 14, 8])
    np.testing.assert_allclose(out[1], [0, 0, 4, 1])


def test_mask_iou():
    a = np.zeros((1, 10, 10), dtype=bool)
    b = np.zeros((1, 10, 10), dtype=bool)
    a[0, :5] = True  # 50 px
    b[0, 3:8] = True  # 50 px, overlap rows 3-4 = 20 px
    got = float(mask_iou(a, b))
    assert got == pytest.approx(20.0 / 80.0)
