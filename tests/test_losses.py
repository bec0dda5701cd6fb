"""Golden tests for focal/dice losses vs in-test torch implementations of the
published formulas (RetinaNet focal, DICE)."""

import numpy as np
import torch
import torch.nn.functional as F

from reftr_tpu.ops import dice_loss, sigmoid_focal_loss


def torch_dice(inputs, targets, num_boxes):
    inputs = torch.sigmoid(torch.from_numpy(inputs)).flatten(1)
    targets = torch.from_numpy(targets).flatten(1)
    numerator = 2 * (inputs * targets).sum(1)
    denominator = inputs.sum(-1) + targets.sum(-1)
    loss = 1 - (numerator + 1) / (denominator + 1)
    return float(loss.sum() / num_boxes)


def torch_focal(inputs, targets, num_boxes, alpha=0.25, gamma=2.0):
    inputs = torch.from_numpy(inputs)
    targets = torch.from_numpy(targets)
    prob = inputs.sigmoid()
    ce = F.binary_cross_entropy_with_logits(inputs, targets, reduction="none")
    p_t = prob * targets + (1 - prob) * (1 - targets)
    loss = ce * ((1 - p_t) ** gamma)
    if alpha >= 0:
        alpha_t = alpha * targets + (1 - alpha) * (1 - targets)
        loss = alpha_t * loss
    return float(loss.mean(1).sum() / num_boxes)


def test_dice_vs_torch(rng):
    x = rng.normal(size=(4, 64)).astype(np.float32) * 3
    t = (rng.uniform(size=(4, 64)) > 0.5).astype(np.float32)
    got = float(dice_loss(x, t, 4.0))
    want = torch_dice(x, t, 4.0)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_focal_vs_torch(rng):
    x = rng.normal(size=(4, 64)).astype(np.float32) * 4
    t = (rng.uniform(size=(4, 64)) > 0.5).astype(np.float32)
    got = float(sigmoid_focal_loss(x, t, 4.0))
    want = torch_focal(x, t, 4.0)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_focal_extreme_logits_stable(rng):
    x = np.array([[60.0, -60.0, 0.0]], dtype=np.float32)
    t = np.array([[1.0, 0.0, 1.0]], dtype=np.float32)
    got = float(sigmoid_focal_loss(x, t, 1.0))
    want = torch_focal(x, t, 1.0)
    assert np.isfinite(got)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)


def test_weights_zero_out_padding(rng):
    x = rng.normal(size=(4, 64)).astype(np.float32)
    t = (rng.uniform(size=(4, 64)) > 0.5).astype(np.float32)
    w = np.array([1.0, 1.0, 0.0, 0.0], dtype=np.float32)
    got = float(dice_loss(x, t, 2.0, weights=w))
    want = torch_dice(x[:2], t[:2], 2.0)
    np.testing.assert_allclose(got, want, rtol=1e-5)
    got_f = float(sigmoid_focal_loss(x, t, 2.0, weights=w))
    want_f = torch_focal(x[:2], t[:2], 2.0)
    np.testing.assert_allclose(got_f, want_f, rtol=1e-5)
