"""Golden test for the 2D sine position embedding against an in-test torch
implementation of the DETR formula (padding-aware cumsum, normalize=True)."""

import math

import numpy as np
import torch

from reftr_tpu.ops import sine_position_embedding


def torch_sine_pos(pad_mask, num_pos_feats=128, temperature=10000, scale=2 * math.pi):
    """pad_mask: [B, H, W] bool, True = padding (torch/DETR convention)."""
    mask = torch.from_numpy(pad_mask)
    not_mask = ~mask
    y_embed = not_mask.cumsum(1, dtype=torch.float32)
    x_embed = not_mask.cumsum(2, dtype=torch.float32)
    eps = 1e-6
    y_embed = (y_embed - 0.5) / (y_embed[:, -1:, :] + eps) * scale
    x_embed = (x_embed - 0.5) / (x_embed[:, :, -1:] + eps) * scale
    dim_t = torch.arange(num_pos_feats, dtype=torch.float32)
    dim_t = temperature ** (2 * torch.div(dim_t, 2, rounding_mode="floor") / num_pos_feats)
    pos_x = x_embed[:, :, :, None] / dim_t
    pos_y = y_embed[:, :, :, None] / dim_t
    pos_x = torch.stack(
        (pos_x[:, :, :, 0::2].sin(), pos_x[:, :, :, 1::2].cos()), dim=4
    ).flatten(3)
    pos_y = torch.stack(
        (pos_y[:, :, :, 0::2].sin(), pos_y[:, :, :, 1::2].cos()), dim=4
    ).flatten(3)
    pos = torch.cat((pos_y, pos_x), dim=3).permute(0, 3, 1, 2)
    return pos.numpy()  # NCHW


def test_sine_posenc_vs_torch(rng):
    B, H, W = 2, 13, 17
    pad = np.zeros((B, H, W), dtype=bool)
    pad[0, 9:, :] = True  # image 0 valid region 9x11
    pad[0, :, 11:] = True
    pad[1, 7:, :] = True  # image 1 valid region 7x17
    want = torch_sine_pos(pad)  # [B, C, H, W]
    got = np.asarray(sine_position_embedding(~pad, num_pos_feats=128))
    got_nchw = np.transpose(got, (0, 3, 1, 2))
    # Compare only valid pixels: at padded pixels the formula divides by ~1e-6
    # and takes sin/cos of ~1e6-magnitude args, where fp rounding differs
    # between frameworks. Those positions are masked out of attention in both
    # implementations, so their values are immaterial.
    valid = np.broadcast_to(~pad[:, None, :, :], want.shape)
    np.testing.assert_allclose(got_nchw[valid], want[valid], rtol=1e-5, atol=1e-5)


def test_sine_posenc_shape_and_dtype():
    valid = np.ones((1, 20, 20), dtype=bool)
    out = sine_position_embedding(valid, num_pos_feats=128)
    assert out.shape == (1, 20, 20, 256)
    assert str(out.dtype) == "float32"
