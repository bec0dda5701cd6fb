"""2D sinusoidal position embedding, padding-aware.

Matches PositionEmbeddingSine (/root/reference/models/modeling/
position_encoding.py:20-56): cumulative sums over the *valid* region so
embeddings depend only on the real image extent, normalized to `scale`,
temperature-scaled sin/cos interleave, y-channels before x-channels.

Output layout is NHWC ([B, H, W, 2*num_pos_feats]) — the TPU-native layout —
where the reference returns NCHW.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def sine_position_embedding(
    valid_mask: jnp.ndarray,
    num_pos_feats: int = 128,
    temperature: float = 10000.0,
    normalize: bool = True,
    scale: float | None = None,
) -> jnp.ndarray:
    """valid_mask: [B, H, W] bool, True where the pixel is real (NOT padding).

    NOTE: the reference passes `not_mask` (mask=True means padding); here the
    argument is already the validity mask.
    Returns [B, H, W, 2*num_pos_feats] float32.
    """
    if scale is None:
        scale = 2.0 * math.pi
    not_mask = valid_mask.astype(jnp.float32)
    y_embed = jnp.cumsum(not_mask, axis=1)
    x_embed = jnp.cumsum(not_mask, axis=2)
    if normalize:
        eps = 1e-6
        y_embed = (y_embed - 0.5) / (y_embed[:, -1:, :] + eps) * scale
        x_embed = (x_embed - 0.5) / (x_embed[:, :, -1:] + eps) * scale

    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2.0 * jnp.floor(dim_t / 2.0) / num_pos_feats)

    pos_x = x_embed[:, :, :, None] / dim_t
    pos_y = y_embed[:, :, :, None] / dim_t
    # interleave: out[2k] = sin(v / dim_t[2k]), out[2k+1] = cos(v / dim_t[2k+1])
    pos_x = jnp.stack(
        [jnp.sin(pos_x[..., 0::2]), jnp.cos(pos_x[..., 1::2])], axis=4
    ).reshape(*pos_x.shape[:3], -1)
    pos_y = jnp.stack(
        [jnp.sin(pos_y[..., 0::2]), jnp.cos(pos_y[..., 1::2])], axis=4
    ).reshape(*pos_y.shape[:3], -1)
    return jnp.concatenate([pos_y, pos_x], axis=3)
