"""Image position embedding module: sine (default) or learned.

Wraps ops.posenc.sine_position_embedding and rebuilds
PositionEmbeddingLearned (/root/reference/models/modeling/
position_encoding.py:59-84): 50x50 learned row/col tables, concatenated
[col, row] along channels (x first, matching :80-83).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from reftr_tpu.ops.posenc import sine_position_embedding


class ImagePositionEmbedding(nn.Module):
    hidden_dim: int
    kind: str = "sine"  # 'sine' | 'learned'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, valid_mask: jnp.ndarray) -> jnp.ndarray:
        """valid_mask: [B, H, W] bool -> [B, H, W, hidden_dim]."""
        n = self.hidden_dim // 2
        if self.kind == "sine":
            return sine_position_embedding(valid_mask, n).astype(self.dtype)
        b, h, w = valid_mask.shape
        init = nn.initializers.uniform(scale=1.0)
        row = nn.Embed(50, n, embedding_init=init, dtype=self.dtype,
                       name="row_embed")(jnp.arange(h))  # [H, n]
        col = nn.Embed(50, n, embedding_init=init, dtype=self.dtype,
                       name="col_embed")(jnp.arange(w))  # [W, n]
        pos = jnp.concatenate([
            jnp.broadcast_to(col[None, :, :], (h, w, n)),
            jnp.broadcast_to(row[:, None, :], (h, w, n)),
        ], axis=-1)
        return jnp.broadcast_to(pos[None], (b, h, w, 2 * n))
