"""Small MLP heads.

`MLP` matches the DETR head used for bbox regression
(/root/reference/models/modeling/backbone.py:26-38): N linear layers with
ReLU between (none after the last).

`MLPMapping` matches `mlp_mapping` (/root/reference/models/
reftr_transformer.py:14-23): Linear -> LayerNorm -> ReLU -> Dropout ->
Linear -> LayerNorm -> ReLU, used to map BERT features to the VL width.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn


class MLP(nn.Module):
    hidden_dim: int
    output_dim: int
    num_layers: int
    dtype: Any = jnp.float32
    # reference zeroes the final layer of bbox_embed (reftr_transformer.py:131)
    final_zero_init: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i in range(self.num_layers):
            out = self.output_dim if i == self.num_layers - 1 else self.hidden_dim
            last = i == self.num_layers - 1
            init = (
                nn.initializers.zeros
                if (last and self.final_zero_init)
                else nn.initializers.xavier_uniform()
            )
            x = nn.Dense(out, dtype=self.dtype, kernel_init=init,
                         bias_init=nn.initializers.zeros, name=f"layers_{i}")(x)
            if not last:
                x = nn.relu(x)
        return x


class MLPMapping(nn.Module):
    output_dim: int
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        x = nn.Dense(self.output_dim, dtype=self.dtype, name="fc1",
                     kernel_init=nn.initializers.xavier_uniform(),
                     bias_init=nn.initializers.zeros)(x)
        x = nn.LayerNorm(dtype=self.dtype, name="ln1")(x)
        x = nn.relu(x)
        x = nn.Dropout(rate=self.dropout, deterministic=deterministic)(x)
        x = nn.Dense(self.output_dim, dtype=self.dtype, name="fc2",
                     kernel_init=nn.initializers.xavier_uniform(),
                     bias_init=nn.initializers.zeros)(x)
        x = nn.LayerNorm(dtype=self.dtype, name="ln2")(x)
        return nn.relu(x)
