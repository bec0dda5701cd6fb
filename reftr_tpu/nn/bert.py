"""BERT / RoBERTa language backbone in Flax, batch-first.

Replaces the reference's HF torch BertModel/RobertaModel
(/root/reference/models/reftr_transformer.py:315-318). Only the pieces the
reference consumes are implemented: embeddings, the post-norm encoder stack,
and the tanh pooler — the model reads `(sequence_output, pooled_output)`
(reftr_transformer.py:200).

Structure and parameter names mirror HF so `reftr_tpu.nn.convert` can load
`bert-base-uncased` checkpoints mechanically. Differences from HF are
TPU-motivated only: validity masks (True = real token) with a -1e9 additive
bias instead of HF's (1-mask)*min additive mask, and fp32 softmax under bf16
compute — both produce identical masked-softmax results in practice.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from reftr_tpu.core.config import BertConfig
from reftr_tpu.nn.attention import MultiHeadAttention


class BertEmbeddings(nn.Module):
    config: BertConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids, token_type_ids=None, deterministic=True):
        c = self.config
        init = nn.initializers.normal(stddev=0.02)
        word = nn.Embed(c.vocab_size, c.hidden_size, embedding_init=init,
                        dtype=self.dtype, name="word_embeddings")(input_ids)
        if c.is_roberta:
            # RoBERTa offsets positions past pad_token_id and skips pads.
            mask = (input_ids != c.pad_token_id).astype(jnp.int32)
            position_ids = jnp.cumsum(mask, axis=1) * mask + c.pad_token_id
        else:
            position_ids = jnp.arange(input_ids.shape[1])[None, :]
        pos = nn.Embed(c.max_position_embeddings, c.hidden_size,
                       embedding_init=init, dtype=self.dtype,
                       name="position_embeddings")(position_ids)
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        tok = nn.Embed(c.type_vocab_size, c.hidden_size, embedding_init=init,
                       dtype=self.dtype, name="token_type_embeddings")(
            token_type_ids)
        x = word + pos + tok
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype,
                         name="LayerNorm")(x)
        return nn.Dropout(rate=c.hidden_dropout,
                          deterministic=deterministic)(x)


class BertLayer(nn.Module):
    config: BertConfig
    dtype: Any = jnp.float32
    # int8 serving path (nn/quant.py): attention projections and FFN run
    # on the int8 MXU; sow_absmax is the fp calibration pass
    quantize: bool = False
    sow_absmax: bool = False

    def _calib(self, name: str, x):
        if self.sow_absmax:
            self.sow("calib", name, jnp.max(jnp.abs(x.astype(jnp.float32))),
                     init_fn=lambda: jnp.float32(0), reduce_fn=jnp.maximum)

    @nn.compact
    def __call__(self, x, valid_mask=None, deterministic=True):
        c = self.config
        attn_out = MultiHeadAttention(
            c.hidden_size, c.num_attention_heads, c.attention_dropout,
            dtype=self.dtype, name="attention",
            quantize=self.quantize, sow_absmax=self.sow_absmax,
        )(x, x, x, valid_mask, deterministic)
        attn_out = nn.Dropout(rate=c.hidden_dropout,
                              deterministic=deterministic)(attn_out)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype,
                         name="attention_norm")(x + attn_out)
        if self.quantize:
            from reftr_tpu.nn.quant import QuantDense

            dense = lambda f, name: QuantDense(f, dtype=self.dtype, name=name)
        else:
            dense = lambda f, name: nn.Dense(
                f, dtype=self.dtype,
                kernel_init=nn.initializers.normal(0.02), name=name)
        self._calib("intermediate_in", x)
        y = dense(c.intermediate_size, "intermediate")(x)
        y = nn.gelu(y, approximate=False)
        self._calib("output_in", y)
        y = dense(c.hidden_size, "output")(y)
        y = nn.Dropout(rate=c.hidden_dropout, deterministic=deterministic)(y)
        return nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype,
                            name="output_norm")(x + y)


class BertModel(nn.Module):
    config: BertConfig
    dtype: Any = jnp.float32
    quantize: bool = False
    sow_absmax: bool = False

    @nn.compact
    def __call__(
        self,
        input_ids: jnp.ndarray,
        attention_mask: Optional[jnp.ndarray] = None,
        token_type_ids: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (sequence_output [B, S, H], pooled_output [B, H])."""
        c = self.config
        valid = None
        if attention_mask is not None:
            valid = attention_mask.astype(bool)
        x = BertEmbeddings(c, dtype=self.dtype, name="embeddings")(
            input_ids, token_type_ids, deterministic)
        for i in range(c.num_hidden_layers):
            x = BertLayer(c, dtype=self.dtype, name=f"layer_{i}",
                          quantize=self.quantize,
                          sow_absmax=self.sow_absmax)(
                x, valid, deterministic)
        pooled = nn.Dense(c.hidden_size, dtype=self.dtype,
                          kernel_init=nn.initializers.normal(0.02),
                          name="pooler")(x[:, 0])
        pooled = jnp.tanh(pooled)
        return x, pooled
