"""DETR-style transformer encoder/decoder, batch-first.

Rebuilds the live classes of /root/reference/models/modeling/transformer.py
(TransformerEncoder/Layer :81-203, TransformerDecoder/Layer :105-288; the
top-level `Transformer` there is dead code and is not reproduced):

  * positional embeddings are added to q and k at EVERY layer
    (`with_pos_embed`),
  * pre-norm or post-norm residual blocks,
  * the decoder optionally returns the stack of per-layer outputs, each
    passed through the shared final LayerNorm, for auxiliary losses.

Masks use the validity convention (True = real token); the reference's
key_padding_mask (True = pad) is inverted at the model boundary.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from reftr_tpu.nn.attention import MultiHeadAttention

_ACTIVATIONS = {"relu": nn.relu, "gelu": nn.gelu, "glu": nn.glu}


def with_pos(x: jnp.ndarray, pos: Optional[jnp.ndarray]) -> jnp.ndarray:
    return x if pos is None else x + pos


class FFN(nn.Module):
    d_model: int
    dim_feedforward: int
    dropout: float
    activation: str
    dtype: Any
    # int8 serving path (nn/quant.py); sow_absmax = fp calibration pass
    quantize: bool = False
    sow_absmax: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        if self.quantize:
            from reftr_tpu.nn.quant import QuantDense

            dense = lambda f, name: QuantDense(f, dtype=self.dtype, name=name)
        else:
            init = nn.initializers.xavier_uniform()
            dense = lambda f, name: nn.Dense(
                f, dtype=self.dtype, kernel_init=init,
                bias_init=nn.initializers.zeros, name=name)

        def calib(name, v):
            if self.sow_absmax:
                self.sow("calib", name,
                         jnp.max(jnp.abs(v.astype(jnp.float32))),
                         init_fn=lambda: jnp.float32(0),
                         reduce_fn=jnp.maximum)

        calib("linear1_in", x)
        y = dense(self.dim_feedforward, "linear1")(x)
        y = _ACTIVATIONS[self.activation](y)
        y = nn.Dropout(rate=self.dropout, deterministic=deterministic)(y)
        calib("linear2_in", y)
        y = dense(self.d_model, "linear2")(y)
        return y


class TransformerEncoderLayer(nn.Module):
    d_model: int
    nhead: int
    dim_feedforward: int = 2048
    dropout: float = 0.1
    activation: str = "relu"
    normalize_before: bool = False
    dtype: Any = jnp.float32
    use_pallas: Any = None  # None = auto (see nn.attention)
    quantize: bool = False
    sow_absmax: bool = False

    @nn.compact
    def __call__(
        self,
        src: jnp.ndarray,
        pos: Optional[jnp.ndarray] = None,
        valid_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        attn = MultiHeadAttention(self.d_model, self.nhead, self.dropout,
                                  dtype=self.dtype, use_pallas=self.use_pallas,
                                  quantize=self.quantize,
                                  sow_absmax=self.sow_absmax,
                                  name="self_attn")
        ffn = FFN(self.d_model, self.dim_feedforward, self.dropout,
                  self.activation, self.dtype, quantize=self.quantize,
                  sow_absmax=self.sow_absmax, name="ffn")
        norm1 = nn.LayerNorm(dtype=self.dtype, name="norm1")
        norm2 = nn.LayerNorm(dtype=self.dtype, name="norm2")
        drop = lambda x: nn.Dropout(rate=self.dropout,
                                    deterministic=deterministic)(x)

        if self.normalize_before:
            s2 = norm1(src)
            qk = with_pos(s2, pos)
            src = src + drop(attn(qk, qk, s2, valid_mask, deterministic))
            s2 = norm2(src)
            src = src + drop(ffn(s2, deterministic))
            return src
        qk = with_pos(src, pos)
        src = src + drop(attn(qk, qk, src, valid_mask, deterministic))
        src = norm1(src)
        src = src + drop(ffn(src, deterministic))
        return norm2(src)


class TransformerEncoder(nn.Module):
    num_layers: int
    d_model: int
    nhead: int
    dim_feedforward: int = 2048
    dropout: float = 0.1
    activation: str = "relu"
    normalize_before: bool = False
    dtype: Any = jnp.float32
    use_pallas: Any = None  # None = auto (see nn.attention)
    remat: bool = False
    quantize: bool = False
    sow_absmax: bool = False

    @nn.compact
    def __call__(
        self,
        src: jnp.ndarray,
        pos: Optional[jnp.ndarray] = None,
        valid_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        layer_cls = TransformerEncoderLayer
        if self.remat:
            layer_cls = nn.remat(layer_cls, static_argnums=(4,))
        out = src
        for i in range(self.num_layers):
            out = layer_cls(
                self.d_model, self.nhead, self.dim_feedforward, self.dropout,
                self.activation, self.normalize_before, self.dtype,
                self.use_pallas, quantize=self.quantize,
                sow_absmax=self.sow_absmax, name=f"layers_{i}",
            )(out, pos, valid_mask, deterministic)
        if self.normalize_before:
            out = nn.LayerNorm(dtype=self.dtype, name="norm")(out)
        return out


class TransformerDecoderLayer(nn.Module):
    d_model: int
    nhead: int
    dim_feedforward: int = 2048
    dropout: float = 0.1
    activation: str = "relu"
    normalize_before: bool = False
    dtype: Any = jnp.float32
    use_pallas: Any = None  # None = auto (see nn.attention)
    quantize: bool = False
    sow_absmax: bool = False
    # cross-attention VALUES carry memory_pos too (from-scratch aid,
    # core/config.py::decoder_pos_in_value); default = reference parity
    # (pos in q/k only, transformer.py:86-96)
    pos_in_value: bool = False

    @nn.compact
    def __call__(
        self,
        tgt: jnp.ndarray,
        memory: jnp.ndarray,
        tgt_valid_mask: Optional[jnp.ndarray] = None,
        memory_valid_mask: Optional[jnp.ndarray] = None,
        pos: Optional[jnp.ndarray] = None,
        query_pos: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        mem_v = with_pos(memory, pos) if self.pos_in_value else memory
        self_attn = MultiHeadAttention(self.d_model, self.nhead, self.dropout,
                                       dtype=self.dtype,
                                       use_pallas=self.use_pallas,
                                       quantize=self.quantize,
                                       sow_absmax=self.sow_absmax,
                                       name="self_attn")
        cross_attn = MultiHeadAttention(self.d_model, self.nhead, self.dropout,
                                        dtype=self.dtype,
                                        use_pallas=self.use_pallas,
                                        quantize=self.quantize,
                                        sow_absmax=self.sow_absmax,
                                        name="multihead_attn")
        ffn = FFN(self.d_model, self.dim_feedforward, self.dropout,
                  self.activation, self.dtype, quantize=self.quantize,
                  sow_absmax=self.sow_absmax, name="ffn")
        norm1 = nn.LayerNorm(dtype=self.dtype, name="norm1")
        norm2 = nn.LayerNorm(dtype=self.dtype, name="norm2")
        norm3 = nn.LayerNorm(dtype=self.dtype, name="norm3")
        drop = lambda x: nn.Dropout(rate=self.dropout,
                                    deterministic=deterministic)(x)

        if self.normalize_before:
            t2 = norm1(tgt)
            qk = with_pos(t2, query_pos)
            tgt = tgt + drop(self_attn(qk, qk, t2, tgt_valid_mask, deterministic))
            t2 = norm2(tgt)
            tgt = tgt + drop(cross_attn(with_pos(t2, query_pos),
                                        with_pos(memory, pos), mem_v,
                                        memory_valid_mask, deterministic))
            t2 = norm3(tgt)
            return tgt + drop(ffn(t2, deterministic))
        qk = with_pos(tgt, query_pos)
        tgt = tgt + drop(self_attn(qk, qk, tgt, tgt_valid_mask, deterministic))
        tgt = norm1(tgt)
        tgt = tgt + drop(cross_attn(with_pos(tgt, query_pos),
                                    with_pos(memory, pos), mem_v,
                                    memory_valid_mask, deterministic))
        tgt = norm2(tgt)
        tgt = tgt + drop(ffn(tgt, deterministic))
        return norm3(tgt)


class TransformerDecoder(nn.Module):
    """Returns [L, B, Sq, D] when return_intermediate (each layer's output
    through the shared final norm, matching transformer.py:125-143), else
    [1, B, Sq, D]."""

    num_layers: int
    d_model: int
    nhead: int
    dim_feedforward: int = 2048
    dropout: float = 0.1
    activation: str = "relu"
    normalize_before: bool = False
    return_intermediate: bool = True
    dtype: Any = jnp.float32
    use_pallas: Any = None  # None = auto (see nn.attention)
    quantize: bool = False
    sow_absmax: bool = False
    pos_in_value: bool = False  # see TransformerDecoderLayer

    @nn.compact
    def __call__(
        self,
        tgt: jnp.ndarray,
        memory: jnp.ndarray,
        tgt_valid_mask: Optional[jnp.ndarray] = None,
        memory_valid_mask: Optional[jnp.ndarray] = None,
        pos: Optional[jnp.ndarray] = None,
        query_pos: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        norm = nn.LayerNorm(dtype=self.dtype, name="norm")
        out = tgt
        intermediate = []
        for i in range(self.num_layers):
            out = TransformerDecoderLayer(
                self.d_model, self.nhead, self.dim_feedforward, self.dropout,
                self.activation, self.normalize_before, self.dtype,
                self.use_pallas, quantize=self.quantize,
                sow_absmax=self.sow_absmax, pos_in_value=self.pos_in_value,
                name=f"layers_{i}",
            )(out, memory, tgt_valid_mask, memory_valid_mask, pos, query_pos,
              deterministic)
            if self.return_intermediate:
                intermediate.append(norm(out))
        if self.return_intermediate:
            return jnp.stack(intermediate, axis=0)
        return norm(out)[None]
