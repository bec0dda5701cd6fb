"""Fused visual-linguistic transformer (encoder over [lang; img], decoder
over phrase queries).

Rebuilds VLTransformer (/root/reference/models/reftr.py:10-137):
  * learned language position embedding (max_lang_seq slots) and a 2-way
    token-type embedding (lang=0, img=1) (:22-23),
  * per-level `level_embed` added to the 2D sine position encoding (:26,60),
  * image levels flattened and concatenated after the language tokens
    (:99-120) — memory[:, :S_lang] is the language memory,
  * optional decoder (dec_layers <= 0 -> encoder-only).

Batch-first [B, S, D]; masks are validity masks (True = real token).
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from reftr_tpu.nn.transformer import TransformerDecoder, TransformerEncoder


class VLTransformer(nn.Module):
    d_model: int = 256
    nhead: int = 8
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    dim_feedforward: int = 2048
    dropout: float = 0.1
    activation: str = "relu"
    normalize_before: bool = False
    num_feature_levels: int = 1
    return_intermediate_dec: bool = True
    max_lang_seq: int = 128
    dtype: Any = jnp.float32
    use_pallas: Any = None  # None = auto (see nn.attention)
    remat: bool = False
    # int8 serving path for projections/FFNs (nn/quant.py)
    quantize: bool = False
    sow_absmax: bool = False
    pos_in_value: bool = False  # see nn/transformer.py decoder

    @property
    def use_decoder(self) -> bool:
        return self.num_decoder_layers > 0

    def setup(self):
        self.lang_pos_embeddings = nn.Embed(
            self.max_lang_seq, self.d_model,
            embedding_init=nn.initializers.xavier_uniform(),
            dtype=self.dtype, name="lang_pos_embeddings")
        self.token_type_embeddings = nn.Embed(
            2, self.d_model,
            embedding_init=nn.initializers.xavier_uniform(),
            dtype=self.dtype, name="token_type_embeddings")
        self.level_embed = self.param(
            "level_embed", nn.initializers.normal(1.0),
            (self.num_feature_levels, self.d_model))
        self.encoder = TransformerEncoder(
            self.num_encoder_layers, self.d_model, self.nhead,
            self.dim_feedforward, self.dropout, self.activation,
            self.normalize_before, self.dtype, self.use_pallas, self.remat,
            quantize=self.quantize, sow_absmax=self.sow_absmax,
            name="encoder")
        if self.use_decoder:
            self.decoder = TransformerDecoder(
                self.num_decoder_layers, self.d_model, self.nhead,
                self.dim_feedforward, self.dropout, self.activation,
                self.normalize_before, self.return_intermediate_dec,
                self.dtype, self.use_pallas, quantize=self.quantize,
                sow_absmax=self.sow_absmax, pos_in_value=self.pos_in_value,
                name="decoder")

    def process_img_feat(
        self,
        img_srcs: Sequence[jnp.ndarray],  # per level [B, h, w, D]
        img_valids: Sequence[jnp.ndarray],  # per level [B, h, w] bool
        img_pos: Sequence[jnp.ndarray],  # per level [B, h, w, D]
    ):
        srcs, valids, poss = [], [], []
        for lvl, (src, valid, pos) in enumerate(zip(img_srcs, img_valids, img_pos)):
            b, h, w, d = src.shape
            srcs.append(src.reshape(b, h * w, d))
            valids.append(valid.reshape(b, h * w))
            lvl_pos = pos.reshape(b, h * w, d) + self.level_embed[lvl][None, None].astype(self.dtype)
            poss.append(lvl_pos)
        src = jnp.concatenate(srcs, axis=1)
        valid = jnp.concatenate(valids, axis=1)
        pos = jnp.concatenate(poss, axis=1)
        # token type 1 = image
        tt = self.token_type_embeddings(
            jnp.ones(src.shape[:2], dtype=jnp.int32))
        return src, valid, pos + tt

    def process_lang_feat(self, lang_src: jnp.ndarray, lang_valid: jnp.ndarray):
        b, s, _ = lang_src.shape
        assert s <= self.max_lang_seq
        pos_ids = jnp.arange(s)[None, :]
        pos = self.lang_pos_embeddings(jnp.broadcast_to(pos_ids, (b, s)))
        tt = self.token_type_embeddings(jnp.zeros((b, s), dtype=jnp.int32))
        return lang_src, lang_valid.astype(bool), pos + tt

    def encode(
        self,
        img_srcs: Sequence[jnp.ndarray],
        img_valids: Sequence[jnp.ndarray],
        img_pos: Sequence[jnp.ndarray],
        lang_src: jnp.ndarray,
        lang_valid: jnp.ndarray,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Returns (memory [B, S_lang+S_img, D], valid, pos)."""
        i_src, i_valid, i_pos = self.process_img_feat(img_srcs, img_valids, img_pos)
        l_src, l_valid, l_pos = self.process_lang_feat(lang_src, lang_valid)
        src = jnp.concatenate([l_src, i_src], axis=1)
        valid = jnp.concatenate([l_valid, i_valid], axis=1)
        pos = jnp.concatenate([l_pos, i_pos], axis=1)
        memory = self.encoder(src, pos, valid, deterministic)
        return memory, valid, pos

    def decode(
        self,
        query: jnp.ndarray,
        query_pos: jnp.ndarray,
        query_valid: jnp.ndarray,
        memory: jnp.ndarray,
        memory_valid: jnp.ndarray,
        memory_pos: jnp.ndarray,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """Returns [L, B, n_queries, D] decoder intermediate stack."""
        return self.decoder(query, memory, query_valid, memory_valid,
                            memory_pos, query_pos, deterministic)

    def __call__(self, img_srcs, img_valids, img_pos, lang_src, lang_valid,
                 query=None, query_pos=None, query_valid=None,
                 deterministic: bool = True):
        memory, valid, pos = self.encode(
            img_srcs, img_valids, img_pos, lang_src, lang_valid, deterministic)
        if self.use_decoder and query is not None:
            return self.decode(query, query_pos, query_valid, memory, valid,
                               pos, deterministic)
        return memory[None]
