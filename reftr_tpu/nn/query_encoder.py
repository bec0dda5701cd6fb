"""Query encoder: builds decoder queries from encoder language memory.

Rebuilds QueryEncoder (/root/reference/models/reftr_transformer.py:26-66):
  * attended reduce over the encoded sentence — keys from the [CLS] slot,
    per-phrase -inf masking, softmax pooling, Linear+LN, residual from [CLS],
  * fuse with the per-phrase pooled BERT feature through a 2-layer MLP,
  * tile over n_q learned query embeddings of width 2*d and split into
    (query, query_pos).

Batch-first; the phrase loop of the reference is already vectorized there,
only the mask construction (done in the model) changes.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from reftr_tpu.nn.attention import NEG_INF
from reftr_tpu.nn.mlp import MLPMapping


class QueryEncoder(nn.Module):
    num_queries_per_phrase: int
    hidden_dim: int
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        lang_context_feat: jnp.ndarray,  # [B, S, D] encoder lang memory
        lang_query_feat: jnp.ndarray,  # [B, n_ph, D] pooled phrase feats
        context_valid: jnp.ndarray,  # [B, n_ph, S] bool, True = attendable
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        d = self.hidden_dim
        n_q = self.num_queries_per_phrase
        b, n_ph, _ = lang_query_feat.shape

        init = nn.initializers.xavier_uniform()
        dense = lambda name: nn.Dense(d, dtype=self.dtype, kernel_init=init,
                                      bias_init=nn.initializers.zeros,
                                      name=name)
        # attended reduce: CLS-keyed attention over the sentence
        k = dense("linear1")(lang_context_feat[:, 0:1, :])  # [B, 1, D]
        q = dense("linear2")(lang_context_feat)  # [B, S, D]
        v = dense("linear3")(lang_context_feat)  # [B, S, D]
        att = jnp.einsum("bod,bsd->bos", k, q,
                         preferred_element_type=jnp.float32)  # [B, 1, S]
        att = jnp.broadcast_to(att, (b, n_ph, att.shape[-1]))
        att = jnp.where(context_valid, att, NEG_INF)
        att = jax.nn.softmax(att.astype(jnp.float32), axis=-1)  # [B, n_ph, S]
        ctx = jnp.einsum("bps,bsd->bpd", att.astype(v.dtype), v,
                         preferred_element_type=jnp.float32).astype(self.dtype)
        ctx = nn.Dense(d, dtype=self.dtype, kernel_init=init,
                       bias_init=nn.initializers.zeros, name="context_fc")(ctx)
        ctx = nn.LayerNorm(dtype=self.dtype, name="context_ln")(ctx)
        # residual from the [CLS] memory slot
        ctx = lang_context_feat[:, None, 0, :] + ctx  # [B, n_ph, D]

        fused = jnp.concatenate([ctx, lang_query_feat], axis=-1)  # [B, n_ph, 2D]
        fused = MLPMapping(d, self.dropout, dtype=self.dtype,
                           name="fuse_encoder_query")(fused, deterministic)

        query_embed = self.param(
            "query_embed", nn.initializers.xavier_uniform(), (n_q, 2 * d))
        # duplicate the fused feature across both halves, add learned queries
        phrase_queries = (
            jnp.tile(fused[:, :, None, :], (1, 1, n_q, 2))
            + query_embed[None, None].astype(self.dtype)
        )  # [B, n_ph, n_q, 2D]
        phrase_queries = phrase_queries.reshape(b, n_ph * n_q, 2 * d)
        return phrase_queries[..., :d], phrase_queries[..., d:]
