"""Multi-head attention, batch-first, TPU-first.

Functionally equivalent to torch.nn.MultiheadAttention as used by the
reference transformer (/root/reference/models/modeling/transformer.py:151,
211-212): separate q/k/v inputs (for pos-embed-added queries/keys), a single
packed qkv projection, key-padding masking, attention-weight dropout, and an
output projection.

TPU-first choices:
  * batch-first [B, S, D] (the reference is seq-first),
  * logits and softmax computed in float32 regardless of compute dtype,
  * masking via a large negative bias instead of -inf masked_fill — fully
    masked rows produce finite garbage instead of NaN (such rows are always
    discarded downstream by phrase masks, and the reference asserts they
    cannot occur on live paths, models/reftr.py:93),
  * optionally dispatches to the Pallas fused kernel (reftr_tpu.kernels).

Parameter layout: q/k/v kernels are [D, D] right-multiplying (x @ W), i.e.
the transpose of torch's in_proj_weight rows; the converter handles this.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

NEG_INF = -1e9  # large negative, representable in bf16/fp32


class MultiHeadAttention(nn.Module):
    d_model: int
    num_heads: int
    dropout: float = 0.0
    dtype: Any = jnp.float32
    # True/False force the kernel; None = auto (Pallas on TPU for long
    # sequences, where it measures 1.6-2x faster than XLA attention; XLA
    # otherwise — see PERFORMANCE.md)
    use_pallas: Any = None
    # int8 serving path for the q/k/v/out projections (nn/quant.py);
    # sow_absmax records per-projection input absmax for calibration
    quantize: bool = False
    sow_absmax: bool = False

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,
        key: jnp.ndarray,
        value: jnp.ndarray,
        key_padding_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """query: [B, Sq, D]; key/value: [B, Sk, D].

        key_padding_mask: [B, Sk] bool, True = VALID key (note: this is the
        inverse of the torch convention; conversion happens at module edges).
        """
        d, h = self.d_model, self.num_heads
        dh = d // h
        assert d % h == 0, "d_model must be divisible by num_heads"

        if self.quantize:
            from reftr_tpu.nn.quant import QuantDense

            dense = lambda name: QuantDense(d, dtype=self.dtype, name=name)
        else:
            dense = lambda name: nn.Dense(d, dtype=self.dtype, name=name,
                                          kernel_init=nn.initializers.xavier_uniform(),
                                          bias_init=nn.initializers.zeros)
        if self.sow_absmax:
            for nm, x in (("q_proj", query), ("k_proj", key),
                          ("v_proj", value)):
                self.sow("calib", f"{nm}_in",
                         jnp.max(jnp.abs(x.astype(jnp.float32))),
                         init_fn=lambda: jnp.float32(0),
                         reduce_fn=jnp.maximum)
        q = dense("q_proj")(query)
        k = dense("k_proj")(key)
        v = dense("v_proj")(value)

        b, sq, _ = q.shape
        sk = k.shape[1]
        q = q.reshape(b, sq, h, dh)
        k = k.reshape(b, sk, h, dh)
        v = v.reshape(b, sk, h, dh)

        use_pallas = self.use_pallas
        # pallas_call is opaque to the SPMD partitioner, so under a
        # multi-device pjit it would be wrapped in all-gathers. When the
        # step builder installs the Mesh (parallel.context.use_mesh), the
        # kernel instead runs under shard_map — batch over 'data', heads
        # over 'model' (the Megatron activation layout), zero collectives.
        mesh = None
        if use_pallas is not False and jax.device_count() > 1:
            from reftr_tpu.kernels.attention import mesh_compatible
            from reftr_tpu.parallel.context import current_mesh

            mesh = current_mesh()
            if mesh is not None and not mesh_compatible(mesh, b, h):
                mesh = None
        if use_pallas is None:
            # auto: only where measured faster and safe; multi-device needs
            # the mesh (else the kernel would be all-gather-wrapped).
            # Where it wins (v5e, PERFORMANCE.md):
            #   * inference: Sk >= 1024 only (at S=440 XLA's materialized
            #     attention is fine and head_dim 32 wastes MXU lanes),
            #   * TRAINING: already at S~440 — the profile shows XLA's
            #     softmax/backward fusions over the materialized
            #     [B,H,S,S] logits at ~0.2% FLOPs util eating ~25% of the
            #     step; the flash kernels (with in-kernel dropout) take the
            #     flagship train step 180 -> 169 ms. Decoder queries are
            #     tiny (Sq = n_q), so gate on Sq too.
            use_pallas = (jax.default_backend() == "tpu"
                          and (jax.device_count() == 1 or mesh is not None)
                          and (k.shape[1] >= 1024
                               or (not deterministic and sq >= 256
                                   and k.shape[1] >= 256)))
        if use_pallas:
            from reftr_tpu.kernels.attention import (
                fused_attention,
                fused_attention_sharded,
            )

            kw = {}
            if self.dropout > 0 and not deterministic:
                # attention-weight dropout runs inside the kernel; the mask
                # is regenerated bit-identically in the backward kernels
                kw = dict(dropout_rate=self.dropout,
                          dropout_rng=self.make_rng("dropout"))
            if mesh is not None and jax.device_count() > 1:
                out = fused_attention_sharded(q, k, v, key_padding_mask,
                                              mesh, **kw)
            else:
                out = fused_attention(q, k, v, key_padding_mask, **kw)
        else:
            scale = 1.0 / jnp.sqrt(jnp.asarray(dh, jnp.float32))
            logits = jnp.einsum(
                "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
            ) * scale
            if key_padding_mask is not None:
                bias = jnp.where(key_padding_mask[:, None, None, :], 0.0, NEG_INF)
                logits = logits + bias
            weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            if self.dropout > 0 and not deterministic:
                weights = nn.Dropout(rate=self.dropout, deterministic=False,
                                     name="attn_dropout")(weights)
            out = jnp.einsum(
                "bhqk,bkhd->bqhd",
                weights.astype(v.dtype),
                v,
                preferred_element_type=jnp.float32,
            ).astype(self.dtype)

        out = out.reshape(b, sq, d)
        if self.sow_absmax:
            self.sow("calib", "out_proj_in",
                     jnp.max(jnp.abs(out.astype(jnp.float32))),
                     init_fn=lambda: jnp.float32(0),
                     reduce_fn=jnp.maximum)
        return dense("out_proj")(out)
