"""Segmentation heads: per-pixel attention map, FPN mask head, CEM.

Rebuilds /root/reference/models/reftr_segmentation.py:
  * MHAttentionMap (:178-207) — per-head query->pixel attention that returns
    only the softmax map (no value product); softmax is taken JOINTLY over
    heads x pixels (the reference flattens dims 2.. before softmax),
  * MaskHeadSmallConv (:210-280) — 5 conv+GroupNorm(8) stages with 3 FPN
    adapters (backbone C3, C2, C1) and nearest upsampling; returns both the
    1-channel logits and the pre-output features (res_feat),
  * CEM (:16-41) — bilinear-compatibility energy loss between decoder REC
    features and mask-head RES features (--ablation cem_loss).

NHWC layout; nearest upsampling reproduces torch F.interpolate semantics
(src = floor(dst * in/out)).
"""

from __future__ import annotations

from typing import Any, List, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from reftr_tpu.nn.attention import NEG_INF


def nearest_resize(x: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """torch F.interpolate(mode='nearest') for NHWC: src = floor(dst*in/out)."""
    b, h, w, c = x.shape
    oh, ow = out_hw
    ys = jnp.floor(jnp.arange(oh) * (h / oh)).astype(jnp.int32)
    xs = jnp.floor(jnp.arange(ow) * (w / ow)).astype(jnp.int32)
    return x[:, ys][:, :, xs]


class MHAttentionMap(nn.Module):
    """q: [B, Q, D]; k: [B, h, w, D] feature map; img_valid: [B, h, w].

    Returns attention weights [B, Q, heads, h, w]."""

    hidden_dim: int
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q: jnp.ndarray, k: jnp.ndarray,
                 img_valid: jnp.ndarray | None = None) -> jnp.ndarray:
        d, nh = self.hidden_dim, self.num_heads
        dh = d // nh
        init = nn.initializers.xavier_uniform()
        q = nn.Dense(d, dtype=self.dtype, kernel_init=init,
                     bias_init=nn.initializers.zeros, name="q_linear")(q)
        k = nn.Dense(d, dtype=self.dtype, kernel_init=init,
                     bias_init=nn.initializers.zeros, name="k_linear")(k)
        b, nq, _ = q.shape
        _, h, w, _ = k.shape
        qh = q.reshape(b, nq, nh, dh) * (float(dh) ** -0.5)
        kh = k.reshape(b, h, w, nh, dh)
        logits = jnp.einsum("bqnc,bhwnc->bqnhw", qh, kh,
                            preferred_element_type=jnp.float32)
        if img_valid is not None:
            bias = jnp.where(img_valid[:, None, None, :, :], 0.0, NEG_INF)
            logits = logits + bias
        # softmax jointly over heads x pixels (reference flatten(2))
        flat = logits.reshape(b, nq, -1).astype(jnp.float32)
        weights = jax.nn.softmax(flat, axis=-1).reshape(b, nq, nh, h, w)
        return weights.astype(self.dtype)


class MaskHeadSmallConv(nn.Module):
    """x: [B*Q, h, w, 2D+heads] (projected+memory features tiled per query,
    concat with the attention maps); fpns: [C3, C2, C1] NHWC feature maps.

    Returns (logits [B*Q, 4h, 4w... up to C1 res, 1], res_feat)."""

    context_dim: int  # = hidden_dim
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 fpns: List[jnp.ndarray]) -> Tuple[jnp.ndarray, jnp.ndarray]:
        cd = self.context_dim
        dims = [x.shape[-1], cd // 2, cd // 4, cd // 8, cd // 16, cd // 64]
        # torch kaiming_uniform(a=1) on convs, zero bias
        init = nn.initializers.variance_scaling(
            2.0 / (1.0 + 1.0), "fan_in", "uniform")

        def conv(c, name, kernel=3):
            pad = (kernel - 1) // 2
            return nn.Conv(c, (kernel, kernel),
                           padding=((pad, pad), (pad, pad)),
                           kernel_init=init,
                           bias_init=nn.initializers.zeros,
                           dtype=self.dtype, name=name)

        def gn(name):
            return nn.GroupNorm(num_groups=8, epsilon=1e-5, dtype=self.dtype,
                                name=name)

        x = nn.relu(gn("gn1")(conv(dims[0], "lay1")(x)))
        x = nn.relu(gn("gn2")(conv(dims[1], "lay2")(x)))

        for i, (fpn, adapter_name, lay_name, gn_name, out_c) in enumerate([
            (fpns[0], "adapter1", "lay3", "gn3", dims[2]),
            (fpns[1], "adapter2", "lay4", "gn4", dims[3]),
            (fpns[2], "adapter3", "lay5", "gn5", dims[4]),
        ]):
            cur = conv(dims[i + 1], adapter_name, kernel=1)(fpn)
            if cur.shape[0] != x.shape[0]:  # tile over queries
                rep = x.shape[0] // cur.shape[0]
                cur = jnp.repeat(cur, rep, axis=0)
            x = cur + nearest_resize(x, cur.shape[1:3])
            x = nn.relu(gn(gn_name)(conv(out_c, lay_name)(x)))

        out = conv(1, "out_lay")(x)
        return out, x


class CEM(nn.Module):
    """Energy loss between REC decoder features and RES mask features
    (reftr_segmentation.py:16-41). rec: [B, P, Q, D]; res: [B, h, w, D//16].
    Returns a scalar loss."""

    hidden_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, rec_feat: jnp.ndarray,
                 res_feat: jnp.ndarray) -> jnp.ndarray:
        d = self.hidden_dim
        init = nn.initializers.xavier_uniform()
        dense = lambda c, name: nn.Dense(c, dtype=self.dtype,
                                         kernel_init=init, name=name)
        b = rec_feat.shape[0]
        rec = rec_feat.reshape(b, -1, d)  # [B, PQ, D]
        res = res_feat.reshape(b, -1, d // 16)  # [B, hw, D/16]

        es = jax.nn.softmax(dense(1, "c1")(rec).astype(jnp.float32), axis=-2)
        ec = jax.nn.softmax(dense(1, "c2")(res).astype(jnp.float32), axis=-2)

        rec_n = dense(d // 16, "c3")(rec)
        rec_n = rec_n / (jnp.linalg.norm(rec_n, axis=-1, keepdims=True) + 1e-12)
        res_n = res / (jnp.linalg.norm(res, axis=-1, keepdims=True) + 1e-12)

        tsc = jnp.einsum("bqc,bpc->bqp", rec_n, res_n,
                         preferred_element_type=jnp.float32)
        tsc = jnp.clip((tsc + 1.0) / 2.0, 1e-6, 1.0 - 1e-6)
        energy = jnp.einsum("bqo,bqp->bop", es, tsc)
        energy = jnp.einsum("bop,bpz->boz", energy, ec)
        return -1.0 * jnp.sum(jnp.log(energy + 1e-6)) / b
