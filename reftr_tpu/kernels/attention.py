"""Pallas TPU kernel: fused padding-masked multi-head attention.

The hot op of the VL encoder (self-attention over the concatenated
[lang; img] sequence, ~440-2100 tokens — reference transformer.py:151 via
cuDNN). One pallas_call fuses QK^T, mask bias, fp32 softmax, and PV into a
single VMEM-resident program per (batch*head, q-block) grid cell — no HBM
round-trips for the [Sq, Sk] score matrix.

Design notes (see /opt/skills/guides/pallas_guide.md):
  * grid (B*H, Sq/BQ); K/V for the whole sequence stay in VMEM per program
    (Sk*D + BQ*Sk fp32 comfortably fits for this model family's S <= ~4k;
    vmem_limit asserted below),
  * the padding mask enters as a precomputed f32 bias row per batch
    ([B, Sk], 0 or -1e9) so the kernel needs no bool handling,
  * logits/softmax in fp32 regardless of input dtype (bf16-safe),
  * backward pass = jax.custom_vjp that recomputes attention with plain XLA
    ops — fwd-serving speed with exact training gradients.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _attention_kernel(bias_ref, q_ref, k_ref, v_ref, o_ref, *, scale):
    q = q_ref[0]  # [BQ, D]
    k = k_ref[0]  # [Sk, D]
    v = v_ref[0]  # [Sk, D]
    bias = bias_ref[0]  # [1, Sk] f32
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # [BQ, Sk]
    logits = logits * scale + bias
    m = jnp.max(logits, axis=-1, keepdims=True)
    unnorm = jnp.exp(logits - m)
    denom = jnp.sum(unnorm, axis=-1, keepdims=True)
    weights = (unnorm / denom).astype(v.dtype)
    out = jax.lax.dot_general(
        weights, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype)


def _fwd(q, k, v, bias, *, block_q: int, interpret: bool):
    """q: [B, H, Sq, D]; k/v: [B, H, Sk, D]; bias: [B, Sk] f32."""
    b, h, sq, d = q.shape
    sk = k.shape[2]
    scale = 1.0 / (d ** 0.5)

    pad_q = (-sq) % block_q
    if pad_q:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad_q), (0, 0)))
    sq_p = sq + pad_q

    qr = q.reshape(b * h, sq_p, d)
    kr = k.reshape(b * h, sk, d)
    vr = v.reshape(b * h, sk, d)

    grid = (b * h, sq_p // block_q)
    out = pl.pallas_call(
        functools.partial(_attention_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, sk), lambda i, j: (i // h, 0, 0)),
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, sk, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, sk, d), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, sq_p, d), q.dtype),
        interpret=interpret,
    )(bias[:, None, :], qr, kr, vr)
    out = out.reshape(b, h, sq_p, d)
    return out[:, :, :sq]


def _xla_attention(q, k, v, bias):
    """Reference implementation (also the backward path)."""
    d = q.shape[-1]
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    logits = logits / (d ** 0.5) + bias[:, None, None, :]
    weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", weights.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _attention(q, k, v, bias, block_q, interpret):
    return _fwd(q, k, v, bias, block_q=block_q, interpret=interpret)


def _attention_fwd(q, k, v, bias, block_q, interpret):
    return _fwd(q, k, v, bias, block_q=block_q, interpret=interpret), \
        (q, k, v, bias)


def _attention_bwd(block_q, interpret, res, g):
    q, k, v, bias = res
    _, vjp = jax.vjp(_xla_attention, q, k, v, bias)
    return vjp(g)


_attention.defvjp(_attention_fwd, _attention_bwd)


def fused_attention(
    q: jnp.ndarray,  # [B, Sq, H, D] (the layout MultiHeadAttention uses)
    k: jnp.ndarray,  # [B, Sk, H, D]
    v: jnp.ndarray,
    valid_mask: Optional[jnp.ndarray] = None,  # [B, Sk] bool, True = keep
    block_q: int = 256,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Returns [B, Sq, H, D]."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, sq, h, d = q.shape
    sk = k.shape[1]
    if valid_mask is None:
        bias = jnp.zeros((b, sk), jnp.float32)
    else:
        bias = jnp.where(valid_mask, 0.0, NEG_INF).astype(jnp.float32)
    # the kernel computes in f32 (bf16 kernels trip Mosaic's broadcast
    # verifier on this jax version; f32 also matches the XLA path's
    # fp32-softmax numerics exactly). Cast back at the end.
    in_dtype = q.dtype
    qt = q.transpose(0, 2, 1, 3).astype(jnp.float32)
    kt = k.transpose(0, 2, 1, 3).astype(jnp.float32)
    vt = v.transpose(0, 2, 1, 3).astype(jnp.float32)
    block_q = min(block_q, max(8, sq))
    out = _attention(qt, kt, vt, bias, block_q, interpret)
    return out.transpose(0, 2, 1, 3).astype(in_dtype)
