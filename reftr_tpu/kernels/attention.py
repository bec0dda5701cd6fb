"""Pallas TPU kernel: fused padding-masked multi-head flash attention.

The hot op of the VL encoder (self-attention over the concatenated
[lang; img] sequence, ~440 tokens at 1 feature level up to ~8.5k at 4 —
reference transformer.py:151 via cuDNN). Flash-attention structure: the
grid is (batch*heads, q-blocks, kv-blocks) with the kv axis innermost
("arbitrary" semantics), online-softmax running max/sum/accumulator kept in
VMEM scratch that persists across the kv sweep — VMEM use is bounded by the
block sizes regardless of sequence length (a single-shot variant OOMs the
16 MB VMEM at the 4-level config's S=8540).

Measured on v5e: 1.6-2.1x faster than XLA's attention for S >= 2048;
slower below (head_dim 32 wastes MXU lanes) — reftr_tpu.nn.attention
auto-selects accordingly.

Design notes (see /opt/skills/guides/pallas_guide.md):
  * padding enters as a precomputed f32 bias row per batch ([B, Sk], 0 or
    -1e9) so the kernel has no bool handling,
  * all kernel math in f32 (bf16 kernels trip Mosaic's broadcast verifier
    on this jax version; f32 also matches the XLA path's fp32 softmax),
  * backward pass = jax.custom_vjp recomputing attention with plain XLA
    ops — kernel-fast inference, exact training gradients.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _flash_kernel(bias_ref, q_ref, k_ref, v_ref, o_ref,
                  m_ref, l_ref, acc_ref, *, scale, n_kb):
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, -1e30)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0]  # [BQ, D] f32
    k = k_ref[0]  # [BK, D]
    v = v_ref[0]  # [BK, D]
    bias = bias_ref[0]  # [1, BK]
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale + bias  # [BQ, BK]

    m_prev = m_ref[...]
    m_new = jnp.maximum(m_prev, jnp.max(logits, axis=-1, keepdims=True))
    corr = jnp.exp(m_prev - m_new)
    p = jnp.exp(logits - m_new)
    l_ref[...] = l_ref[...] * corr + jnp.sum(p, axis=-1, keepdims=True)
    acc_ref[...] = acc_ref[...] * corr + jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    m_ref[...] = m_new

    @pl.when(kb == n_kb - 1)
    def _finalize():
        o_ref[0] = (acc_ref[...] / l_ref[...]).astype(o_ref.dtype)


def _fwd(q, k, v, bias, *, block_q: int, block_k: int, interpret: bool):
    """q: [B, H, Sq, D] f32; k/v: [B, H, Sk, D] f32; bias: [B, Sk] f32."""
    b, h, sq, d = q.shape
    sk = k.shape[2]
    scale = 1.0 / (d ** 0.5)

    block_q = min(block_q, max(8, sq))
    block_k = min(block_k, max(128, sk))
    pad_q = (-sq) % block_q
    pad_k = (-sk) % block_k
    if pad_q:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad_q), (0, 0)))
    if pad_k:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad_k), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad_k), (0, 0)))
        bias = jnp.pad(bias, ((0, 0), (0, pad_k)),
                       constant_values=NEG_INF)  # padded keys contribute 0
    sq_p, sk_p = sq + pad_q, sk + pad_k

    qr = q.reshape(b * h, sq_p, d)
    kr = k.reshape(b * h, sk_p, d)
    vr = v.reshape(b * h, sk_p, d)
    n_kb = sk_p // block_k

    grid = (b * h, sq_p // block_q, n_kb)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, n_kb=n_kb),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_k), lambda i, j, kb: (i // h, 0, kb)),
            pl.BlockSpec((1, block_q, d), lambda i, j, kb: (i, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda i, j, kb: (i, kb, 0)),
            pl.BlockSpec((1, block_k, d), lambda i, j, kb: (i, kb, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j, kb: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, sq_p, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),  # running max
            pltpu.VMEM((block_q, 1), jnp.float32),  # running denom
            pltpu.VMEM((block_q, d), jnp.float32),  # output accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _attention(q, k, v, bias, block_q, block_k, interpret):
    return _fwd(q, k, v, bias, block_q=block_q, block_k=block_k,
                interpret=interpret)


def _attention_fwd(q, k, v, bias, block_q, block_k, interpret):
    return _fwd(q, k, v, bias, block_q=block_q, block_k=block_k,
                interpret=interpret), (q, k, v, bias)


def _attention_bwd(block_q, block_k, interpret, res, g):
    q, k, v, bias = res
    _, vjp = jax.vjp(_xla_attention, q, k, v, bias)
    return vjp(g)


_attention.defvjp(_attention_fwd, _attention_bwd)


def fused_attention(
    q: jnp.ndarray,  # [B, Sq, H, D] (the layout MultiHeadAttention uses)
    k: jnp.ndarray,  # [B, Sk, H, D]
    v: jnp.ndarray,
    valid_mask: Optional[jnp.ndarray] = None,  # [B, Sk] bool, True = keep
    # swept on v5e at S=2048..8540: (512, 1024) is fastest with VMEM margin
    # (larger combos OOM the 16 MB VMEM; see PERFORMANCE.md)
    block_q: int = 512,
    block_k: int = 1024,
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
    in_dtype = q.dtype
    qt = q.transpose(0, 2, 1, 3).astype(jnp.float32)
    kt = k.transpose(0, 2, 1, 3).astype(jnp.float32)
    vt = v.transpose(0, 2, 1, 3).astype(jnp.float32)
    out = _attention(qt, kt, vt, bias, block_q, block_k, interpret)
    return out.transpose(0, 2, 1, 3).astype(in_dtype)
