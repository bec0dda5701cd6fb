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
  * q/k/v (and the backward's do/o residuals) travel to the kernels in
    the CALLER's dtype — bf16 in production — and are upcast to f32 per
    block in VMEM (round 5: the previous whole-array HBM f32
    materialization doubled the memory-bound kernel's input traffic and
    residual footprint for nothing; bf16->f32 is exact so numerics are
    unchanged),
  * softmax/statistics math in f32 (full-bf16 kernels trip Mosaic's
    broadcast verifier on this jax version; f32 stats also match the XLA
    path's fp32 softmax). Dot INPUTS optionally cast to bf16 (mxu_bf16) —
    f32 matmuls run at half the MXU's bf16 rate, and the XLA path's
    operands are bf16 anyway (round-5 serving experiment),
  * backward pass = flash-2 style Pallas kernels (dq with a kv sweep,
    dk/dv with a q sweep, p recomputed from the forward's logsumexp), so
    TRAINING at the 4-level S=8540 config stays within HBM — the XLA
    recompute VJP it replaces materializes f32[B,H,S,S] and OOMs there.
    The logsumexp rows are stored replicated across a 128-lane minor dim
    (the standard Mosaic layout for per-row stats; avoids in-kernel
    transposes).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


LSE_LANES = 128  # per-row stats replicated across the minor dim


def _dropout_keep(shape, rate, inv_keep):
    """Per-tile dropout multiplier: inv_keep where kept, 0 where dropped.

    Caller must have seeded the PRNG with the tile's absolute
    (batch*head, q-tile, k-tile) coordinates so forward and backward
    regenerate the identical mask.
    """
    bits = jax.lax.bitcast_convert_type(
        pltpu.prng_random_bits(shape), jnp.int32)
    # logical shift to 23 bits (Mosaic has no uint32->f32 cast)
    u = jax.lax.shift_right_logical(bits, 9).astype(jnp.float32) * (2.0 ** -23)
    return jnp.where(u >= rate, inv_keep, 0.0)  # uniform [0, 1) vs rate


def _mxu(x, bf16: bool):
    """Normalize a dot operand's dtype at the point of use, inside VMEM.

    Default (bf16=False): f32 operands. Tensor tiles arrive in the
    CALLER's dtype (bf16 in production — round 5 removed the pre-kernel
    HBM f32 materialization, halving the kernel's input DMA traffic and
    its saved-residual footprint) and are upcast per block here; bf16->f32
    is exact, so numerics are unchanged vs the old whole-array upcast.

    mxu_bf16=True: bf16 operands — f32 matmuls issue at half the MXU's
    bf16 peak on v5e. Accumulation stays f32 via preferred_element_type;
    softmax/statistics math stays f32 throughout — this only quantizes
    the dot INPUTS (the f32 softmax probabilities and ds), the same
    numerics class as the XLA path whose activations are already bf16."""
    return x.astype(jnp.bfloat16 if bf16 else jnp.float32)


def _flash_kernel(seed_ref, bias_ref, q_ref, k_ref, v_ref, o_ref, lse_ref,
                  m_ref, l_ref, acc_ref, *, scale, n_qb, n_kb,
                  dropout_rate, head_group, mxu_bf16=False):
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, -1e30)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    bias = bias_ref[0]  # [1, BK], shared by all heads in the group
    for hh in range(head_group):  # unrolled; amortizes grid/DMA overhead
        q = q_ref[hh]  # [BQ, D], caller dtype (dots normalize via _mxu)
        k = k_ref[hh]  # [BK, D]
        v = v_ref[hh]  # [BK, D]
        logits = jax.lax.dot_general(
            _mxu(q, mxu_bf16), _mxu(k, mxu_bf16), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale + bias  # [BQ, BK]

        m_prev = m_ref[hh]
        m_new = jnp.maximum(m_prev, jnp.max(logits, axis=-1, keepdims=True))
        corr = jnp.exp(m_prev - m_new)
        p = jnp.exp(logits - m_new)
        # softmax denominator over UN-dropped p (torch drops after
        # normalizing)
        l_ref[hh] = l_ref[hh] * corr + jnp.sum(p, axis=-1, keepdims=True)
        if dropout_rate > 0.0:
            # Mosaic allows at most 2 seed words: pack the tile coordinates
            # (same formula in all three kernels so the masks line up; the
            # head index folds in so any head_group draws the same masks)
            tile = ((pl.program_id(0) * head_group + hh) * n_qb
                    + pl.program_id(1)) * n_kb + kb
            pltpu.prng_seed(seed_ref[0, 0], tile)
            p = p * _dropout_keep(p.shape, dropout_rate,
                                  1.0 / (1.0 - dropout_rate))
        acc_ref[hh] = acc_ref[hh] * corr + jax.lax.dot_general(
            _mxu(p, mxu_bf16), _mxu(v, mxu_bf16), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_ref[hh] = m_new

    @pl.when(kb == n_kb - 1)
    def _finalize():
        o_ref[...] = (acc_ref[...] / l_ref[...]).astype(o_ref.dtype)
        if lse_ref is not None:
            lse_ref[...] = jnp.broadcast_to(
                m_ref[...] + jnp.log(l_ref[...]), lse_ref.shape)


def _fwd(q, k, v, bias, *, block_q: int, block_k: int, interpret: bool,
         return_lse: bool = False, dropout_rate: float = 0.0, seed=None,
         head_group: int = 1, mxu_bf16: bool = False):
    """q: [B, H, Sq, D]; k/v: [B, H, Sk, D] (caller dtype — bf16 in
    production, upcast per block inside the kernel); bias: [B, Sk] f32.

    With return_lse, additionally returns the row logsumexp as
    [B*H, Sq, LSE_LANES] f32 (value replicated across the lane dim).
    With dropout_rate > 0, seed is a traced int32 [1, 1] that (together
    with the tile coordinates) keys the attention-weight dropout mask.
    head_group G > 1 processes G consecutive heads per grid step ([G, BQ,
    D] tiles, in-kernel unrolled loop): same MXU work, G-times fewer grid
    steps and G-times larger DMA transfers — the experiment for small
    head_dim (32 fills 1/4 of the 128 MXU lanes; per-step overhead is the
    recoverable part). Requires G | H; dropout masks are bit-identical
    across G (the PRNG is seeded per absolute head).
    """
    b, h, sq, d = q.shape
    sk = k.shape[2]
    scale = 1.0 / (d ** 0.5)
    g = head_group if h % head_group == 0 else 1

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

    grid = (b * h // g, sq_p // block_q, n_kb)
    out_shape = [jax.ShapeDtypeStruct((b * h, sq_p, d), q.dtype)]
    out_specs = [pl.BlockSpec((g, block_q, d), lambda i, j, kb: (i, j, 0))]
    if return_lse:
        out_shape.append(
            jax.ShapeDtypeStruct((b * h, sq_p, LSE_LANES), jnp.float32))
        out_specs.append(
            pl.BlockSpec((g, block_q, LSE_LANES), lambda i, j, kb: (i, j, 0)))
    _k = functools.partial(_flash_kernel, scale=scale,
                           n_qb=sq_p // block_q, n_kb=n_kb,
                           dropout_rate=dropout_rate, head_group=g,
                           mxu_bf16=mxu_bf16)
    hg = h // g  # head-groups per batch element (g | h, so bias is
    #              constant within a group)
    in_specs = [
        pl.BlockSpec((1, 1, block_k), lambda i, j, kb: (i // hg, 0, kb)),
        pl.BlockSpec((g, block_q, d), lambda i, j, kb: (i, j, 0)),
        pl.BlockSpec((g, block_k, d), lambda i, j, kb: (i, kb, 0)),
        pl.BlockSpec((g, block_k, d), lambda i, j, kb: (i, kb, 0)),
    ]
    inputs = [bias[:, None, :], qr, kr, vr]
    if dropout_rate > 0.0:
        in_specs.insert(0, pl.BlockSpec(memory_space=pltpu.SMEM))
        inputs.insert(0, seed)
        kernel = _k if return_lse else (
            lambda s, bias, q, k, v, o, m, l, acc:
            _k(s, bias, q, k, v, o, None, m, l, acc))
    else:
        # splice in the refs pallas_call does not pass (seed / lse out)
        if return_lse:
            def kernel(bias, q, k, v, o, lse, m, l, acc):
                _k(None, bias, q, k, v, o, lse, m, l, acc)
        else:
            def kernel(bias, q, k, v, o, m, l, acc):
                _k(None, bias, q, k, v, o, None, m, l, acc)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((g, block_q, 1), jnp.float32),  # running max
            pltpu.VMEM((g, block_q, 1), jnp.float32),  # running denom
            pltpu.VMEM((g, block_q, d), jnp.float32),  # output accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(*inputs)
    out = outs[0].reshape(b, h, sq_p, d)[:, :, :sq]
    if return_lse:
        return out, outs[1][:, :sq]
    return out


def _xla_attention(q, k, v, bias):
    """Reference implementation (testing oracle)."""
    d = q.shape[-1]
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    logits = logits / (d ** 0.5) + bias[:, None, None, :]
    weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", weights.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def _bwd_dq_kernel(seed_ref, bias_ref, q_ref, k_ref, v_ref, do_ref, o_ref,
                   lse_ref, dq_ref, dq_acc, di_ref, *, scale, n_qb, n_kb,
                   dropout_rate, head_group, mxu_bf16=False):
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _init():
        dq_acc[...] = jnp.zeros_like(dq_acc)
        # di_i = sum_d do_id * o_id (flash-2's rowsum(dO*O) = dL/dlse trick)
        di_ref[...] = jnp.sum(do_ref[...].astype(jnp.float32)
                              * o_ref[...].astype(jnp.float32), axis=-1,
                              keepdims=True)

    bias = bias_ref[0]  # [1, BK]
    for hh in range(head_group):
        q = q_ref[hh]   # [BQ, D]
        k = k_ref[hh]   # [BK, D]
        v = v_ref[hh]   # [BK, D]
        do = do_ref[hh]
        # lanes are replicas of the same row value; max collapses to [BQ, 1]
        lse = jnp.max(lse_ref[hh], axis=-1, keepdims=True)
        s = jax.lax.dot_general(
            _mxu(q, mxu_bf16), _mxu(k, mxu_bf16), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale + bias  # [BQ, BK]
        p = jnp.exp(s - lse)
        dp = jax.lax.dot_general(
            _mxu(do, mxu_bf16), _mxu(v, mxu_bf16), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # [BQ, BK]
        if dropout_rate > 0.0:
            # regenerate the forward's mask for this exact tile
            tile = ((pl.program_id(0) * head_group + hh) * n_qb
                    + pl.program_id(1)) * n_kb + kb
            pltpu.prng_seed(seed_ref[0, 0], tile)
            dp = dp * _dropout_keep(dp.shape, dropout_rate,
                                    1.0 / (1.0 - dropout_rate))
        ds = p * (dp - di_ref[hh])
        dq_acc[hh] += jax.lax.dot_general(
            _mxu(ds, mxu_bf16), _mxu(k, mxu_bf16), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(kb == n_kb - 1)
    def _finalize():
        dq_ref[...] = (dq_acc[...] * scale).astype(dq_ref.dtype)


def _bwd_dkv_kernel(seed_ref, bias_ref, q_ref, k_ref, v_ref, do_ref, o_ref,
                    lse_ref, dk_ref, dv_ref, dk_acc, dv_acc, *, scale, n_qb,
                    n_kb, dropout_rate, head_group, mxu_bf16=False):
    qb = pl.program_id(2)

    @pl.when(qb == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    bias = bias_ref[0]  # [1, BK]
    for hh in range(head_group):
        q = q_ref[hh]   # [BQ, D]
        k = k_ref[hh]   # [BK, D]
        v = v_ref[hh]
        do = do_ref[hh]
        lse = jnp.max(lse_ref[hh], axis=-1, keepdims=True)  # [BQ, 1]
        s = jax.lax.dot_general(
            _mxu(q, mxu_bf16), _mxu(k, mxu_bf16), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale + bias  # [BQ, BK]
        p = jnp.exp(s - lse)
        if dropout_rate > 0.0:
            # tile coords here are (i, kb=program_id(1), qb=program_id(2)):
            # pack in (head, q-tile, k-tile) order to match the forward/dq
            # kernels
            tile = ((pl.program_id(0) * head_group + hh) * n_qb
                    + qb) * n_kb + pl.program_id(1)
            pltpu.prng_seed(seed_ref[0, 0], tile)
            keep = _dropout_keep(p.shape, dropout_rate,
                                 1.0 / (1.0 - dropout_rate))
        else:
            keep = None
        dv_acc[hh] += jax.lax.dot_general(
            _mxu(p if keep is None else p * keep, mxu_bf16),
            _mxu(do, mxu_bf16), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # [BK, D]
        di = jnp.sum(do.astype(jnp.float32)
                     * o_ref[hh].astype(jnp.float32),
                     axis=-1, keepdims=True)  # [BQ, 1]
        dp = jax.lax.dot_general(
            _mxu(do, mxu_bf16), _mxu(v, mxu_bf16), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # [BQ, BK]
        if keep is not None:
            dp = dp * keep
        ds = p * (dp - di)
        dk_acc[hh] += jax.lax.dot_general(
            _mxu(ds, mxu_bf16), _mxu(q, mxu_bf16), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(qb == n_qb - 1)
    def _finalize():
        dk_ref[...] = (dk_acc[...] * scale).astype(dk_ref.dtype)
        dv_ref[...] = dv_acc[...].astype(dv_ref.dtype)


def _bwd(q, k, v, bias, o, lse, do, *, block_q: int, block_k: int,
         interpret: bool, dropout_rate: float = 0.0, seed=None,
         head_group: int = 1, mxu_bf16: bool = False):
    """Flash-2 backward. All of q/do/o: [B,H,Sq,D]; k/v: [B,H,Sk,D]
    (caller dtype, upcast per block in-kernel); bias: [B,Sk] f32;
    lse: [B*H, Sq, LSE_LANES] f32. Returns (dq, dk, dv) in caller dtype.
    """
    b, h, sq, d = q.shape
    sk = k.shape[2]
    scale = 1.0 / (d ** 0.5)
    g = head_group if h % head_group == 0 else 1
    hg = h // g

    block_q = min(block_q, max(8, sq))
    block_k = min(block_k, max(128, sk))
    pad_q = (-sq) % block_q
    pad_k = (-sk) % block_k
    if pad_q:
        padq = ((0, 0), (0, 0), (0, pad_q), (0, 0))
        q, do, o = (jnp.pad(t, padq) for t in (q, do, o))
        # exp(s - 1e30) == 0: padded q rows produce exactly-zero p and ds,
        # so they contribute nothing to dk/dv (do rows are zero too).
        lse = jnp.pad(lse, ((0, 0), (0, pad_q), (0, 0)),
                      constant_values=1e30)
    if pad_k:
        padk = ((0, 0), (0, 0), (0, pad_k), (0, 0))
        k, v = (jnp.pad(t, padk) for t in (k, v))
        bias = jnp.pad(bias, ((0, 0), (0, pad_k)), constant_values=NEG_INF)
    sq_p, sk_p = sq + pad_q, sk + pad_k

    qr = q.reshape(b * h, sq_p, d)
    kr = k.reshape(b * h, sk_p, d)
    vr = v.reshape(b * h, sk_p, d)
    dor = do.reshape(b * h, sq_p, d)
    orr = o.reshape(b * h, sq_p, d)
    biasr = bias[:, None, :]
    n_qb = sq_p // block_q
    n_kb = sk_p // block_k
    params = pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel", "arbitrary"))

    dq_in_specs = [
        pl.BlockSpec((1, 1, block_k), lambda i, j, kb: (i // hg, 0, kb)),
        pl.BlockSpec((g, block_q, d), lambda i, j, kb: (i, j, 0)),
        pl.BlockSpec((g, block_k, d), lambda i, j, kb: (i, kb, 0)),
        pl.BlockSpec((g, block_k, d), lambda i, j, kb: (i, kb, 0)),
        pl.BlockSpec((g, block_q, d), lambda i, j, kb: (i, j, 0)),
        pl.BlockSpec((g, block_q, d), lambda i, j, kb: (i, j, 0)),
        pl.BlockSpec((g, block_q, LSE_LANES), lambda i, j, kb: (i, j, 0)),
    ]
    dkv_in_specs = [
        pl.BlockSpec((1, 1, block_k), lambda i, j, qb: (i // hg, 0, j)),
        pl.BlockSpec((g, block_q, d), lambda i, j, qb: (i, qb, 0)),
        pl.BlockSpec((g, block_k, d), lambda i, j, qb: (i, j, 0)),
        pl.BlockSpec((g, block_k, d), lambda i, j, qb: (i, j, 0)),
        pl.BlockSpec((g, block_q, d), lambda i, j, qb: (i, qb, 0)),
        pl.BlockSpec((g, block_q, d), lambda i, j, qb: (i, qb, 0)),
        pl.BlockSpec((g, block_q, LSE_LANES), lambda i, j, qb: (i, qb, 0)),
    ]
    dq_inputs = [biasr, qr, kr, vr, dor, orr, lse]
    dkv_inputs = list(dq_inputs)
    dq_kernel = functools.partial(_bwd_dq_kernel, scale=scale, n_qb=n_qb,
                                  n_kb=n_kb, dropout_rate=dropout_rate,
                                  head_group=g, mxu_bf16=mxu_bf16)
    dkv_kernel = functools.partial(_bwd_dkv_kernel, scale=scale, n_qb=n_qb,
                                   n_kb=n_kb, dropout_rate=dropout_rate,
                                   head_group=g, mxu_bf16=mxu_bf16)
    if dropout_rate > 0.0:
        smem = pl.BlockSpec(memory_space=pltpu.SMEM)
        dq_in_specs.insert(0, smem)
        dkv_in_specs.insert(0, smem)
        dq_inputs.insert(0, seed)
        dkv_inputs.insert(0, seed)
    else:
        _dq, _dkv = dq_kernel, dkv_kernel
        dq_kernel = lambda *refs: _dq(None, *refs)
        dkv_kernel = lambda *refs: _dkv(None, *refs)

    dq = pl.pallas_call(
        dq_kernel,
        grid=(b * h // g, n_qb, n_kb),
        in_specs=dq_in_specs,
        out_specs=pl.BlockSpec((g, block_q, d), lambda i, j, kb: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, sq_p, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((g, block_q, d), jnp.float32),  # dq accumulator
            pltpu.VMEM((g, block_q, 1), jnp.float32),  # di rows
        ],
        compiler_params=params,
        interpret=interpret,
    )(*dq_inputs)

    dk, dv = pl.pallas_call(
        dkv_kernel,
        grid=(b * h // g, n_kb, n_qb),
        in_specs=dkv_in_specs,
        out_specs=[
            pl.BlockSpec((g, block_k, d), lambda i, j, qb: (i, j, 0)),
            pl.BlockSpec((g, block_k, d), lambda i, j, qb: (i, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, sk_p, d), k.dtype),
            jax.ShapeDtypeStruct((b * h, sk_p, d), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((g, block_k, d), jnp.float32),  # dk accumulator
            pltpu.VMEM((g, block_k, d), jnp.float32),  # dv accumulator
        ],
        compiler_params=params,
        interpret=interpret,
    )(*dkv_inputs)

    dq = dq.reshape(b, h, sq_p, d)[:, :, :sq]
    dk = dk.reshape(b, h, sk_p, d)[:, :, :sk]
    dv = dv.reshape(b, h, sk_p, d)[:, :, :sk]
    return dq, dk, dv


# backward blocks are smaller than forward's (512, 1024): the bwd kernels
# hold ~4 [BQ, BK] f32 temporaries (s, p, dp, ds) at once
BWD_BLOCK_Q = 256
BWD_BLOCK_K = 512


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10))
def _attention(q, k, v, bias, seed, block_q, block_k, interpret,
               dropout_rate, head_group, mxu_bf16):
    return _fwd(q, k, v, bias, block_q=block_q, block_k=block_k,
                interpret=interpret, dropout_rate=dropout_rate, seed=seed,
                head_group=head_group, mxu_bf16=mxu_bf16)


def _attention_fwd(q, k, v, bias, seed, block_q, block_k, interpret,
                   dropout_rate, head_group, mxu_bf16):
    if dropout_rate > 0.0:
        # dropout masks are keyed by tile coordinates: forward and backward
        # must tile identically, so run the forward at the backward blocks
        block_q = min(block_q, BWD_BLOCK_Q)
        block_k = min(block_k, BWD_BLOCK_K)
    out, lse = _fwd(q, k, v, bias, block_q=block_q, block_k=block_k,
                    interpret=interpret, return_lse=True,
                    dropout_rate=dropout_rate, seed=seed,
                    head_group=head_group, mxu_bf16=mxu_bf16)
    return out, (q, k, v, bias, seed, out, lse)


def _attention_bwd(block_q, block_k, interpret, dropout_rate, head_group,
                   mxu_bf16, res, g):
    q, k, v, bias, seed, o, lse = res
    dq, dk, dv = _bwd(q, k, v, bias, o, lse, g,
                      block_q=min(block_q, BWD_BLOCK_Q),
                      block_k=min(block_k, BWD_BLOCK_K),
                      interpret=interpret, dropout_rate=dropout_rate,
                      seed=seed, head_group=head_group, mxu_bf16=mxu_bf16)
    # bias is derived from a boolean validity mask (jnp.where on bools), so
    # its cotangent can never reach a trainable leaf; skip computing it.
    # seed is integer-typed: no cotangent.
    return dq, dk, dv, jnp.zeros_like(bias), None


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
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jnp.ndarray] = None,  # PRNG key, required if rate>0
    # heads processed per grid step (must divide H, else falls back to 1):
    # amortizes grid/DMA overhead when head_dim is small; numerics and
    # dropout masks are bit-identical across values — see _fwd. Measured
    # on v5e at D=32 (PERFORMANCE.md "Head-packed kernel"): g=2 is +3-4%
    # fwd (S=2048/8540) and +7-8% fwd+bwd over g=1; g>=4 OOMs VMEM at the
    # production (512, 1024) blocks, hence 2 as the default.
    head_group: int = 2,
    # bf16 dot INPUTS inside the kernel (f32 accumulate + f32 softmax
    # stats) — f32 matmuls issue at half the MXU's bf16 rate on v5e, so
    # this doubles the kernel's MXU throughput at the numerics class the
    # bf16 XLA path already has. See PERFORMANCE.md round 5.
    mxu_bf16: bool = False,
) -> jnp.ndarray:
    """Returns [B, Sq, H, D].

    dropout_rate > 0 applies attention-weight dropout inside the kernel
    (mask regenerated bit-identically in the backward kernels), matching
    torch.nn.MultiheadAttention(dropout=...) in train mode — the softmax
    denominator is computed before dropping, reference transformer.py:151.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if interpret and dropout_rate > 0.0:
        raise NotImplementedError(
            "kernel dropout needs the TPU PRNG; interpret mode (CPU) has "
            "no use for the pallas path — use the XLA attention instead")
    if head_group < 1:
        raise ValueError(f"head_group must be >= 1, got {head_group}")
    b, sq, h, d = q.shape
    sk = k.shape[1]
    if valid_mask is None:
        bias = jnp.zeros((b, sk), jnp.float32)
    else:
        bias = jnp.where(valid_mask, 0.0, NEG_INF).astype(jnp.float32)
    if dropout_rate > 0.0:
        assert dropout_rng is not None, "dropout_rate > 0 needs dropout_rng"
        # accept both raw uint32 key arrays (flax make_rng) and typed keys
        words = (dropout_rng if dropout_rng.dtype == jnp.uint32
                 else jax.random.key_data(dropout_rng))
        words = words.reshape(-1)
        seed = ((words[0] ^ words[-1]) & jnp.uint32(0x7FFFFFFF)
                ).astype(jnp.int32).reshape(1, 1)
    else:
        seed = jnp.zeros((1, 1), jnp.int32)
    # q/k/v stay in the caller's dtype all the way into the kernels (the
    # per-block upcast to f32 happens in VMEM, see _mxu): at bf16 this
    # halves the kernel's HBM input traffic and the residuals saved for
    # the backward, with identical numerics (bf16->f32 is exact, and the
    # old post-kernel astype(in_dtype) rounded out/dq/dk/dv to the caller
    # dtype at the same points the kernels now write them).
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    out = _attention(qt, kt, vt, bias, seed, block_q, block_k, interpret,
                     float(dropout_rate), int(head_group), bool(mxu_bf16))
    return out.transpose(0, 2, 1, 3)


def mesh_compatible(mesh, batch: int, heads: int,
                    data_axis: str = "data",
                    model_axis: str = "model") -> bool:
    """True iff fused_attention_sharded can run on this mesh: the axes
    exist, batch divides over 'data' and heads over 'model'."""
    names = set(mesh.axis_names)
    if not {data_axis, model_axis} <= names:
        return False
    return (batch % mesh.shape[data_axis] == 0
            and heads % mesh.shape[model_axis] == 0)


def fused_attention_sharded(
    q: jnp.ndarray,  # [B, Sq, H, D]
    k: jnp.ndarray,
    v: jnp.ndarray,
    valid_mask: Optional[jnp.ndarray],  # [B, Sk] bool
    mesh,
    data_axis: str = "data",
    model_axis: str = "model",
    dropout_rng: Optional[jnp.ndarray] = None,
    **kwargs,
) -> jnp.ndarray:
    """fused_attention under a (data, model) mesh via shard_map.

    pallas_call is opaque to XLA's SPMD partitioner — under pjit with
    sharded operands it would be wrapped in all-gathers. Attention is
    independent per batch element AND per head, so shard_map with batch
    over `data_axis` and heads over `model_axis` (the Megatron activation
    layout after the column-sharded qkv projections,
    parallel/sharding.py:37-46) runs the kernel purely locally — zero
    collectives. Head count must divide the model-axis size.

    With dropout (dropout_rate > 0 in kwargs + dropout_rng), the key is
    folded with the shard's (data, model) coordinates inside shard_map so
    every shard draws an independent attention-dropout mask.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    b, _, h, _ = q.shape
    if h % mesh.shape[model_axis]:
        raise ValueError(f"{h} heads not divisible by "
                         f"{model_axis}={mesh.shape[model_axis]}")
    if b % mesh.shape[data_axis]:
        raise ValueError(f"batch {b} not divisible by "
                         f"{data_axis}={mesh.shape[data_axis]}")
    qkv_spec = P(data_axis, None, model_axis, None)
    mask_spec = P(data_axis, None)
    if valid_mask is None:
        valid_mask = jnp.ones((b, k.shape[1]), bool)
    n_model = mesh.shape[model_axis]

    if dropout_rng is not None:

        def local(q, k, v, m, rng):
            shard = (jax.lax.axis_index(data_axis) * n_model
                     + jax.lax.axis_index(model_axis))
            rng = jax.random.fold_in(rng, shard)
            return fused_attention(q, k, v, m, dropout_rng=rng, **kwargs)

        return shard_map(
            local, mesh=mesh,
            in_specs=(qkv_spec, qkv_spec, qkv_spec, mask_spec, P()),
            out_specs=qkv_spec,
            check_vma=False,  # pallas_call has no varying-manual-axes rule
        )(q, k, v, valid_mask, dropout_rng)

    def local(q, k, v, m):
        return fused_attention(q, k, v, m, **kwargs)

    return shard_map(
        local, mesh=mesh,
        in_specs=(qkv_spec, qkv_spec, qkv_spec, mask_spec),
        out_specs=qkv_spec,
        check_vma=False,  # pallas_call has no varying-manual-axes rule
    )(q, k, v, valid_mask)
