"""Fused attention kernel vs the XLA einsum path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reftr_tpu.kernels.attention import _xla_attention, fused_attention
from reftr_tpu.nn.attention import MultiHeadAttention
from reftr_tpu.nn.convert import mha as convert_mha


def make_qkv(rng, b=2, sq=50, sk=70, h=4, d=32):
    q = rng.normal(size=(b, sq, h, d)).astype(np.float32)
    k = rng.normal(size=(b, sk, h, d)).astype(np.float32)
    v = rng.normal(size=(b, sk, h, d)).astype(np.float32)
    valid = np.ones((b, sk), bool)
    valid[0, int(sk * 0.8):] = False
    if b > 1:
        valid[1, int(sk * 0.6):] = False
    return q, k, v, valid


def test_fused_vs_xla(rng):
    q, k, v, valid = make_qkv(rng)
    bias = np.where(valid, 0.0, -1e9).astype(np.float32)
    want = np.asarray(_xla_attention(
        q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
        v.transpose(0, 2, 1, 3), bias)).transpose(0, 2, 1, 3)
    got = np.asarray(fused_attention(q, k, v, valid, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_fused_no_mask(rng):
    q, k, v, _ = make_qkv(rng, sq=33)
    got = np.asarray(fused_attention(q, k, v, None, interpret=True))
    bias = np.zeros((2, 70), np.float32)
    want = np.asarray(_xla_attention(
        q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
        v.transpose(0, 2, 1, 3), bias)).transpose(0, 2, 1, 3)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_fused_gradients_match(rng):
    q, k, v, valid = make_qkv(rng, b=1, sq=16, sk=24)
    bias = np.where(valid[:1], 0.0, -1e9).astype(np.float32)

    def loss_fused(q, k, v):
        return jnp.sum(fused_attention(q, k, v, valid[:1], interpret=True) ** 2)

    def loss_xla(q, k, v):
        out = _xla_attention(q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                             v.transpose(0, 2, 1, 3), bias)
        return jnp.sum(out.transpose(0, 2, 1, 3) ** 2)

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_mha_module_pallas_path_matches(rng):
    """MultiHeadAttention(use_pallas=True) == XLA path on the same params."""
    d, h, b, s = 64, 4, 2, 30
    x = rng.normal(size=(b, s, d)).astype(np.float32)
    valid = np.ones((b, s), bool)
    valid[1, 20:] = False
    ref_mod = MultiHeadAttention(d, h, 0.0, use_pallas=False)
    params = ref_mod.init(jax.random.PRNGKey(0), x, x, x, valid)
    want = np.asarray(ref_mod.apply(params, x, x, x, valid))

    pal_mod = MultiHeadAttention(d, h, 0.0, use_pallas=True)
    got = np.asarray(pal_mod.apply(params, x, x, x, valid))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
