"""mxu_bf16 kernel-mode sweep on the real chip (VERDICT r4 #4).

f32 matmuls issue at half the MXU's bf16 rate on v5e; mxu_bf16 casts the
kernel's dot INPUTS to bf16 (f32 accumulate + f32 softmax stats). This
measures whether that closes the serving-shape gap (S=440: XLA 2.70 ms vs
Pallas-f32 3.12 ms, PERFORMANCE.md "Head-packed kernel") and what it does
at the training shapes where the kernel already wins. Perturb inputs per
step + device->host fetch per the tunnel rules (CLAUDE.md).
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")
from reftr_tpu.kernels.attention import fused_attention  # noqa: E402

steps = 30
INNER = 20


def xla_attn(q, k, v, valid):
    bias = jnp.where(valid, 0.0, -1e9)[:, None, None, :]
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
    logits = logits / np.sqrt(q.shape[-1]) + bias
    p = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v)


def timed(fn, tag, q0, k0, v0, valid, B):
    # amortize tunnel dispatch: INNER dependent applications inside one jit
    @jax.jit
    def f(q, k, v, valid):
        def body(q, _):
            o = fn(q, k, v, valid)
            return q + o * jnp.bfloat16(1e-3), o[0, 0, 0, 0]
        _, outs = jax.lax.scan(body, q, None, length=INNER)
        return outs

    def run(i):
        return np.asarray(f(q0 + jnp.bfloat16(i * 1e-3), k0, v0, valid))

    run(0)  # compile
    t0 = time.perf_counter()
    for i in range(steps):
        run(i + 1)
    dt = (time.perf_counter() - t0) / (steps * INNER)
    print(f"{tag:36s} {dt*1e3:8.3f} ms/call  {B/dt:8.1f} img/s", flush=True)
    return dt


def sweep(B, H, SQ, SK, D):
    print(f"\nshape B={B} H={H} Sq={SQ} Sk={SK} D={D} "
          f"backend={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)
    q0 = jnp.asarray(rng.standard_normal((B, SQ, H, D)), jnp.bfloat16)
    k0 = jnp.asarray(rng.standard_normal((B, SK, H, D)), jnp.bfloat16)
    v0 = jnp.asarray(rng.standard_normal((B, SK, H, D)), jnp.bfloat16)
    valid = jnp.asarray(rng.random((B, SK)) < 0.9)
    timed(xla_attn, "xla", q0, k0, v0, valid, B)
    for mxu in (False, True):
        for g in (1, 2, 4):
            for bq, bk in ((512, 1024), (256, 512)):
                tag = f"pallas g={g} bq={bq} bk={bk} bf16dot={int(mxu)}"
                try:
                    timed(lambda q, k, v, m, g=g, bq=bq, bk=bk, mxu=mxu:
                          fused_attention(q, k, v, m, block_q=bq, block_k=bk,
                                          head_group=g, mxu_bf16=mxu,
                                          interpret=False),
                          tag, q0, k0, v0, valid, B)
                except Exception as e:  # VMEM OOM etc
                    print(f"{tag:36s} FAILED: {type(e).__name__}: "
                          f"{str(e)[:100]}", flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1:
        sweep(*map(int, sys.argv[1].split(",")))
    else:
        sweep(64, 8, 440, 440, 32)    # flagship serving (1-level, B=64)
        sweep(8, 8, 2048, 2048, 32)   # training multi-level shape
