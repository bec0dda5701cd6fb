"""Head-group flash-attention sweep on the real chip (VERDICT r3 #5).

At the flagship serving shape (S=440, H=8, D=32) the kernel loses to XLA
because head_dim 32 fills 1/4 of the 128 MXU lanes. head_group=G packs G
heads per grid step; this measures whether the amortized grid/DMA
overhead closes the gap. Perturb inputs per step + device->host fetch
per the tunnel rules (CLAUDE.md).
"""
import time, sys
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")
from reftr_tpu.kernels.attention import fused_attention  # noqa: E402

B, H, SQ, SK, D = 64, 8, 440, 440, 32
if len(sys.argv) > 1:
    B, H, SQ, SK, D = map(int, sys.argv[1].split(","))
steps = 30

rng = np.random.default_rng(0)
q0 = jnp.asarray(rng.standard_normal((B, SQ, H, D)), jnp.bfloat16)
k0 = jnp.asarray(rng.standard_normal((B, SK, H, D)), jnp.bfloat16)
v0 = jnp.asarray(rng.standard_normal((B, SK, H, D)), jnp.bfloat16)
valid = jnp.asarray(rng.random((B, SK)) < 0.9)


def xla_attn(q, k, v, valid):
    bias = jnp.where(valid, 0.0, -1e9)[:, None, None, :]
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
    logits = logits / np.sqrt(D) + bias
    p = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v)


INNER = 20


def timed(fn, tag):
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
    print(f"{tag:28s} {dt*1e3:8.3f} ms/call  {B/dt:8.1f} img/s")
    return dt


print(f"shape B={B} H={H} Sq={SQ} Sk={SK} D={D}  backend={jax.default_backend()}")
timed(xla_attn, "xla")
for g in (1, 2, 4, 8):
    for bq, bk in ((512, 1024), (256, 512)):
        if g * max(SQ, 512) * 1 > 10 * 2**20:  # rough VMEM guard, skip none
            pass
        tag = f"pallas g={g} bq={bq} bk={bk}"
        try:
            timed(lambda q, k, v, m, g=g, bq=bq, bk=bk: fused_attention(
                q, k, v, m, block_q=bq, block_k=bk, head_group=g,
                interpret=False), tag)
        except Exception as e:  # VMEM OOM etc
            print(f"{tag:28s} FAILED: {type(e).__name__}: {str(e)[:120]}")
