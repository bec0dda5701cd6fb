"""fwd+bwd head-group timing (training path) at kernel-active shapes."""
import time, sys
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")
from reftr_tpu.kernels.attention import fused_attention  # noqa: E402

B, H, SQ, SK, D = 16, 8, 2048, 2048, 32
if len(sys.argv) > 1:
    B, H, SQ, SK, D = map(int, sys.argv[1].split(","))
steps, INNER = 15, 8

rng = np.random.default_rng(0)
q0 = jnp.asarray(rng.standard_normal((B, SQ, H, D)), jnp.bfloat16)
k0 = jnp.asarray(rng.standard_normal((B, SK, H, D)), jnp.bfloat16)
v0 = jnp.asarray(rng.standard_normal((B, SK, H, D)), jnp.bfloat16)
valid = jnp.asarray(rng.random((B, SK)) < 0.9)
key = jax.random.PRNGKey(7)

print(f"fwd+bwd B={B} H={H} S={SQ} D={D} backend={jax.default_backend()}")
for g in (1, 2):
    for drop in (0.0, 0.1):
        def loss(q, k, v, g=g, drop=drop):
            o = fused_attention(q, k, v, valid, head_group=g,
                                dropout_rate=drop, dropout_rng=key,
                                interpret=False)
            return jnp.sum(o.astype(jnp.float32) ** 2)

        @jax.jit
        def f(q, k, v):
            def body(q, _):
                l, (dq, dk, dv) = jax.value_and_grad(loss, (0, 1, 2))(q, k, v)
                return q + dq * jnp.bfloat16(1e-6), l
            _, ls = jax.lax.scan(body, q, None, length=INNER)
            return ls

        def run(i):
            return np.asarray(f(q0 + jnp.bfloat16(i * 1e-3), k0, v0))

        tag = f"g={g} drop={drop}"
        try:
            run(0)
            t0 = time.perf_counter()
            for i in range(steps):
                run(i + 1)
            dt = (time.perf_counter() - t0) / (steps * INNER)
            print(f"{tag:18s} {dt*1e3:8.3f} ms/step")
        except Exception as e:
            print(f"{tag:18s} FAILED: {type(e).__name__}: {str(e)[:100]}")
