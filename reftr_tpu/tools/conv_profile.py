"""Per-stage ResNet cost breakdown on the chip (round-3 conv-bound work).

The whole-step xprof profile (round 2, PERFORMANCE.md) says conv fusions
take 70% of device time but is too coarse to say WHICH convs. This tool
times cumulative programs (stem, stem+layer1, ..., stem+all stages) —
XLA dead-code-eliminates the stages whose outputs are unused, so each
program executes exactly the prefix — and reports per-stage deltas for
forward and forward+backward. Tunnel-safe: inputs perturbed per step,
timing bounded by a device->host fetch.

Usage (on the TPU):  python -m reftr_tpu.tools.conv_profile [batch]
"""

from __future__ import annotations

import sys
import time

import numpy as np

STAGES = ["stem", "layer1", "layer2", "layer3", "layer4"]


def _time_fn(fn, args_fn, steps=10, warmup=2):
    out = fn(*args_fn(0))
    np.asarray(out)
    for i in range(warmup):
        np.asarray(fn(*args_fn(i + 1)))
    t0 = time.perf_counter()
    outs = [fn(*args_fn(100 + i)) for i in range(steps)]
    np.asarray(outs[-1])
    return (time.perf_counter() - t0) / steps * 1e3  # ms


def profile(batch: int = 32, hw: int = 640, s2d: bool = True,
            fold: bool = True):
    import jax
    import jax.numpy as jnp

    from reftr_tpu.nn.resnet import ResNet
    from reftr_tpu.ops.image import normalize_images

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    model = ResNet("resnet50", return_interm_layers=True,
                   space_to_depth=s2d, fold_bn=fold, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, size=(batch, hw, hw, 3)).astype(np.uint8)
    x0 = np.asarray(normalize_images(img), np.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x0)["params"]
    params = jax.device_put(params)
    x0 = jax.device_put(x0)

    def stage_out(params, x, k):
        # feats = (layer1..layer4): summing only feats[:k+1] lets XLA
        # dead-code-eliminate the unused later stages, so program k
        # executes exactly the stem..layer{k+1} prefix. The stem itself is
        # not separable (layer1's input is not an output); its cost is
        # inside the k=0 row.
        feats = model.apply({"params": params}, x)
        return sum(jnp.sum(feats[i].astype(jnp.float32))
                   for i in range(k + 1))

    def args_fn(i):
        return (params, x0 + np.float32(i) * 1e-6)

    print(f"# cumulative programs, B={batch} {hw}px bf16 "
          f"s2d={s2d} fold={fold}", flush=True)
    prev_f = prev_t = 0.0
    for k in range(4):
        fwd = jax.jit(lambda p, x, k=k: stage_out(p, x, k))
        t_f = _time_fn(fwd, args_fn)

        def loss(p, x, k=k):
            return stage_out(p, x, k)

        train = jax.jit(lambda p, x, k=k: jax.grad(loss)(p, x))

        def targs(i):
            return (params, x0 + np.float32(i) * 1e-6)

        # fetching one grad leaf bounds the timing: the program is a
        # single execution, so any output implies completion
        t_t = _time_fn(lambda p, x: jax.tree_util.tree_leaves(
            train(p, x))[0], targs)
        name = f"stem+layer1..{k + 1}"
        print(f"{name:18s} fwd {t_f:7.1f} ms (+{t_f - prev_f:6.1f})   "
              f"fwd+bwd {t_t:7.1f} ms (+{t_t - prev_t:6.1f})", flush=True)
        prev_f, prev_t = t_f, t_t


if __name__ == "__main__":
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    profile(b)
