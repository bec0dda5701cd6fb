"""Benchmark: RefTR flagship inference throughput on one chip.

Prints exactly one JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Measures steady-state eval-forward throughput (images/sec/chip) of the
flagship model (ResNet-50 + BERT-base + 6+6 VL transformer, 640x640, the
configs/refcoco/RefTR_refcoco.sh REC shape) in bfloat16 with data resident
on device — the serving hot path.

vs_baseline: the reference publishes no numbers (BASELINE.md); the divisor
below is our recorded estimate of the PyTorch reference's per-GPU A100
eval throughput for this model class (DETR-R50-scale encoder-decoder at
640px with BERT-base: ~85 img/s with fp16 on A100). Replace with a measured
number when one exists.
"""

import json
import sys
import time

import numpy as np

A100_PYTORCH_BASELINE_IMG_PER_SEC = 85.0
BATCH = 64
STEPS = 20
WARMUP = 3


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from reftr_tpu.core.config import ModelConfig, RefTRConfig
    from reftr_tpu.models import build_model

    cfg = RefTRConfig(model=ModelConfig(dtype="bfloat16", aux_loss=False))
    model, _ = build_model(cfg)

    rng = np.random.default_rng(0)
    b, hw, s = BATCH, cfg.data.img_size, cfg.data.max_query_len
    sv = np.zeros((b, s), np.int32)
    for i in range(b):
        sv[i, : 5 + (i % 30)] = 1
    iv = np.ones((b, hw, hw), bool)
    batch = {
        "image": rng.normal(size=(b, hw, hw, 3)).astype(np.float32),
        "image_valid": iv,
        "sentence": rng.integers(1, cfg.model.bert.vocab_size,
                                 size=(b, s)).astype(np.int32),
        "sentence_valid": sv,
    }

    params = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    batch = jax.device_put(batch)

    # NOTE measurement integrity: the remote TPU tunnel (axon) memoizes
    # identical program+args executions AND block_until_ready does not
    # actually wait for device completion. So (a) every step perturbs the
    # input, (b) timing is bounded by a device->host fetch of the result.
    import jax.numpy as jnp

    @jax.jit
    def fwd(params, batch, step):
        batch = dict(batch,
                     image=batch["image"] + step.astype(jnp.float32) * 1e-6)
        return model.apply(params, batch)["pred_boxes"]

    # compile + warmup
    np.asarray(fwd(params, batch, jnp.asarray(0)))
    for i in range(WARMUP):
        np.asarray(fwd(params, batch, jnp.asarray(i + 1)))

    # pipelined steady state: submit STEPS executions with distinct inputs,
    # fetch the last result (serial device queue => all completed).
    t0 = time.perf_counter()
    outs = [fwd(params, batch, jnp.asarray(100 + i)) for i in range(STEPS)]
    np.asarray(outs[-1])
    dt = time.perf_counter() - t0

    imgs_per_sec = BATCH * STEPS / dt
    print(json.dumps({
        "metric": "inference_images_per_sec_per_chip",
        "value": round(imgs_per_sec, 2),
        "unit": "img/s",
        "vs_baseline": round(imgs_per_sec / A100_PYTORCH_BASELINE_IMG_PER_SEC, 3),
    }))


if __name__ == "__main__":
    sys.exit(main())
