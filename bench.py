"""Benchmark: RefTR flagship throughput on one chip.

Default mode prints exactly one JSON line (the driver contract):
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Modes (argv[1]):
  (none) / rec : eval-forward throughput of the flagship REC model
                 (ResNet-50 + BERT-base + 6+6 VL transformer, 640x640,
                 bf16, the configs/refcoco/RefTR_refcoco.sh shape)
  seg          : RefTRSeg (REC+RES: MHAttentionMap + FPN mask head at
                 160x160, reference reftr_segmentation.py:152-280)
  train        : full fused train step (fwd+bwd+clip+AdamW, aux loss on)
  train_opt    : train with --space_to_depth_stem --fold_bn
  latency      : p50/p90 per-image serving latency at B=1 (BASELINE.md)

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
# same protocol guess for the heavier seg forward (mask head at 160x160)
A100_PYTORCH_SEG_BASELINE_IMG_PER_SEC = 60.0
A100_PYTORCH_TRAIN_BASELINE_IMG_PER_SEC = 30.0
STEPS = 20
WARMUP = 3


def make_batch(rng, b, hw, s, vocab, uint8=False):
    sv = np.zeros((b, s), np.int32)
    for i in range(b):
        sv[i, : 5 + (i % 30)] = 1
    if uint8:
        # the production input path: uint8 canvases from the loader,
        # /255 + ImageNet normalize fused on device (ops/image.py)
        image = rng.integers(0, 255, size=(b, hw, hw, 3)).astype(np.uint8)
    else:
        image = rng.normal(size=(b, hw, hw, 3)).astype(np.float32)
    return {
        "image": image,
        "image_valid": np.ones((b, hw, hw), bool),
        "sentence": rng.integers(1, vocab, size=(b, s)).astype(np.int32),
        "sentence_valid": sv,
    }


def measure_eval(model, params, batch, batch_size, steps=STEPS):
    """NOTE measurement integrity: the remote TPU tunnel (axon) memoizes
    identical program+args executions AND block_until_ready does not
    actually wait for device completion. So (a) every step perturbs the
    input, (b) timing is bounded by a device->host fetch of the result."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def fwd(params, batch, step):
        if batch["image"].dtype == jnp.uint8:
            img = ((batch["image"].astype(jnp.int32) + step) % 256
                   ).astype(jnp.uint8)
        else:
            img = batch["image"] + step.astype(jnp.float32) * 1e-6
        batch = dict(batch, image=img)
        return model.apply(params, batch)["pred_boxes"]

    np.asarray(fwd(params, batch, jnp.asarray(0)))
    for i in range(WARMUP):
        np.asarray(fwd(params, batch, jnp.asarray(i + 1)))
    # pipelined steady state: submit executions with distinct inputs,
    # fetch the last result (serial device queue => all completed).
    t0 = time.perf_counter()
    outs = [fwd(params, batch, jnp.asarray(100 + i)) for i in range(steps)]
    np.asarray(outs[-1])
    dt = time.perf_counter() - t0
    return batch_size * steps / dt


def bench_rec(batch_size=64, fold_normalize=False, quantize=False,
              quantize_scope=("backbone",), block_layer1=False):
    import dataclasses as dc

    import jax

    from reftr_tpu.core.config import ModelConfig, RefTRConfig
    from reftr_tpu.models import build_model

    mc = ModelConfig(dtype="bfloat16", aux_loss=False,
                     fold_bn=fold_normalize or quantize,
                     fold_normalize=fold_normalize,
                     quantize_scope=tuple(quantize_scope),
                     block_layer1=block_layer1)
    cfg = RefTRConfig(model=mc)
    model, _ = build_model(cfg)
    rng = np.random.default_rng(0)
    batch = make_batch(rng, batch_size, cfg.data.img_size,
                       cfg.data.max_query_len, cfg.model.bert.vocab_size,
                       uint8=True)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    batch = jax.device_put(batch)
    if quantize:
        # int8 PTQ serving path (nn/quant.py): calibrate input scales on
        # one batch, rewrite the backbone convs + transformer denses,
        # serve the int8 model
        from reftr_tpu.nn.quant import quantize_params

        calib_model, _ = build_model(RefTRConfig(model=dc.replace(
            mc, quant_calibrate=True)))
        _, var = jax.jit(lambda p, b: calib_model.apply(
            p, b, mutable=["calib"]))(params, batch)
        qtree = quantize_params(jax.device_get(params["params"]),
                                jax.device_get(var["calib"]),
                                scope=mc.quantize_scope)
        # device-commit: numpy leaves in jit args are re-serialized by the
        # axon tunnel on every dispatch (PERFORMANCE.md round 3)
        params = jax.device_put({"params": qtree})
        model, _ = build_model(RefTRConfig(model=dc.replace(
            mc, quantize_int8=True)))
    ips = measure_eval(model, params, batch, batch_size)
    name = "inference"
    if quantize:
        name = "inference_int8"
        if len(quantize_scope) > 1:
            name = "inference_int8_" + "_".join(
                k for k in quantize_scope if k != "backbone")
    elif fold_normalize:
        name = "inference_fn"
    return {
        "metric": name + "_images_per_sec_per_chip",
        "value": round(ips, 2),
        "unit": "img/s",
        "vs_baseline": round(ips / A100_PYTORCH_BASELINE_IMG_PER_SEC, 3),
    }


def bench_latency(batch_size=1, fold_normalize=True, steps=50):
    """p50 per-image latency (BASELINE.md target): single-request eval
    forward, timed per call with a host fetch. Over the axon tunnel this
    includes ~10 ms of dispatch RTT (PERFORMANCE.md); on-device compute is
    ~1-2 ms at B=1."""
    import jax
    import jax.numpy as jnp

    from reftr_tpu.core.config import ModelConfig, RefTRConfig
    from reftr_tpu.models import build_model

    mc = ModelConfig(dtype="bfloat16", aux_loss=False,
                     fold_bn=fold_normalize, fold_normalize=fold_normalize)
    cfg = RefTRConfig(model=mc)
    model, _ = build_model(cfg)
    rng = np.random.default_rng(0)
    batch = make_batch(rng, batch_size, cfg.data.img_size,
                       cfg.data.max_query_len, cfg.model.bert.vocab_size,
                       uint8=True)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    batch = jax.device_put(batch)

    @jax.jit
    def fwd(params, batch, step):
        img = ((batch["image"].astype(jnp.int32) + step) % 256
               ).astype(jnp.uint8)
        return model.apply(params, dict(batch, image=img))["pred_boxes"]

    for i in range(WARMUP + 1):
        np.asarray(fwd(params, batch, jnp.asarray(i)))
    times = []
    for i in range(steps):
        t0 = time.perf_counter()
        np.asarray(fwd(params, batch, jnp.asarray(100 + i)))
        times.append(time.perf_counter() - t0)
    p50 = float(np.percentile(times, 50)) * 1e3 / batch_size
    p90 = float(np.percentile(times, 90)) * 1e3 / batch_size
    return {
        "metric": f"p50_latency_ms_per_image_b{batch_size}",
        "value": round(p50, 3),
        "unit": "ms",
        # ratio vs the same assumed A100 reference as the throughput modes,
        # expressed as latency at its B=1 dispatch floor (~1000/85 ms);
        # >1 means we are faster. Replace when a measured number exists.
        "vs_baseline": round((1000.0 / A100_PYTORCH_BASELINE_IMG_PER_SEC)
                             / max(p50, 1e-9), 3),
        "p90_ms": round(p90, 3),
    }


def bench_seg(batch_size=32, fold_normalize=False, quantize=False):
    import dataclasses as dc

    import jax

    from reftr_tpu.core.config import ModelConfig, RefTRConfig
    from reftr_tpu.models import build_model

    mc = ModelConfig(dtype="bfloat16", aux_loss=False, masks=True,
                     fold_bn=fold_normalize or quantize,
                     fold_normalize=fold_normalize)
    cfg = RefTRConfig(model=mc)
    model, _ = build_model(cfg)
    rng = np.random.default_rng(0)
    batch = make_batch(rng, batch_size, cfg.data.img_size,
                       cfg.data.max_query_len, cfg.model.bert.vocab_size,
                       uint8=fold_normalize or quantize)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    batch = jax.device_put(batch)
    if quantize:
        from reftr_tpu.nn.quant import quantize_params

        calib_model, _ = build_model(RefTRConfig(model=dc.replace(
            mc, quant_calibrate=True)))
        _, var = jax.jit(lambda p, b: calib_model.apply(
            p, b, mutable=["calib"]))(params, batch)
        qtree = quantize_params(jax.device_get(params["params"]),
                                jax.device_get(var["calib"]),
                                scope=mc.quantize_scope)
        # device-commit: numpy leaves in jit args are re-serialized by the
        # axon tunnel on every dispatch (PERFORMANCE.md round 3)
        params = jax.device_put({"params": qtree})
        model, _ = build_model(RefTRConfig(model=dc.replace(
            mc, quantize_int8=True)))
    ips = measure_eval(model, params, batch, batch_size)
    name = "seg_inference"
    if quantize:
        name = "seg_inference_int8"
    elif fold_normalize:
        name = "seg_inference_fn"
    return {
        "metric": name + "_images_per_sec_per_chip",
        "value": round(ips, 2),
        "unit": "img/s",
        "vs_baseline": round(ips / A100_PYTORCH_SEG_BASELINE_IMG_PER_SEC, 3),
    }


def bench_exported(batch_size=64):
    """Deployment-artifact serving: export the production config (fold_bn +
    fold_normalize + full-scope int8 PTQ) via jax.export, reload the
    serialized StableHLO, and measure the DESERIALIZED program's
    throughput — any gap vs `rec` is artifact overhead."""
    import tempfile

    import jax
    import jax.numpy as jnp

    from reftr_tpu.core.config import ModelConfig, RefTRConfig
    from reftr_tpu.tools.export_model import export_with_config, \
        load_exported

    mc = ModelConfig(dtype="bfloat16", aux_loss=False, fold_bn=True,
                     fold_normalize=True, quantize_int8=True,
                     quantize_scope=("backbone", "bert", "vl"))
    cfg = RefTRConfig(model=mc)
    with tempfile.TemporaryDirectory() as d:
        _, _, _, manifest = export_with_config(
            cfg, resume="", out_dir=d, batch_size=batch_size,
            platforms=(jax.default_backend(),),
            print_fn=lambda *a: None)
        call, _ = load_exported(d)
        rng = np.random.default_rng(0)
        batch = jax.device_put(make_batch(
            rng, batch_size, cfg.data.img_size, cfg.data.max_query_len,
            mc.bert.vocab_size, uint8=True))

        @jax.jit
        def fwd(batch, step):
            img = ((batch["image"].astype(jnp.int32) + step) % 256
                   ).astype(jnp.uint8)
            return call(dict(batch, image=img))["pred_boxes"]

        np.asarray(fwd(batch, jnp.asarray(0)))
        for i in range(WARMUP):
            np.asarray(fwd(batch, jnp.asarray(i + 1)))
        t0 = time.perf_counter()
        outs = [fwd(batch, jnp.asarray(100 + i)) for i in range(STEPS)]
        np.asarray(outs[-1])
        dt = time.perf_counter() - t0
        ips = batch_size * STEPS / dt
    return {
        "metric": "inference_exported_images_per_sec_per_chip",
        "value": round(ips, 2),
        "unit": "img/s",
        "vs_baseline": round(ips / A100_PYTORCH_BASELINE_IMG_PER_SEC, 3),
        "artifact_mb": round(manifest["artifact_bytes"] / 2**20, 1),
    }


def bench_train(batch_size=32, optimized=False, uint8=False,
                fold_normalize=False, pad_width=0, backbone_remat=False,
                remat_stages=(), block_layer1=False):
    import jax
    import jax.numpy as jnp

    from reftr_tpu.core.config import (LossConfig, ModelConfig, RefTRConfig,
                                       TrainConfig)
    from reftr_tpu.models import build_model
    from reftr_tpu.train.optimizer import build_optimizer
    from reftr_tpu.train.schedules import build_schedule
    from reftr_tpu.train.state import TrainState
    from reftr_tpu.train.steps import make_train_step

    mc = ModelConfig(dtype="bfloat16", aux_loss=True,
                     space_to_depth_stem=optimized, fold_bn=optimized,
                     fold_normalize=fold_normalize,
                     backbone_pad_width=pad_width,
                     backbone_remat=backbone_remat,
                     backbone_remat_stages=tuple(remat_stages),
                     block_layer1=block_layer1)
    cfg = RefTRConfig(model=mc)
    model, wd = build_model(cfg)
    rng = np.random.default_rng(0)
    b = batch_size
    batch = make_batch(rng, b, cfg.data.img_size, cfg.data.max_query_len,
                       mc.bert.vocab_size, uint8=uint8 or fold_normalize)
    targets = {
        "boxes": rng.uniform(0.3, 0.6, size=(b, 1, 4)).astype(np.float32),
        "box_valid": np.ones((b, 1), bool),
    }
    tc = TrainConfig(lr=1e-4)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), batch)["params"]
    tx = build_optimizer(mc, tc, build_schedule(tc, steps_per_epoch=1000))
    state = TrainState.create(params, tx, jax.random.PRNGKey(1))
    step = make_train_step(model, wd, LossConfig(), world_size=1, donate=True)
    batch = jax.device_put(batch)
    targets = jax.device_put(targets)

    def perturbed(i):
        if batch["image"].dtype == np.uint8:
            img = batch["image"].at[:, 0, 0, 0].set(i % 256)
            return dict(batch, image=img)  # defeat the tunnel memoization
        return dict(batch, image=batch["image"] + np.float32(i) * 1e-6)

    state, m = step(state, perturbed(0), targets)
    for i in range(2):
        state, m = step(state, perturbed(i + 1), targets)
    float(m["loss"])
    steps = 12
    t0 = time.perf_counter()
    for i in range(steps):
        state, m = step(state, perturbed(100 + i), targets)
    final_loss = float(m["loss"])  # device->host fetch bounds the timing
    dt = time.perf_counter() - t0
    assert np.isfinite(final_loss), (
        f"train step produced non-finite loss {final_loss}: the timing "
        "would be measuring garbage")
    ips = b * steps / dt
    name = "train"
    if optimized:
        name = "train_opt"
    if fold_normalize:
        name = "train_fn"
    elif uint8:
        name = "train_u8"
    if pad_width:
        name += f"_pad{pad_width}"
    if backbone_remat:
        name += "_rm"
    elif remat_stages:
        name += "_rm" + "".join(str(s) for s in remat_stages)
    return {
        "metric": name + "_images_per_sec_per_chip",
        "value": round(ips, 2),
        "unit": "img/s",
        "vs_baseline": round(
            ips / A100_PYTORCH_TRAIN_BASELINE_IMG_PER_SEC, 3),
    }


def bench_train_e2e(batch_size=32, steps=100, num_workers=4):
    """End-to-end training throughput with the REAL input pipeline feeding
    the chip: a disk-backed synthetic fixture at flagship geometry (640px
    JPEGs) runs through the production DataLoader (JPEG decode -> resize ->
    canvas pack, C++ image ops; engine_vg.py:228-291 is the reference's
    equivalent prefetcher) into the fused train step. Unlike `train_u8`
    (device-resident perturbed tensors), this measures what a user gets.

    Extra keys: `input_stall_frac` = fraction of steady-state wall time the
    host spends blocked waiting for the next batch (prefetch misses), and
    `fetch_ms_mean` = mean per-step blocked-fetch time.
    """
    import os
    import tempfile

    import jax

    from reftr_tpu.core.config import (DataConfig, LossConfig, ModelConfig,
                                       RefTRConfig, TrainConfig)
    from reftr_tpu.data.datasets import (SyntheticGroundingDataset,
                                         write_synthetic_vocab)
    from reftr_tpu.data.loader import DataLoader
    from reftr_tpu.data.native import WordPieceTokenizer
    from reftr_tpu.data.samplers import ShardedSampler
    from reftr_tpu.models import build_model
    from reftr_tpu.train.engine import _strip_target
    from reftr_tpu.train.optimizer import build_optimizer
    from reftr_tpu.train.schedules import build_schedule
    from reftr_tpu.train.state import TrainState
    from reftr_tpu.train.steps import donation_is_safe, make_train_step

    mc = ModelConfig(dtype="bfloat16", aux_loss=True,
                     space_to_depth_stem=True, fold_bn=True)
    cfg = RefTRConfig(model=mc, data=DataConfig(dataset="synthetic"),
                      train=TrainConfig(lr=1e-4))
    vocab = write_synthetic_vocab(os.path.join(
        tempfile.gettempdir(), "reftr_synth_vocab.txt"))
    tokenizer = WordPieceTokenizer(vocab)
    # 256 disk-backed 640px JPEGs; epochs loop until `steps` total steps.
    # The axon tunnel memoizes identical program+args, but the train state
    # advances every step so no dispatch repeats.
    ds = SyntheticGroundingDataset(
        tokenizer, n=256, img_size=cfg.data.img_size,
        canvas=cfg.data.max_img_size, max_query_len=cfg.data.max_query_len)
    fixture_dir = os.path.join(tempfile.gettempdir(), "reftr_e2e_fixture")
    ds.export_images(fixture_dir)
    loader = DataLoader(ds, batch_size,
                        sampler=ShardedSampler(len(ds), shuffle=True),
                        num_workers=num_workers, drop_last=True,
                        device_put=jax.device_put)

    model, wd = build_model(cfg)
    sample_batch, _ = next(iter(loader))
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 sample_batch)["params"]
    tx = build_optimizer(mc, cfg.train,
                         build_schedule(cfg.train, steps_per_epoch=1000))
    state = TrainState.create(params, tx, jax.random.PRNGKey(1))
    step = make_train_step(model, wd, LossConfig(), world_size=1,
                           donate=donation_is_safe())

    def batches():
        epoch = 0
        while True:
            loader.set_epoch(epoch)
            yield from iter(loader)
            epoch += 1

    it = batches()
    warmup = 5
    m = None
    for _ in range(warmup):  # compile + loader ramp-up
        samples, targets = next(it)
        state, m = step(state, samples, _strip_target(targets))
    float(m["loss"])
    t0 = time.perf_counter()
    fetch_s = 0.0
    for _ in range(steps):
        f0 = time.perf_counter()
        samples, targets = next(it)  # host blocked on input here
        fetch_s += time.perf_counter() - f0
        state, m = step(state, samples, _strip_target(targets))
    final_loss = float(m["loss"])  # device->host fetch bounds the timing
    dt = time.perf_counter() - t0
    assert np.isfinite(final_loss), (
        f"train step produced non-finite loss {final_loss}: the timing "
        "would be measuring garbage")
    ips = batch_size * steps / dt
    return {
        "metric": "train_e2e_images_per_sec_per_chip",
        "value": round(ips, 2),
        "unit": "img/s",
        "vs_baseline": round(
            ips / A100_PYTORCH_TRAIN_BASELINE_IMG_PER_SEC, 3),
        "input_stall_frac": round(fetch_s / dt, 4),
        "fetch_ms_mean": round(fetch_s / steps * 1e3, 2),
        "host_cores": os.cpu_count(),
    }


def bench_serve_pipeline(batch_size=32, n_requests=40, rows_per_req=16):
    """Serving dispatch pipelining: drives tools/serve.py's MicroBatcher
    directly (pre-tokenized requests; no HTTP/JPEG so the 1-core host's
    preprocessing cost doesn't mask the dispatch path) with the double-
    buffered overlap ON vs OFF, plus B=1-style sparse-request latency.

    Overlap ON: batch N's device->host fetch (tunnel RTT) runs while batch
    N+1 computes; OFF reproduces the round-3 behavior (fetch before next
    dispatch)."""
    import threading

    from reftr_tpu.core.config import DataConfig, ModelConfig, RefTRConfig
    from reftr_tpu.tools.serve import MicroBatcher, ServingModel, _Request

    mc = ModelConfig(dtype="bfloat16", aux_loss=False, fold_bn=True,
                     fold_normalize=True)
    cfg = RefTRConfig(model=mc, data=DataConfig(dataset="synthetic"))
    model = ServingModel(cfg, batch_size)
    rng = np.random.default_rng(0)
    d = cfg.data

    def make_request(i, k=rows_per_req):
        img = rng.integers(0, 255, size=(
            k, d.max_img_size, d.max_img_size, 3)).astype(np.uint8)
        img[:, 0, 0, 0] = i % 256  # defeat the tunnel memoization
        sv = np.zeros((k, d.max_query_len), np.int32)
        sv[:, :6] = 1
        rows = {
            "image": img,
            "image_valid": np.ones((k, d.max_img_size, d.max_img_size),
                                   bool),
            "sentence": rng.integers(
                1, mc.bert.vocab_size,
                size=(k, d.max_query_len)).astype(np.int32),
            "sentence_valid": sv,
        }
        return _Request(rows=rows, k=k, orig_hw=(480, 640),
                        valid_hw=(480, 640), phrases=["p"] * k)

    def run(pipeline, n=n_requests):
        batcher = MicroBatcher(model, cfg, timeout_ms=1.0,
                               pipeline=pipeline)
        reqs = [make_request(1000 * (2 if pipeline else 1) + i)
                for i in range(n)]
        # warmup (compile + steady dispatch)
        w = make_request(7)
        batcher.submit(w)
        w.done.wait(600)
        t0 = time.perf_counter()
        for r in reqs:
            batcher.submit(r)
        for r in reqs:
            r.done.wait(600)
        dt = time.perf_counter() - t0
        assert all(r.error is None for r in reqs), \
            [r.error for r in reqs if r.error][:1]
        # light-load latency: sparse single requests, one at a time (the
        # overlap must NOT regress this — the fetch happens immediately
        # when the queue is empty)
        lat = []
        for i in range(10):
            r = make_request(5000 + i, k=1)
            t1 = time.perf_counter()
            batcher.submit(r)
            r.done.wait(600)
            lat.append((time.perf_counter() - t1) * 1e3)
        batcher.stop()
        return rows_per_req * n / dt, float(np.percentile(lat, 50)), \
            batcher.stats

    ips_off, p50_off, stats_off = run(pipeline=False)
    ips_on, p50_on, stats_on = run(pipeline=True)
    return {
        "metric": "serve_pipelined_images_per_sec_per_chip",
        "value": round(ips_on, 2),
        "unit": "img/s",
        "vs_baseline": round(ips_on / A100_PYTORCH_BASELINE_IMG_PER_SEC, 3),
        "no_overlap_img_per_sec": round(ips_off, 2),
        "overlap_speedup": round(ips_on / ips_off, 3),
        "dispatch_overlaps": stats_on["dispatch_overlaps"],
        "sparse_p50_ms_on": round(p50_on, 2),
        "sparse_p50_ms_off": round(p50_off, 2),
    }


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    mode = sys.argv[1] if len(sys.argv) > 1 else "rec"
    if len(sys.argv) > 2:
        # optional batch-size override, e.g. `python bench.py rec_int8 128`
        b = int(sys.argv[2])
        import functools

        global bench_rec, bench_seg, bench_train, bench_latency, \
            bench_train_e2e
        bench_rec = functools.partial(bench_rec, batch_size=b)
        bench_seg = functools.partial(bench_seg, batch_size=b)
        bench_train = functools.partial(bench_train, batch_size=b)
        bench_latency = functools.partial(bench_latency, batch_size=b)
        bench_train_e2e = functools.partial(bench_train_e2e, batch_size=b)
    if mode == "rec":
        # driver contract: the production serving config — fold_bn +
        # fold_normalize (exact reparameterizations) + full-scope int8 PTQ
        # (accuracy-gated: trained-model gate in tests/test_learning.py,
        # e2e eval reproduction in tests/test_quantize.py — PERFORMANCE.md r3)
        out = bench_rec(fold_normalize=True, quantize=True,
                        quantize_scope=("backbone", "bert", "vl"))
        out["metric"] = "inference_images_per_sec_per_chip"
    elif mode == "rec_plain":
        out = bench_rec()
    elif mode == "seg":
        out = bench_seg()
    elif mode == "train":
        out = bench_train()
    elif mode == "train_opt":
        out = bench_train(optimized=True)
    elif mode == "train_e2e":
        # end-to-end: the production DataLoader (disk JPEGs, C++ decode/
        # resize/pack) feeding the chip; reports input-stall fraction
        out = bench_train_e2e()
    elif mode == "train_u8":
        # production input path: uint8 canvases, /255+normalize on device
        out = bench_train(optimized=True, uint8=True)
    elif mode == "train_blk":
        # layer1 on the 2x2 space-to-depth grid (--block_layer1):
        # exact reparameterization, fills MXU lanes at 160^2
        out = bench_train(optimized=True, uint8=True, block_layer1=True)
        out["metric"] = out["metric"].replace("train_u8", "train_blk")
    elif mode == "train_rbg":
        # XLA-native RBG PRNG for the non-Pallas dropouts (threefry is
        # serial bit-twiddling on the VPU; rbg lowers to the TPU's native
        # RNG instruction). The big attention dropout is already in-kernel.
        jax.config.update("jax_default_prng_impl", "rbg")
        out = bench_train(optimized=True, uint8=True)
        out["metric"] = out["metric"].replace("train_u8", "train_rbg")
    elif mode == "train_fn":
        # normalize folded into the stem weights (--fold_normalize)
        out = bench_train(optimized=True, fold_normalize=True)
    elif mode == "train_pad":
        # layer1 inner widths zero-padded 64 -> 128 (MXU lane fill)
        out = bench_train(optimized=True, pad_width=128)
    elif mode == "train_rm":
        # + per-bottleneck backbone remat (recompute vs HBM round-trips)
        out = bench_train(optimized=True, fold_normalize=True,
                          backbone_remat=True)
    elif mode == "train_rm1":
        # remat layer1 only (59% of the backbone fwd+bwd per conv_profile)
        out = bench_train(optimized=True, fold_normalize=True,
                          remat_stages=(1,))
    elif mode == "rec_int8":
        # + int8 PTQ of the backbone bottleneck convs (--quantize_int8)
        out = bench_rec(fold_normalize=True, quantize=True)
    elif mode == "rec_int8_full":
        # int8 PTQ of backbone + BERT + VL transformer (quantize_scope)
        out = bench_rec(fold_normalize=True, quantize=True,
                        quantize_scope=("backbone", "bert", "vl"))
    elif mode == "rec_blk":
        # serving with layer1 on the 2x2 space-to-depth grid
        out = bench_rec(fold_normalize=True, block_layer1=True)
        out["metric"] = "inference_blk_images_per_sec_per_chip"
    elif mode == "rec_blk_int8":
        out = bench_rec(fold_normalize=True, quantize=True, block_layer1=True,
                        quantize_scope=("backbone", "bert", "vl"))
        out["metric"] = "inference_blk_int8_images_per_sec_per_chip"
    elif mode == "rec_exported":
        # serving through the deployment artifact (tools/export_model.py)
        out = bench_exported()
    elif mode == "rec_fn":
        # serving path with normalize folded into the stem (no s2d: the
        # s2d stem is a training-only win, PERFORMANCE.md)
        out = bench_rec(fold_normalize=True)
    elif mode == "seg_fn":
        out = bench_seg(fold_normalize=True)
    elif mode == "seg_int8":
        out = bench_seg(fold_normalize=True, quantize=True)
    elif mode == "serve_pipeline":
        # MicroBatcher double-buffered dispatch overlap, ON vs OFF
        out = bench_serve_pipeline()
    elif mode == "latency":
        # p50/p90 per-image serving latency at B=1 (BASELINE.md target);
        # `python bench.py latency 8` measures per-image latency at B=8
        out = bench_latency()
    else:
        raise SystemExit(f"unknown mode {mode}")
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
