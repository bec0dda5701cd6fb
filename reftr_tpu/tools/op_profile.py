"""Op-level device-time breakdown of a production step (xprof).

Captures a `jax.profiler` trace of a jitted step at one of the bench.py
configurations and prints the top ops by self time, parsed offline with
the xprof/tensorboard-profile converter — the round-2/3 optimization
rounds ran this flow by hand; this makes it a repo tool (SURVEY.md §5
L7 observability; the reference's only profiling is iter-time meters,
util/misc.py:198-250).

Usage (on the TPU):
    python -m reftr_tpu.tools.op_profile [rec|rec_int8|train] [topk]

Writes the raw trace under /tmp/reftr_opprof* (inspectable with
`xprof --logdir` or tensorboard) and prints a rank table.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import tempfile

import numpy as np


def _build_step(mode: str):
    import dataclasses as dc

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))))
    import bench
    from reftr_tpu.core.config import ModelConfig, RefTRConfig
    from reftr_tpu.models import build_model

    if mode == "train":
        from reftr_tpu.core.config import LossConfig, TrainConfig
        from reftr_tpu.models.criterion import weight_dict
        from reftr_tpu.train.optimizer import build_optimizer, trainable_mask
        from reftr_tpu.train.schedules import build_schedule
        from reftr_tpu.train.state import TrainState
        from reftr_tpu.train.steps import make_train_step

        mc = ModelConfig(dtype="bfloat16", aux_loss=True,
                         space_to_depth_stem=True, fold_bn=True)
        cfg = RefTRConfig(model=mc)
        model, _ = build_model(cfg)
        rng = np.random.default_rng(0)
        b = 32
        batch = bench.make_batch(rng, b, cfg.data.img_size,
                                 cfg.data.max_query_len,
                                 mc.bert.vocab_size, uint8=True)
        targets = {"boxes": rng.uniform(0.3, 0.6, (b, 1, 4)).astype(
            np.float32), "box_valid": np.ones((b, 1), bool)}
        params = jax.jit(model.init)(jax.random.PRNGKey(0), batch)["params"]
        tc = TrainConfig(lr=1e-4)
        state = TrainState.create(
            params, build_optimizer(mc, tc, build_schedule(tc, 100)),
            jax.random.PRNGKey(1))
        lc = LossConfig()
        step = make_train_step(model, weight_dict(lc, mc.dec_layers, True),
                               lc, world_size=1, donate=False,
                               trainable_mask=trainable_mask(mc, tc, params))
        batch, targets = jax.device_put((batch, targets))
        holder = {"state": state}

        def run(i):
            holder["state"], m = step(holder["state"], batch, targets)
            np.asarray(m["loss"])
        return run

    quantize = mode == "rec_int8"
    if mode == "tiny":  # test/CPU mode: micro model, 64px
        from reftr_tpu.core.config import BertConfig

        mc = ModelConfig(enc_layers=1, dec_layers=1, dim_feedforward=64,
                         hidden_dim=32, nheads=4, bert=BertConfig.tiny(),
                         aux_loss=False)
        b, hw = 2, 64
    else:
        mc = ModelConfig(dtype="bfloat16", aux_loss=False, fold_bn=True,
                         fold_normalize=True)
        b, hw = 64, None
    cfg = RefTRConfig(model=mc)
    model, _ = build_model(cfg)
    rng = np.random.default_rng(0)
    batch = bench.make_batch(rng, b, hw or cfg.data.img_size,
                             cfg.data.max_query_len, mc.bert.vocab_size,
                             uint8=mode != "tiny")
    params = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    batch = jax.device_put(batch)
    if quantize:
        from reftr_tpu.nn.quant import quantize_params

        calib_model, _ = build_model(RefTRConfig(model=dc.replace(
            mc, quant_calibrate=True)))
        _, var = jax.jit(lambda p, x: calib_model.apply(
            p, x, mutable=["calib"]))(params, batch)
        params = jax.device_put({"params": quantize_params(
            jax.device_get(params["params"]), jax.device_get(var["calib"]),
            scope=mc.quantize_scope)})
        model, _ = build_model(RefTRConfig(model=dc.replace(
            mc, quantize_int8=True)))

    @jax.jit
    def fwd(p, x, i):
        if x["image"].dtype == jnp.uint8:
            img = ((x["image"].astype(jnp.int32) + i) % 256
                   ).astype(jnp.uint8)
        else:
            img = x["image"] + i.astype(jnp.float32) * 1e-6
        return model.apply(p, dict(x, image=img))["pred_boxes"]

    def run(i):
        np.asarray(fwd(params, batch, jnp.int32(i)))
    return run


def profile(mode: str = "rec", topk: int = 25, steps: int = 3):
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.dirname(os.path.abspath(__file__)))),
                          ".jax_cache"))
    run = _build_step(mode)
    for i in range(2):  # compile + warm
        run(i)
    logdir = tempfile.mkdtemp(prefix="reftr_opprof_")
    with jax.profiler.trace(logdir):
        for i in range(steps):
            run(10 + i)

    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        raise RuntimeError(f"no xplane trace written under {logdir}")
    from xprof.convert import raw_to_tool_data as r2t

    data, _ = r2t.xspace_to_tool_data(paths, "framework_op_stats", {})
    table = json.loads(data)
    # gviz table: first entry = device ops
    cols = [c["id"] for c in table[0]["cols"]]
    rows = [[c.get("v") for c in r["c"]] for r in table[0]["rows"]]
    idx = {k: i for i, k in enumerate(cols)}
    dev = [r for r in rows
           if str(r[idx["host_or_device"]]).lower() == "device"
           and r[idx["type"]] != "IDLE"]
    kind = "device"
    if not dev:  # CPU backend: xprof emits a host plane only
        dev = [r for r in rows if r[idx["type"]] != "IDLE"]
        kind = "host"
    dev.sort(key=lambda r: -float(r[idx["total_self_time"]]))
    total = sum(float(r[idx["total_self_time"]]) for r in dev) or 1.0
    print(f"mode={mode}  trace={logdir}  {kind} ops={len(dev)}  "
          f"total self time={total / 1e3:.3f} ms (x{steps} steps)")
    print(f"{'self ms':>9} {'%':>6} {'occ':>5} {'bound':>8}  operation")
    for r in dev[:topk]:
        t = float(r[idx["total_self_time"]])
        occ = int(float(r[idx["occurrences"]]))
        bound = str(r[idx["bound_by"]])[:8]
        name = str(r[idx["operation"]])[:80]
        print(f"{t / 1e3:9.3f} {100 * t / total:6.2f} {occ:>5} {bound:>8}"
              f"  {name}")
    return dev, idx


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "rec"
    topk = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    profile(mode, topk)
