"""Top-level training driver.

Rebuilds /root/reference/main_vg.py:167-431 (main()):
  * per-process seeding with seed + process_index (:174-177),
  * dataset/loader/model/optimizer assembly,
  * pretrained init: reference .pth checkpoints are converted on the fly
    (nn.convert.convert_reftr), our own orbax checkpoints restore directly;
    both merge non-strictly with missing/unexpected key reports (:298-349),
  * auto-resume from <output_dir>/checkpoint (:299-303), resume_model_only,
  * epoch loop with per-epoch eval on every test split, best-checkpoint
    tracking on accuracy_iou0.5 of the FIRST split (:399-412), periodic
    checkpoint{epoch:04d} on lr_drop/ckpt_cycle boundaries (:373-376),
  * JSONL epoch logging to log.txt (:419-421), eval-only mode (:351-361),
  * bounded run_epoch chunking for time-limited queues (:158-159,365).
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

import jax
import numpy as np

from reftr_tpu.core import checkpoint as ckpt_lib
from reftr_tpu.core import hub
from reftr_tpu.core.config import RefTRConfig
from reftr_tpu.core.distributed import initialize, is_main_process
from reftr_tpu.core.logging import log_stats, master_print
from reftr_tpu.data.build import build_refer_dataset
from reftr_tpu.data.loader import DataLoader
from reftr_tpu.data.native import WordPieceTokenizer
from reftr_tpu.data.samplers import NodeShardedSampler, ShardedSampler
from reftr_tpu.models import build_model
from reftr_tpu.models.criterion import weight_dict as build_weight_dict
from reftr_tpu.parallel.sharding import create_mesh
from reftr_tpu.train.engine import evaluate, train_one_epoch
from reftr_tpu.train.optimizer import build_optimizer
from reftr_tpu.train.schedules import build_schedule
from reftr_tpu.train.state import TrainState
from reftr_tpu.train.steps import (
    donation_is_safe,
    make_eval_step,
    make_train_step,
    shard_state,
)


def build_tokenizer(cfg: RefTRConfig):
    """bert-*: <data_root>/<bert_model>/vocab.txt (WordPiece);
    roberta-*: <data_root>/<bert_model>/{vocab.json,merges.txt} (byte BPE);
    or an explicit vocab file path as bert_model."""
    if cfg.model.bert_model.split("-")[0] == "roberta":
        from reftr_tpu.data.native import ByteLevelBPETokenizer

        d = os.path.join(cfg.data.data_root, cfg.model.bert_model)
        for base in (d, cfg.model.bert_model, cfg.data.data_root):
            vj = os.path.join(base, "vocab.json")
            mt = os.path.join(base, "merges.txt")
            if os.path.isfile(vj) and os.path.isfile(mt):
                return ByteLevelBPETokenizer(vj, mt)
        raise FileNotFoundError(
            f"no vocab.json/merges.txt for {cfg.model.bert_model} under "
            f"{cfg.data.data_root}")
    candidates = [
        cfg.model.bert_model,
        os.path.join(cfg.data.data_root, cfg.model.bert_model, "vocab.txt"),
        os.path.join(cfg.data.data_root, "vocab.txt"),
    ]
    for c in candidates:
        if os.path.isfile(c):
            return WordPieceTokenizer(c)
    if cfg.data.dataset == "synthetic":
        import tempfile

        from reftr_tpu.data.datasets import write_synthetic_vocab

        path = os.path.join(tempfile.gettempdir(), "reftr_synth_vocab.txt")
        write_synthetic_vocab(path)
        return WordPieceTokenizer(path)
    raise FileNotFoundError(
        f"no vocab.txt found (searched {candidates}); place the bert vocab "
        f"under the data root or pass an explicit file path as bert_model")


def build_loaders(cfg: RefTRConfig, tokenizer, num_shards: int = 0,
                  shard_rank: int = 0):
    """num_shards/shard_rank: the input-pipeline sharding. Defaults to one
    shard per process (the reference's DDP layout); run_training derives it
    from the mesh via parallel.sharding.loader_shards so cross-host tensor
    parallelism gets replicated loading within each model-parallel group."""
    d = cfg.data
    if not num_shards:
        num_shards, shard_rank = jax.process_count(), jax.process_index()
    train_ds = build_refer_dataset(d.train_split, d, tokenizer, train=True,
                                   masks=cfg.model.masks, seed=cfg.train.seed)
    sampler_cls = NodeShardedSampler if d.cache_mode else ShardedSampler
    kwargs = dict(num_replicas=num_shards,
                  rank=shard_rank, seed=cfg.train.seed)
    if d.cache_mode:
        kwargs.update(local_rank=0, local_size=1)
    train_loader = DataLoader(
        train_ds, d.batch_size,
        sampler=sampler_cls(len(train_ds), shuffle=True, **kwargs),
        num_workers=d.num_workers, drop_last=True)
    test_loaders = {}
    for split in d.test_splits:
        ds = build_refer_dataset(split, d, tokenizer, train=False,
                                 masks=cfg.model.masks, seed=cfg.train.seed)
        test_loaders[split] = DataLoader(
            ds, d.batch_size,
            sampler=ShardedSampler(len(ds), shuffle=False, **{
                k: v for k, v in kwargs.items() if k != "seed"}, seed=0),
            num_workers=d.num_workers, drop_last=False)
    return train_loader, test_loaders


def _load_pretrained(params, path: str, cfg: RefTRConfig):
    if hub.is_url(path):
        # URL checkpoints (main_vg.py:307-309); the released .pth files
        path = hub.download_checkpoint(path, progress_fn=master_print)
    if path.endswith((".pth", ".pt", ".bin")):
        from reftr_tpu.nn.convert import convert_reftr, load_torch_checkpoint

        sd = load_torch_checkpoint(path)
        if any(k.startswith("transformer.encoder") for k in sd):
            # DETR checkpoint: backbone + encoder surgery
            # (reftr_transformer.py:137-146)
            from reftr_tpu.nn.convert import convert_encoder, convert_resnet

            pre = {
                "img_backbone": convert_resnet(
                    sd, cfg.model.backbone, prefix="backbone.0.body."),
                "vl_transformer": {"encoder": convert_encoder(
                    sd, cfg.model.enc_layers, "transformer.encoder.")},
            }
        else:
            pre = convert_reftr(
                sd, cfg.model.enc_layers, cfg.model.dec_layers,
                cfg.model.bert.num_hidden_layers, cfg.model.backbone,
                cfg.model.num_feature_levels)
        from reftr_tpu.nn.fold import optimize_backbone_in_tree

        pre = optimize_backbone_in_tree(pre, cfg.model)
        return ckpt_lib.load_pretrained_nonstrict(params, pre,
                                                  log=master_print)
    # our own orbax checkpoint
    payload, _ = ckpt_lib.restore_checkpoint(
        os.path.dirname(path) or ".", os.path.basename(path),
        {"params": params}, partial=True)
    return ckpt_lib.load_pretrained_nonstrict(params, payload["params"],
                                              log=master_print)


def run_training(cfg: RefTRConfig) -> Dict:
    # persistent compilation cache: remote (tunnel) compiles of the
    # flagship train/eval steps take ~10 min; without this every run —
    # and every auto-resume restart — pays them again
    if not jax.config.jax_compilation_cache_dir:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.dirname(os.path.abspath(__file__)))), ".jax_cache"))
    initialize()
    mesh = create_mesh(cfg.mesh)
    # Input sharding follows the MESH, not the process count: processes
    # sharing a data row (model axis spanning hosts) are input replicas and
    # must load — and augment — identical data, hence the shard_rank seed.
    from reftr_tpu.parallel.sharding import loader_shards

    n_shards, shard_rank = loader_shards(mesh)
    np.random.seed(cfg.train.seed + shard_rank)

    tokenizer = build_tokenizer(cfg)
    train_loader, test_loaders = build_loaders(cfg, tokenizer, n_shards,
                                               shard_rank)
    steps_per_epoch = len(train_loader)
    master_print(f"Steps per training epoch: {steps_per_epoch}")

    # int8 PTQ (nn/quant.py) applies AFTER fp load+folds+calibration, so
    # everything up to eval runs on the fp twin of the config.
    import dataclasses as _dc

    if cfg.model.quantize_int8:
        if not cfg.train.eval_only:
            raise ValueError(
                "--quantize_int8 is a serving/eval optimization (PTQ needs "
                "frozen weights); train without it, then --eval")
        if not cfg.model.fold_bn:
            raise ValueError("--quantize_int8 requires --fold_bn (the BN "
                             "scale must fold into the conv kernel)")
    fp_cfg = _dc.replace(cfg, model=_dc.replace(cfg.model,
                                                quantize_int8=False))

    model, wdict = build_model(fp_cfg)
    world = mesh.shape["data"]

    sample_batch, _ = next(iter(train_loader))
    rng = jax.random.PRNGKey(cfg.train.seed)
    fold_flags = (cfg.model.space_to_depth_stem or cfg.model.fold_bn
                  or cfg.model.fold_normalize or cfg.model.backbone_pad_width
                  or cfg.model.block_layer1)
    if fold_flags:
        if cfg.model.fold_normalize and not cfg.train.eval_only:
            # measured (PERFORMANCE.md r3): from-scratch training with the
            # normalize fold converges far slower (fixture acc 0.31 vs
            # 0.77 at epoch 24) even with the stem frozen; it is a
            # serving/eval optimization
            master_print(
                "WARNING: --fold_normalize degrades TRAINING convergence "
                "(measured); use it for --eval/serving only and train with "
                "--space_to_depth_stem --fold_bn instead")
        # the stem/BN/normalize folds are WEIGHT transforms: a from-scratch
        # run must initialize the STANDARD backbone and fold those params,
        # or (with fold_normalize especially) a standard-scale random stem
        # kernel would see raw 0..255 inputs and training stalls. Pretrained
        # loads below overwrite this with the fold of the checkpoint.
        from reftr_tpu.nn.fold import optimize_backbone_in_tree

        base_model, _ = build_model(_dc.replace(
            fp_cfg, model=_dc.replace(
                fp_cfg.model, space_to_depth_stem=False, fold_bn=False,
                fold_normalize=False, backbone_pad_width=0,
                block_layer1=False, quantize_train_prefix=False)))
        params = base_model.init(rng, sample_batch)["params"]
        params = optimize_backbone_in_tree(params, cfg.model)
    else:
        params = model.init(rng, sample_batch)["params"]
    n_params = sum(int(np.prod(x.shape))
                   for x in jax.tree_util.tree_leaves(params))
    master_print(f"n_parameters: {n_params}")

    if cfg.train.pretrained_model:
        params = _load_pretrained(params, cfg.train.pretrained_model, cfg)

    if cfg.model.quantize_train_prefix:
        # frozen stem+layer1 in int8 during TRAINING (nn/quant.py): rewrite
        # happens BEFORE state creation so the optimizer state and any
        # checkpoint resume below see the quantized tree layout.
        from reftr_tpu.nn.quant import calibrate_train_prefix

        params = calibrate_train_prefix(
            fp_cfg, params, train_loader,
            n_batches=cfg.train.quant_calib_batches, print_fn=master_print)

    schedule = build_schedule(cfg.train, steps_per_epoch)
    tx = build_optimizer(cfg.model, cfg.train, schedule)
    # NB: the state rng must be IDENTICAL on every process — it is a
    # replicated operand of the global SPMD train step (per-sample dropout
    # variation comes from the key + each sample's position in the global
    # batch). The reference's per-rank seed+rank (main_vg.py:174-177) maps
    # onto the HOST-side np seed above (per-process data augmentation),
    # not onto the in-step key.
    state = TrainState.create(params, tx, jax.random.PRNGKey(cfg.train.seed))

    # ---- resume ----
    out_dir = cfg.train.output_dir
    start_epoch = cfg.train.start_epoch
    best_val_acc = 0.0
    resume = cfg.train.resume
    if not resume and cfg.train.auto_resume and out_dir and \
            ckpt_lib.checkpoint_exists(out_dir, "checkpoint"):
        resume = os.path.join(out_dir, "checkpoint")
    if resume and hub.is_url(resume):
        # https:// resume (main_vg.py:307-309). Torch URL checkpoints carry
        # a torch optimizer state we cannot map onto optax, so a URL resume
        # restores MODEL WEIGHTS ONLY (the reference's live use of this path
        # is eval/fine-tune from released checkpoints, which needs no
        # optimizer state).
        state = state.replace(
            params=_load_pretrained(state.params, resume, cfg))
        master_print(f"Resumed model weights from URL {resume}")
        resume = None
    if resume:
        rdir, rname = os.path.dirname(resume) or ".", os.path.basename(resume)
        if cfg.train.resume_model_only:
            payload, meta = ckpt_lib.restore_checkpoint(
                rdir, rname, {"params": state.params}, partial=True)
            state = state.replace(params=payload["params"])
        else:
            payload, meta = ckpt_lib.restore_checkpoint(
                rdir, rname,
                {"params": state.params, "opt_state": state.opt_state})
            state = state.replace(
                params=payload["params"], opt_state=payload["opt_state"],
                step=np.asarray(meta.get("step", 0), np.int32))
            start_epoch = int(meta.get("epoch", -1)) + 1
            best_val_acc = float(meta.get("best_val_acc", 0.0))
        master_print(f"Resumed from {resume} at epoch {start_epoch}")

    donate = cfg.train.donate_state
    if donate and not donation_is_safe():
        master_print("state donation disabled: unsafe on platform selection "
                     f"'{jax.config.jax_platforms}' (see train/steps.py)")
        donate = False
    train_step = make_train_step(model, wdict, cfg.loss, world_size=world,
                                 with_masks=cfg.model.masks,
                                 donate=donate,
                                 lr_fn=lambda s: cfg.train.lr * schedule(s),
                                 mesh=mesh)
    eval_step = make_eval_step(model, wdict, cfg.loss, world_size=world,
                               with_masks=cfg.model.masks, mesh=mesh)

    def run_eval(params) -> Dict[str, Dict]:
        all_stats = {}
        for split, loader in test_loaders.items():
            vis_dir = ""
            if cfg.train.eval_only and cfg.train.visualize and out_dir:
                vis_dir = out_dir
            stats, results = evaluate(
                eval_step, params, loader, mesh,
                with_masks=cfg.model.masks, weight_dict=wdict,
                collect_results=bool(out_dir), print_fn=master_print,
                visualize_dir=vis_dir)
            master_print(f"[{split}] " + json.dumps(
                {k: round(v, 4) for k, v in stats.items()}))
            if out_dir and is_main_process():
                os.makedirs(out_dir, exist_ok=True)
                with open(os.path.join(
                        out_dir,
                        f"{cfg.data.dataset}_{split}_result.json"), "w") as f:
                    json.dump(results, f)
            all_stats[split] = stats
        return all_stats

    with mesh:
        state = shard_state(state, mesh)

        if cfg.train.eval_only:
            if cfg.model.quantize_int8:
                from reftr_tpu.nn.quant import calibrate_and_quantize

                state = state.replace(params=calibrate_and_quantize(
                    fp_cfg, state.params,
                    next(iter(test_loaders.values())), mesh=mesh,
                    n_batches=cfg.train.quant_calib_batches,
                    print_fn=master_print))
                qmodel, _ = build_model(cfg)
                eval_step = make_eval_step(
                    qmodel, wdict, cfg.loss, world_size=world,
                    with_masks=cfg.model.masks, mesh=mesh)
            return {"test": run_eval(state.params)}

        end_epoch = min(cfg.train.epochs, start_epoch + cfg.train.run_epoch)
        history = []
        for epoch in range(start_epoch, end_epoch):
            train_loader.set_epoch(epoch)
            t0 = time.time()
            state, train_stats = train_one_epoch(
                train_step, state, train_loader, epoch, mesh,
                weight_dict=wdict, print_fn=master_print,
                profile_dir=cfg.train.profile_dir)
            test_stats = run_eval(state.params)

            # update best FIRST so the per-epoch checkpoint's meta carries
            # the current best (else an auto-resume could later overwrite
            # checkpoint_best with a worse model)
            first_split = next(iter(test_stats)) if test_stats else None
            if first_split:
                acc = test_stats[first_split].get("accuracy_iou0.5", 0.0)
                if acc > best_val_acc:
                    best_val_acc = acc
                    master_print(
                        f"new best accuracy_iou0.5 {best_val_acc:.4f}")
                    if out_dir and is_main_process():
                        ckpt_lib.save_checkpoint(
                            out_dir, "checkpoint_best",
                            jax.device_get(state.params), None,
                            int(state.step), epoch, best_val_acc, cfg)

            if out_dir and is_main_process():
                ckpt_lib.save_checkpoint(
                    out_dir, "checkpoint", jax.device_get(state.params),
                    jax.device_get(state.opt_state), int(state.step), epoch,
                    best_val_acc, cfg)
                if (epoch + 1) % cfg.train.lr_drop == 0 or \
                        (epoch + 1) % cfg.train.ckpt_cycle == 0:
                    ckpt_lib.save_checkpoint(
                        out_dir, f"checkpoint{epoch:04d}",
                        jax.device_get(state.params), None, int(state.step),
                        epoch, best_val_acc, cfg)

            log_entry = {
                **{f"train_{k}": v for k, v in train_stats.items()},
                **{f"test_{s}_{k}": v for s, st in test_stats.items()
                   for k, v in st.items()},
                "epoch": epoch,
                "n_parameters": n_params,
                "epoch_time": round(time.time() - t0, 1),
            }
            log_stats(out_dir, log_entry)
            history.append(log_entry)
    return {"history": history, "best_val_acc": best_val_acc}
