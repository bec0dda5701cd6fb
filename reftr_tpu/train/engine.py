"""Epoch-level train/eval engine.

Rebuilds /root/reference/engine_vg.py: train_one_epoch (:22-78) and
evaluate (:81-225) around the jitted steps:

  * training: prefetched loader -> one fused jitted step per batch; the
    NaN tripwire (loss non-finite -> hard exit, :55-58) is preserved but
    checked on the PREVIOUS step's async result so the device never stalls,
  * grad-norm logging, per-50-step smoothed meters,
  * evaluation: jitted forward+metrics per batch; host accumulates raw sums
    and all-reduces across processes (:207-219); P@0.5/mIoU in normalized
    coordinates; optional seg mIoU; scaled box decodes collected for the
    JSON result dump (:141,200).
"""

from __future__ import annotations

import math
import sys
from typing import Any, Dict, Optional

import jax
import numpy as np

from reftr_tpu.core.distributed import allreduce_sum_host
from reftr_tpu.core.metrics import MetricLogger, SmoothedValue
from reftr_tpu.models.postprocess import decode_boxes, rec_metrics


TRAIN_KEYS_EXCLUDE = ("orig_size", "size", "image_id")


def _strip_target(t: Dict) -> Dict:
    return {k: v for k, v in t.items() if k not in TRAIN_KEYS_EXCLUDE}


def _log_train_metrics(metrics, weight_dict, logger, print_fn) -> None:
    """Host-convert one step's metrics, NaN-tripwire, and log. Loss
    components are logged SCALED by their loss weight under the plain
    names — the reference convention (engine_vg.py logs
    loss_dict_reduced_scaled) and what evaluate() below reports, so
    train/eval loss_bbox etc. are directly comparable. Loss components
    NOT in weight_dict are dropped, mirroring evaluate()'s filtering, so
    both paths report the same set of (scaled) keys; non-loss metrics
    (grad_norm, lr, the total loss) pass through unscaled."""
    host = {k: float(v) for k, v in metrics.items()}
    if not math.isfinite(host["loss"]):
        print_fn(f"Loss is {host['loss']}, stopping training")
        sys.exit(1)
    host = {k: v * weight_dict[k] if k in weight_dict else v
            for k, v in host.items()
            if k in weight_dict or not k.startswith("loss_")}
    logger.update(**host)


def train_one_epoch(
    train_step,
    state,
    loader,
    epoch: int,
    mesh=None,
    print_freq: int = 50,
    *,
    weight_dict: Dict[str, float],
    print_fn=print,
    profile_dir: str = "",
    profile_steps=(10, 15),
):
    """Returns (state, stats dict of epoch-global averages).

    profile_dir: when set (epoch 0 only), captures a jax.profiler trace of
    steps [profile_steps) — the rebuild's answer to the reference's lack of
    a profiler (SURVEY.md §5); view with tensorboard or xprof.
    """
    from reftr_tpu.train.steps import shard_batch

    logger = MetricLogger(print_fn=print_fn)
    logger.add_meter("lr", SmoothedValue(window_size=1, fmt="{value:.6f}"))
    header = f"Epoch: [{epoch}]"
    prev_metrics = None  # async NaN tripwire: consume step i-1 while i runs
    tracing = False
    i = 0
    for samples, targets in logger.log_every(loader, print_freq, header,
                                             total=len(loader)):
        if profile_dir and epoch == 0:
            if i == profile_steps[0]:
                jax.profiler.start_trace(profile_dir)
                tracing = True
            elif i == profile_steps[1] and tracing:
                jax.profiler.stop_trace()
                tracing = False
        targets = _strip_target(targets)
        if mesh is not None:
            samples = shard_batch(samples, mesh)
            targets = shard_batch(targets, mesh)
        state, metrics = train_step(state, samples, targets)
        # convert the PREVIOUS step's metrics while this one runs — the host
        # never blocks on the step it just dispatched
        if prev_metrics is not None:
            _log_train_metrics(prev_metrics, weight_dict, logger, print_fn)
        prev_metrics = metrics
        i += 1
    if tracing:
        jax.profiler.stop_trace()
    if prev_metrics is not None:
        _log_train_metrics(prev_metrics, weight_dict, logger, print_fn)
    logger.synchronize_between_processes()
    return state, {k: m.global_avg for k, m in logger.meters.items()}


def _dump_visuals(out_dir, idx_base, samples, targets, out):
    """Per-sample qualitative dumps (boxes at canvas scale, masks,
    attention), first query of the first phrase."""
    from reftr_tpu.models.postprocess import decode_boxes
    from reftr_tpu.ops.boxes import box_cxcywh_to_xyxy
    from reftr_tpu.tools.visualize import dump_eval_visuals

    images = np.asarray(samples["image"])
    if images.dtype != np.uint8:
        # invert the exact per-channel ImageNet normalization the pipeline
        # applied (ops/image.py)
        from reftr_tpu.ops.image import unnormalize_images

        images = unnormalize_images(images)
    sizes = np.asarray(targets["size"]).astype(np.float32)  # resized (h, w)
    pred = np.asarray(decode_boxes(out["pred_boxes"]))  # [B, P, 4] normalized
    gt = np.asarray(box_cxcywh_to_xyxy(np.asarray(targets["boxes"])))
    masks = out.get("pred_masks")
    att = out.get("mask_att")
    for i in range(images.shape[0]):
        h, w = sizes[i]
        scale = np.array([w, h, w, h], np.float32)
        pm = gm = at = None
        if masks is not None:
            import jax.image
            import jax.nn

            m = np.asarray(masks)[i, 0]
            H, W = images.shape[1:3]
            up = np.asarray(jax.image.resize(m, (H, W), method="linear"))
            pm = 1.0 / (1.0 + np.exp(-up)) > 0.5
        if "masks" in targets:
            gm = np.asarray(targets["masks"])[i]
        if att is not None:
            at = np.asarray(att)[i]
        dump_eval_visuals(out_dir, idx_base + i, images[i],
                          pred[i, 0] * scale, gt[i, 0] * scale,
                          pred_mask=pm, gt_mask=gm, attention=at)


def evaluate(
    eval_step,
    params,
    loader,
    mesh=None,
    with_masks: bool = False,
    weight_dict: Optional[Dict[str, float]] = None,
    print_freq: int = 50,
    collect_results: bool = False,
    print_fn=print,
    visualize_dir: str = "",
    visualize_limit: int = 64,
):
    """Returns (stats, results_dict). stats has accuracy_iou0.5 / miou
    (+ seg_miou); results_dict maps sample index -> scaled xyxy boxes.

    visualize_dir: when set, dumps qualitative JPEGs (pred+GT boxes, masks,
    attention heatmaps) for the first visualize_limit samples, mirroring
    the reference's --eval visualization (engine_vg.py:86-197)."""
    from reftr_tpu.train.steps import shard_batch

    logger = MetricLogger(print_fn=print_fn)
    sums = {"sum_accu": 0.0, "sum_iou": 0.0, "cnt": 0.0}
    if with_masks:
        sums.update({"sum_seg_iou": 0.0, "cnt_seg": 0.0})
    results_dict: Dict[int, Any] = {}
    idx_base = 0
    for samples, targets in logger.log_every(loader, print_freq, "Test:",
                                             total=len(loader)):
        full_targets = targets
        targets = _strip_target(targets)
        dev_samples, dev_targets = samples, targets
        if mesh is not None:
            dev_samples = shard_batch(samples, mesh)
            dev_targets = shard_batch(targets, mesh)
        out, losses, batch_sums = eval_step(params, dev_samples, dev_targets)
        if weight_dict:
            scaled = {k: float(v) * weight_dict[k]
                      for k, v in losses.items() if k in weight_dict}
            logger.update(loss=sum(scaled.values()), **scaled)
        for k in ("sum_accu", "sum_iou", "cnt"):
            sums[k] += float(batch_sums[k])
        if with_masks and "sum_seg_iou" in batch_sums:
            sums["sum_seg_iou"] += float(batch_sums["sum_seg_iou"])
            sums["cnt_seg"] += float(batch_sums["cnt_seg"])
        if visualize_dir and idx_base < visualize_limit:
            _dump_visuals(visualize_dir, idx_base, samples, full_targets, out)
        if collect_results:
            scaled_boxes = decode_boxes(
                out["pred_boxes"], full_targets["orig_size"].astype(np.float32),
                scale_to_original_shape=True)
            arr = np.asarray(scaled_boxes)
            valid = np.asarray(targets["box_valid"])
            ids = full_targets.get(
                "image_id", np.arange(idx_base, idx_base + arr.shape[0]))
            for i in range(arr.shape[0]):
                if not valid[i].any():
                    continue  # batch-padding row: don't clobber a real entry
                results_dict[int(ids[i])] = arr[i][valid[i]].tolist()
        idx_base += np.asarray(samples["image"]).shape[0]

    logger.synchronize_between_processes()
    sums = allreduce_sum_host(sums)
    stats = {k: m.global_avg for k, m in logger.meters.items()}
    stats["accuracy_iou0.5"] = sums["sum_accu"] / max(sums["cnt"], 1.0)
    stats["miou"] = sums["sum_iou"] / max(sums["cnt"], 1.0)
    if with_masks:
        stats["seg_miou"] = sums["sum_seg_iou"] / max(sums["cnt_seg"], 1.0)
    # do not report aux losses in stats (engine_vg.py:221-222)
    stats = {k: v for k, v in stats.items()
             if k.split("_")[-1] not in {"unscaled", "0", "1", "2", "3", "4"}}
    return stats, results_dict
