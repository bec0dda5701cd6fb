"""End-to-end learning: the model trains to accuracy_iou0.5 >= 0.9 on the
synthetic fixture — single-phrase and multi-phrase — replacing round 1's
weak `loss < first*1.5` assertion (the reference's own correctness story is
eval-as-test, SURVEY.md §4; this is the fixture-scale equivalent).

Recipe calibrated on the suite's CPU backend: stride-16 (DC5) features at
64px, bbox_loss_coef=5 (the DETR weighting), lr 3e-3 cosine over the
budget, 17-31px boxes (box_frac 0.25-0.5) so IoU@0.5 tests localization
rather than sub-stride regression precision. Single-phrase reaches 0.92 by
~epoch 50 and 0.95 by ~epoch 65 of a 100-epoch budget.
"""

import tempfile

import jax
import numpy as np
import pytest

from reftr_tpu.core.config import BertConfig, LossConfig, ModelConfig, TrainConfig
from reftr_tpu.data.datasets import (
    SyntheticGroundingDataset,
    SyntheticMultiPhraseDataset,
    write_synthetic_vocab,
)
from reftr_tpu.data.loader import DataLoader
from reftr_tpu.data.native import WordPieceTokenizer
from reftr_tpu.models.criterion import weight_dict
from reftr_tpu.models.reftr import RefTR
from reftr_tpu.train.optimizer import build_optimizer
from reftr_tpu.train.schedules import build_schedule
from reftr_tpu.train.state import TrainState
from reftr_tpu.train.steps import make_eval_step, make_train_step


def _accuracy(model, params, batches, wd, lc):
    eval_step = make_eval_step(model, wd, lc, world_size=1)
    sums = {"sum_accu": 0.0, "cnt": 0.0}
    for b, t in batches:
        _, _, s = eval_step(params, b, dict(t))
        for k in sums:
            sums[k] += float(s[k])
    return sums["sum_accu"] / sums["cnt"]


def _int8_accuracy(mc, lc, wd, state, batches):
    """Serving flow on the trained state: fold BN -> calibrate -> int8,
    at the full default quantize_scope (backbone convs + BERT and VL
    transformer denses).

    Exercises the QuantConv x DC5-dilation composition (mc.dilation=True)
    and transformer QuantDense on a CONVERGED model — the strongest
    available accuracy evidence for --quantize_int8 without real data."""
    import dataclasses as dc

    from reftr_tpu.nn.fold import optimize_resnet_params
    from reftr_tpu.nn.quant import quantize_params

    params = jax.device_get(state.params)
    params = dict(params, img_backbone=optimize_resnet_params(
        params["img_backbone"], fold_bn=True))
    mc_fold = dc.replace(mc, fold_bn=True)
    calib_model = RefTR(dc.replace(mc_fold, quant_calibrate=True))
    _, var = calib_model.apply({"params": params}, batches[0][0],
                               deterministic=True, mutable=["calib"])
    qmodel = RefTR(dc.replace(mc_fold, quantize_int8=True))
    qparams = quantize_params(params, jax.device_get(var["calib"]),
                              scope=mc_fold.quantize_scope)
    return _accuracy(qmodel, qparams, batches, wd, lc)


def _train_to_accuracy(dataset, reftr_type, epochs, target=0.9,
                       check_int8=False):
    loader = DataLoader(dataset, 32, num_workers=2)
    mc = ModelConfig(reftr_type=reftr_type, enc_layers=1, dec_layers=1,
                     dim_feedforward=64, hidden_dim=32, nheads=4,
                     bert=BertConfig.tiny(), aux_loss=False, dilation=True,
                     dtype="float32")
    tc = TrainConfig(lr=3e-3, warm_up_epoch=2, epochs=epochs,
                     lr_schedule="CosineWarmupLR")
    lc = LossConfig(bbox_loss_coef=5.0)
    model = RefTR(mc)
    batches = [(dict(s), {k: v for k, v in t.items()
                          if k in ("boxes", "box_valid")})
               for s, t in loader]
    params = model.init(jax.random.PRNGKey(0), batches[0][0])["params"]
    tx = build_optimizer(mc, tc, build_schedule(tc, len(batches)))
    state = TrainState.create(params, tx, jax.random.PRNGKey(1))
    wd = weight_dict(lc, mc.dec_layers, mc.aux_loss)
    step = make_train_step(model, wd, lc, world_size=1)
    eval_step = make_eval_step(model, wd, lc, world_size=1)

    best = 0.0
    for ep in range(epochs):
        for b, t in batches:
            state, m = step(state, b, t)
        assert np.isfinite(float(m["loss"])), f"loss diverged at epoch {ep}"
        if ep % 5 == 4:
            sums = {"sum_accu": 0.0, "sum_iou": 0.0, "cnt": 0.0}
            for b, t in batches:
                _, _, s = eval_step(state.params, b, dict(t))
                for k in sums:
                    sums[k] += float(s[k])
            best = max(best, sums["sum_accu"] / sums["cnt"])
            if best >= target:
                break
    if check_int8 and best >= target:
        acc8 = _int8_accuracy(mc, lc, wd, state, batches)
        assert acc8 >= best - 0.05, (
            f"int8 PTQ accuracy {acc8:.3f} vs fp {best:.3f}: quantization "
            "cost more than 5 points on a converged model")
    return best


@pytest.fixture(scope="module")
def synth_tok():
    return WordPieceTokenizer(
        write_synthetic_vocab(tempfile.mktemp(suffix=".txt")))


@pytest.mark.slow
def test_single_phrase_learns_to_90pct(synth_tok):
    ds = SyntheticGroundingDataset(synth_tok, n=64, img_size=64,
                                   max_query_len=12, box_frac=(0.25, 0.5))
    acc = _train_to_accuracy(ds, "transformer_single_phrase", epochs=100,
                             check_int8=True)
    assert acc >= 0.9, f"accuracy_iou0.5 only reached {acc:.3f}"


@pytest.mark.slow
def test_multi_phrase_learns_to_90pct(synth_tok):
    ds = SyntheticMultiPhraseDataset(synth_tok, n=64, img_size=64,
                                     box_frac=(0.25, 0.5))
    acc = _train_to_accuracy(ds, "transformer_multi_phrase", epochs=100)
    assert acc >= 0.9, f"accuracy_iou0.5 only reached {acc:.3f}"


@pytest.mark.slow
def test_segmentation_learns_seg_miou(synth_tok):
    """RefTRSeg end to end: focal+dice training on the synthetic mask
    fixture reaches seg_miou >= 0.85 (calibrated: 0.90 by ~epoch 40,
    0.93 by ~epoch 50). Box accuracy is not asserted here — the REC
    learning tests above cover it; the seg model supervises boxes on the
    last decoder layer only and converges slower on localization."""
    from reftr_tpu.models.reftr_seg import RefTRSeg

    ds = SyntheticGroundingDataset(synth_tok, n=64, img_size=64,
                                   max_query_len=12, with_masks=True,
                                   box_frac=(0.25, 0.5))
    loader = DataLoader(ds, 32, num_workers=2)
    # mask head GroupNorm(8) needs its channel schedule divisible by 8:
    # hidden 128 / 8 heads (the seg parity tests' shape)
    mc = ModelConfig(enc_layers=1, dec_layers=1, dim_feedforward=256,
                     hidden_dim=128, nheads=8, bert=BertConfig.tiny(),
                     aux_loss=False, masks=True, dilation=True,
                     dtype="float32")
    tc = TrainConfig(lr=3e-3, warm_up_epoch=2, epochs=60,
                     lr_schedule="CosineWarmupLR")
    lc = LossConfig(bbox_loss_coef=5.0)
    model = RefTRSeg(mc)
    keep = ("boxes", "box_valid", "masks", "mask_valid")
    batches = [(dict(s), {k: v for k, v in t.items() if k in keep})
               for s, t in loader]
    params = model.init(jax.random.PRNGKey(0), batches[0][0])["params"]
    tx = build_optimizer(mc, tc, build_schedule(tc, len(batches)))
    state = TrainState.create(params, tx, jax.random.PRNGKey(1))
    wd = weight_dict(lc, mc.dec_layers, mc.aux_loss, with_masks=True)
    step = make_train_step(model, wd, lc, world_size=1, with_masks=True)
    eval_step = make_eval_step(model, wd, lc, world_size=1, with_masks=True)

    best = 0.0
    for ep in range(tc.epochs):
        for b, t in batches:
            state, m = step(state, b, t)
        assert np.isfinite(float(m["loss"])), f"loss diverged at epoch {ep}"
        if ep % 5 == 4:
            sums = {"sum_seg_iou": 0.0, "cnt_seg": 0.0}
            for b, t in batches:
                _, _, s = eval_step(state.params, b, dict(t))
                for k in sums:
                    sums[k] += float(s[k])
            best = max(best, sums["sum_seg_iou"] / sums["cnt_seg"])
            if best >= 0.85:
                return
    assert best >= 0.85, f"seg_miou only reached {best:.3f}"
