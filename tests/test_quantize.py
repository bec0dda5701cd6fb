"""Int8 post-training quantization of the backbone (nn/quant.py).

TPU-native serving feature with no reference counterpart (the reference
serves fp32 CUDA, models/modeling/backbone.py); these tests pin the
numerics contract: per-channel weight / per-tensor activation scales keep
the quantized backbone's features close to the fp ones, and the e2e
--quantize_int8 eval path reproduces the fp eval metrics.
"""

import dataclasses
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reftr_tpu.nn.fold import optimize_resnet_params
from reftr_tpu.nn.quant import (
    QuantConv,
    quantize_backbone_params,
    quantize_conv_kernel,
)
from reftr_tpu.nn.resnet import ResNet


def test_quantconv_matches_fp_conv():
    """int8 conv with exact scales stays within the quantization-noise
    bound of the fp conv."""
    rng = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(rng)
    x = jax.random.normal(k1, (2, 16, 16, 32), jnp.float32)
    kernel = jax.random.normal(k2, (3, 3, 32, 64), jnp.float32) * 0.1

    from flax import linen as nn

    fp = nn.Conv(64, (3, 3), padding=((1, 1), (1, 1)), use_bias=False)
    y_fp = fp.apply({"params": {"kernel": kernel}}, x)

    qp = quantize_conv_kernel(kernel, float(jnp.abs(x).max()))
    assert qp["kernel_q"].dtype == jnp.int8
    q = QuantConv(64, (3, 3), padding=((1, 1), (1, 1)))
    y_q = q.apply({"params": qp}, x)

    err = np.abs(np.asarray(y_fp) - np.asarray(y_q)).mean()
    ref = np.abs(np.asarray(y_fp)).mean()
    assert err / ref < 0.02, err / ref


def _jitter_bn(p, rs=np.random.RandomState(0)):
    """Randomize BN stats so fold+quantize is non-trivial."""
    out = {}
    for k, v in p.items():
        if isinstance(v, dict):
            out[k] = _jitter_bn(v, rs)
        elif k == "running_mean":
            out[k] = rs.randn(*v.shape).astype(np.float32) * 0.1
        elif k in ("running_var", "weight") and v.ndim == 1:
            out[k] = 1.0 + 0.3 * np.abs(rs.randn(*v.shape)).astype(
                np.float32)
        else:
            out[k] = v
    return out


def test_backbone_int8_close_to_fp():
    """Calibrate -> quantize -> compare features; stem must stay fp and
    every bottleneck conv must be int8."""
    rng = jax.random.PRNGKey(1)
    x = jax.random.normal(rng, (2, 64, 64, 3), jnp.float32)
    base = ResNet("resnet50")
    params = _jitter_bn(base.init(rng, x)["params"])
    folded = optimize_resnet_params(params, fold_bn=True)

    calib_model = ResNet("resnet50", fold_bn=True, sow_absmax=True)
    y_fp, var = calib_model.apply({"params": folded}, x, mutable=["calib"])
    qparams = quantize_backbone_params(folded, jax.device_get(var["calib"]))

    # structure: stem fp, bottleneck convs int8
    assert "kernel" in qparams["conv1"]
    for name, sub in qparams.items():
        if name.startswith("layer"):
            for cname in ("conv1", "conv2", "conv3"):
                assert sub[cname]["kernel_q"].dtype == jnp.int8, (name, cname)

    y_q = ResNet("resnet50", fold_bn=True, quantize=True).apply(
        {"params": qparams}, x)
    a = np.asarray(y_fp[0], np.float32)
    b = np.asarray(y_q[0], np.float32)
    cos = (a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9)
    rel = np.abs(a - b).mean() / (np.abs(a).mean() + 1e-9)
    assert cos > 0.995, cos
    assert rel < 0.06, rel


def test_quantize_requires_fold_bn():
    with pytest.raises(AssertionError):
        ResNet("resnet50", quantize=True).init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))


@pytest.mark.slow
def test_eval_only_quantize_e2e():
    """--eval --quantize_int8 end to end: train one epoch fp, then eval the
    checkpoint both fp and int8 — metrics must agree closely."""
    from tests.test_loop import micro_config

    from reftr_tpu.train.loop import run_training

    out = tempfile.mkdtemp()
    cfg = micro_config(out, epochs=1)
    cfg.model.fold_bn = True
    run_training(cfg)

    ecfg = micro_config(out, epochs=1)
    ecfg.model.fold_bn = True
    ecfg.train.eval_only = True
    ecfg.train.auto_resume = True
    fp_stats = run_training(ecfg)["test"]["val"]

    qcfg = dataclasses.replace(ecfg)
    qcfg.model = dataclasses.replace(ecfg.model, quantize_int8=True)
    q_stats = run_training(qcfg)["test"]["val"]

    assert np.isfinite(q_stats["loss"])
    # int8 noise on an undertrained model: losses agree to a few percent
    assert abs(q_stats["loss"] - fp_stats["loss"]) / fp_stats["loss"] < 0.05, (
        fp_stats, q_stats)
    assert abs(q_stats["miou"] - fp_stats["miou"]) < 0.03, (fp_stats, q_stats)


def test_quantize_rejects_training():
    from tests.test_loop import micro_config

    from reftr_tpu.train.loop import run_training

    cfg = micro_config(tempfile.mkdtemp(), epochs=1)
    cfg.model.fold_bn = True
    cfg.model.quantize_int8 = True
    with pytest.raises(ValueError, match="serving/eval"):
        run_training(cfg)
