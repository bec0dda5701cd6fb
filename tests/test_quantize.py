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
    QuantDense,
    quantize_backbone_params,
    quantize_conv_kernel,
    quantize_dense_kernel,
    quantize_params,
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


def test_quantdense_matches_fp_dense():
    rng = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(rng, 3)
    x = jax.random.normal(k1, (4, 40, 96), jnp.float32)
    kernel = jax.random.normal(k2, (96, 192), jnp.float32) * 0.1
    bias = jax.random.normal(k3, (192,), jnp.float32) * 0.05

    from flax import linen as nn

    y_fp = nn.Dense(192).apply(
        {"params": {"kernel": kernel, "bias": bias}}, x)

    qp = quantize_dense_kernel(kernel, bias, float(jnp.abs(x).max()))
    assert qp["kernel_q"].dtype == jnp.int8
    y_q = QuantDense(192).apply({"params": qp}, x)

    err = np.abs(np.asarray(y_fp) - np.asarray(y_q)).mean()
    ref = np.abs(np.asarray(y_fp)).mean()
    assert err / ref < 0.02, err / ref


def test_full_model_int8_close_to_fp():
    """Calibrate + quantize the WHOLE serving stack (backbone convs, BERT
    and VL-transformer projections/FFNs) on a small model; predicted boxes
    must track the fp model closely."""
    import dataclasses as dc

    from reftr_tpu.core.config import ModelConfig, RefTRConfig
    from reftr_tpu.models import build_model

    mc = ModelConfig(fold_bn=True, aux_loss=False,
                     quantize_scope=("backbone", "bert", "vl"))
    mc = dc.replace(mc, bert=dc.replace(mc.bert, num_hidden_layers=2,
                                        vocab_size=500),
                    enc_layers=2, dec_layers=2)
    cfg = RefTRConfig(model=mc)
    model, _ = build_model(cfg)
    rs = np.random.default_rng(0)
    b, hw, s = 2, 128, 12
    batch = {
        "image": rs.normal(size=(b, hw, hw, 3)).astype(np.float32),
        "image_valid": np.ones((b, hw, hw), bool),
        "sentence": rs.integers(1, 500, size=(b, s)).astype(np.int32),
        "sentence_valid": np.ones((b, s), bool),
    }
    params = model.init(jax.random.PRNGKey(0), batch)["params"]
    # non-trivial bbox head (the default zero-init would make parity trivial)
    params["bbox_embed"]["layers_2"]["kernel"] = (
        rs.normal(size=params["bbox_embed"]["layers_2"]["kernel"].shape)
        .astype(np.float32) * 0.1)

    calib_model, _ = build_model(RefTRConfig(model=dc.replace(
        mc, quant_calibrate=True)))
    out_fp, var = calib_model.apply({"params": params}, batch,
                                    mutable=["calib"])
    calib = jax.device_get(var["calib"])
    # every transformer dense got a calibrated absmax
    assert "q_proj_in" in calib["lang_backbone"]["layer_0"]["attention"]
    assert "linear1_in" in calib["vl_transformer"]["encoder"]["layers_0"]["ffn"]
    assert "linear2_in" in calib["vl_transformer"]["decoder"]["layers_1"]["ffn"]

    qparams = quantize_params(params, calib, scope=mc.quantize_scope)
    assert (qparams["lang_backbone"]["layer_0"]["attention"]["q_proj"]
            ["kernel_q"].dtype == jnp.int8)
    assert (qparams["vl_transformer"]["encoder"]["layers_0"]["ffn"]
            ["linear1"]["kernel_q"].dtype == jnp.int8)
    # the BERT pooler and heads stay fp
    assert "kernel" in qparams["lang_backbone"]["pooler"]
    assert "kernel" in qparams["bbox_embed"]["layers_0"]

    qmodel, _ = build_model(RefTRConfig(model=dc.replace(
        mc, quantize_int8=True)))
    out_q = qmodel.apply({"params": qparams}, batch)

    a = np.asarray(out_fp["pred_boxes"], np.float32).ravel()
    bq = np.asarray(out_q["pred_boxes"], np.float32).ravel()
    assert np.isfinite(bq).all()
    err = np.abs(a - bq).max()
    # int8 noise through 2+2+2 quantized layers on random weights;
    # normalized-coordinate boxes must stay within a few 1e-2
    assert err < 0.05, err


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


def test_validate_calibration_rejects_bad_absmax():
    from reftr_tpu.nn.quant import validate_calibration

    good = {"layer1": {"conv1_in": np.array(3.2, np.float32)}}
    validate_calibration(good)  # no raise
    for bad_leaf in (np.float32(0.0), np.float32(np.nan),
                     np.float32(np.inf), np.float32(1e9)):
        with pytest.raises(ValueError, match="invalid activation absmax"):
            validate_calibration(
                {"layer1": {"conv1_in": np.asarray(bad_leaf)}})


def test_calibration_drift_flags_saturating_inputs():
    from reftr_tpu.nn.quant import calibration_drift

    calib = {"a": {"c_in": np.array(1.0, np.float32)},
             "b": {"c_in": np.array(4.0, np.float32)}}
    obs = {"a": {"c_in": np.array(2.5, np.float32)},   # > 2x -> flagged
           "b": {"c_in": np.array(7.0, np.float32)}}   # < 2x -> fine
    drift = calibration_drift(calib, obs)
    assert len(drift) == 1
    path, cm, om = drift[0]
    assert "a" in path and cm == 1.0 and om == 2.5


def test_train_prefix_int8_grad_safe_and_close_to_fp():
    """TRAINING-time int8 of the frozen stem+layer1 prefix
    (ModelConfig.quantize_train_prefix / ResNet.quantize_stages):

    * layer1 convs get f32-STORED integer kernels (QuantConv.float_kernel)
      so jax.grad accepts the tree,
    * features stay within quantization noise of the fp backbone,
    * gradients: exact zero into the (frozen, stop_gradient'd) prefix,
      bit-identical into layer2+ vs the fp model is NOT expected (inputs
      differ by quantization noise) but they must be finite and nonzero.
    """
    rng = jax.random.PRNGKey(2)
    x = jax.random.normal(rng, (2, 64, 64, 3), jnp.float32)
    base = ResNet("resnet50")
    params = _jitter_bn(base.init(rng, x)["params"])
    folded = optimize_resnet_params(params, fold_bn=True)

    calib_model = ResNet("resnet50", fold_bn=True, sow_absmax=True,
                         stop_grad_stages=(1,))
    y_fp, var = calib_model.apply({"params": folded}, x, mutable=["calib"])
    qparams = quantize_backbone_params(
        folded, jax.device_get(var["calib"]), stages={1}, float_kernel=True)

    # structure: stem + layer2..4 fp; layer1 convs f32-stored int values
    assert "kernel" in qparams["conv1"]
    assert "kernel" in qparams["layer2_0"]["conv1"]
    for b in range(3):
        for cname in ("conv1", "conv2", "conv3"):
            kq = qparams[f"layer1_{b}"][cname]["kernel_q"]
            assert kq.dtype == jnp.float32, (b, cname)
            assert np.all(np.asarray(kq) == np.round(np.asarray(kq)))

    qmodel = ResNet("resnet50", fold_bn=True, quantize_stages=(1,),
                    stop_grad_stages=(1,))
    y_q = qmodel.apply({"params": qparams}, x)
    a = np.asarray(y_fp[0], np.float32)
    b = np.asarray(y_q[0], np.float32)
    cos = (a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9)
    assert cos > 0.99, cos

    def loss(p):
        return (qmodel.apply({"params": p}, x)[0].astype(jnp.float32)
                ** 2).mean()

    g = jax.grad(loss)(qparams)
    for b in range(3):
        for leaf, v in (("kernel_q", g[f"layer1_{b}"]["conv1"]["kernel_q"]),
                        ("in_scale", g[f"layer1_{b}"]["conv1"]["in_scale"])):
            assert float(np.abs(np.asarray(v)).max()) == 0.0, (b, leaf)
    g2 = np.abs(np.asarray(g["layer4_2"]["conv3"]["kernel"]))
    assert np.isfinite(g2).all() and g2.max() > 0


def test_train_prefix_config_validation():
    """quantize_train_prefix demands fold_bn and excludes train_stem /
    quantize_int8 / backbone_norm='group' (models/build.py)."""
    from reftr_tpu.core.config import ModelConfig, RefTRConfig
    from reftr_tpu.models.build import build_model

    def build(**kw):
        return build_model(RefTRConfig(model=ModelConfig(
            quantize_train_prefix=True, **kw)))

    with pytest.raises(ValueError, match="requires fold_bn"):
        build()
    with pytest.raises(ValueError, match="train_stem"):
        build(fold_bn=True, train_stem=True)
    with pytest.raises(ValueError, match="mutually exclusive"):
        build(fold_bn=True, quantize_int8=True)
    with pytest.raises(ValueError, match="backbone_norm"):
        build(backbone_norm="group")
    build(fold_bn=True)  # the legal combination
