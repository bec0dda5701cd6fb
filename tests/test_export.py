"""AOT serving export (tools/export_model.py).

The reference has no deployment artifact story (serving = main_vg.py --eval
with the whole training stack); these tests pin the TPU-native one: the
jax.export artifact round-trips through disk and reproduces the live
model's outputs bit-for-bit, with params baked in as constants.
"""

import dataclasses
import json
import os
import tempfile

import jax
import numpy as np
import pytest

from reftr_tpu.core.config import BertConfig, DataConfig, ModelConfig, \
    RefTRConfig
from reftr_tpu.tools.export_model import (
    export_with_config,
    load_exported,
    serving_batch_spec,
)


def tiny_cfg(**model_kw):
    kw = dict(backbone="resnet50", enc_layers=2, dec_layers=2,
              dim_feedforward=64, hidden_dim=32, nheads=4,
              bert=BertConfig.tiny(), aux_loss=False, dtype="float32")
    kw.update(model_kw)
    mc = ModelConfig(**kw)
    dc = DataConfig(img_size=64, max_img_size=64, max_query_len=12,
                    max_sentence_len=16, max_num_phrases=4,
                    phrase_seq_len=6)
    return RefTRConfig(model=mc, data=dc)


def random_batch(spec, seed=0):
    rng = np.random.default_rng(seed)
    batch = {}
    for k, v in spec.items():
        if v.dtype == np.uint8:
            batch[k] = rng.integers(0, 255, size=v.shape).astype(np.uint8)
        elif v.dtype == np.bool_:
            batch[k] = np.ones(v.shape, bool)
        else:
            batch[k] = rng.integers(1, 90, size=v.shape).astype(v.dtype)
    # token validity: prefix-valid like the real collate
    sv = np.zeros(spec["sentence_valid"].shape, np.int32)
    sv[:, :7] = 1
    batch["sentence_valid"] = sv
    if "phrase_valid" in batch:
        pv = np.zeros(spec["phrase_valid"].shape, np.int32)
        pv[:, :, :2] = 1
        pv[:, :2, :5] = 1
        batch["phrase_valid"] = pv
        batch["phrase_pos_l"] = np.ones(
            spec["phrase_pos_l"].shape, np.int32)
        batch["phrase_pos_r"] = np.full(
            spec["phrase_pos_r"].shape, 4, np.int32)
    return batch


def test_export_roundtrip_matches_live_model():
    cfg = tiny_cfg()
    with tempfile.TemporaryDirectory() as d:
        out = os.path.join(d, "exported")
        model, params, exported, manifest = export_with_config(
            cfg, resume="", out_dir=out, batch_size=2,
            platforms=("cpu",), print_fn=lambda *a: None)
        assert os.path.isfile(os.path.join(out, "serving_fn.jaxexp"))
        spec = serving_batch_spec(cfg, 2)
        batch = random_batch(spec)

        call, loaded_manifest = load_exported(out)
        got = jax.device_get(call(batch))
        want = jax.device_get(jax.jit(lambda b: model.apply(
            {"params": params}, b))(batch))

        np.testing.assert_allclose(
            np.asarray(got["pred_boxes"], np.float32),
            np.asarray(want["pred_boxes"], np.float32), atol=1e-6)
        assert loaded_manifest["batch_size"] == 2
        assert loaded_manifest["platforms"] == ["cpu"]
        assert loaded_manifest["n_parameters"] > 0
        assert loaded_manifest["artifact_bytes"] == os.path.getsize(
            os.path.join(out, "serving_fn.jaxexp"))
        # params are baked in: the artifact must carry the weights
        n_bytes = 4 * loaded_manifest["n_parameters"]
        assert loaded_manifest["artifact_bytes"] > 0.5 * n_bytes


def test_export_multiphrase_inputs_and_outputs():
    cfg = tiny_cfg()
    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, multi_phrase=True))
    spec = serving_batch_spec(cfg, 2)
    assert set(spec) >= {"phrases", "phrase_valid", "phrase_pos_l",
                         "phrase_pos_r"}
    assert spec["sentence"].shape == (2, cfg.data.max_sentence_len)
    with tempfile.TemporaryDirectory() as d:
        out = os.path.join(d, "exported")
        model, params, _, _ = export_with_config(
            cfg, resume="", out_dir=out, batch_size=2,
            platforms=("cpu",), print_fn=lambda *a: None)
        call, _ = load_exported(out)
        batch = random_batch(spec)
        got = jax.device_get(call(batch))
        want = jax.device_get(jax.jit(lambda b: model.apply(
            {"params": params}, b))(batch))
        np.testing.assert_allclose(
            np.asarray(got["pred_boxes"], np.float32),
            np.asarray(want["pred_boxes"], np.float32), atol=1e-6)
        np.testing.assert_array_equal(got["phrase_mask"],
                                      np.asarray(want["phrase_mask"]))


def test_export_masks_model_emits_pred_masks():
    # nheads=8 and hidden_dim=128 so every MaskHeadSmallConv GroupNorm(8)
    # channel count divides by 8 (dims go down to hidden//16 = 8), as at the
    # real shape (hidden=256); see tests/test_seg_model.py::seg_setup.
    cfg = tiny_cfg(masks=True, nheads=8, hidden_dim=128)
    with tempfile.TemporaryDirectory() as d:
        out = os.path.join(d, "exported")
        model, params, exported, manifest = export_with_config(
            cfg, resume="", out_dir=out, batch_size=1,
            platforms=("cpu",), print_fn=lambda *a: None)
        call, _ = load_exported(out)
        batch = random_batch(serving_batch_spec(cfg, 1))
        got = jax.device_get(call(batch))
        assert "pred_masks" in got
        want = jax.device_get(jax.jit(lambda b: model.apply(
            {"params": params}, b))(batch))
        np.testing.assert_allclose(
            np.asarray(got["pred_masks"], np.float32),
            np.asarray(want["pred_masks"], np.float32), atol=1e-5)


def test_export_int8_artifact_is_smaller_and_matches():
    """--quantize_int8 export: int8 consts shrink the artifact and the
    exported program reproduces the live quantized model."""
    fp_cfg = tiny_cfg(fold_bn=True)
    q_cfg = tiny_cfg(fold_bn=True, quantize_int8=True)
    with tempfile.TemporaryDirectory() as d:
        fp_out, q_out = os.path.join(d, "fp"), os.path.join(d, "q")
        _, _, _, fp_manifest = export_with_config(
            fp_cfg, resume="", out_dir=fp_out, batch_size=1,
            platforms=("cpu",), print_fn=lambda *a: None)
        model, params, _, q_manifest = export_with_config(
            q_cfg, resume="", out_dir=q_out, batch_size=1,
            platforms=("cpu",), print_fn=lambda *a: None)
        assert q_manifest["model"]["quantize_int8"] is True
        # backbone-scope int8 consts: noticeably smaller artifact
        assert (q_manifest["artifact_bytes"]
                < 0.8 * fp_manifest["artifact_bytes"])
        call, _ = load_exported(q_out)
        batch = random_batch(serving_batch_spec(q_cfg, 1))
        got = jax.device_get(call(batch))
        want = jax.device_get(jax.jit(lambda b: model.apply(
            {"params": params}, b))(batch))
        np.testing.assert_allclose(
            np.asarray(got["pred_boxes"], np.float32),
            np.asarray(want["pred_boxes"], np.float32), atol=1e-6)


def test_manifest_specs_describe_io():
    cfg = tiny_cfg()
    with tempfile.TemporaryDirectory() as d:
        out = os.path.join(d, "exported")
        export_with_config(cfg, resume="", out_dir=out, batch_size=3,
                           platforms=("cpu",), print_fn=lambda *a: None)
        with open(os.path.join(out, "manifest.json")) as f:
            m = json.load(f)
        shapes = [tuple(s["shape"]) for s in m["inputs"]]
        assert (3, 64, 64, 3) in shapes  # the image input
        assert all(s["shape"][0] == 3 for s in m["outputs"])
        assert m["jax_version"] == jax.__version__
