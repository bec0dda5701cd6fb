"""FULL-MODEL parity: the reference RefTR (torch, imported from
/root/reference as a test oracle with a torchvision stub) vs our JAX RefTR
with converted weights, end to end on identical inputs.

This is the structural guarantee behind the <=1e-3 parity target of
BASELINE.md: if the full forward matches on random weights, it matches on
the released checkpoints (which load through the same converter).
"""

import os
import sys
import types

import numpy as np
import pytest
import torch

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference repo not available")


@pytest.fixture(scope="module")
def ref_modules():
    from tests import torchvision_stub

    torchvision_stub.install()
    sys.path.insert(0, REF)
    try:
        import models.reftr_transformer as ref_rt
        import models.reftr as ref_vl
        import models.modeling.backbone as ref_bb
    finally:
        sys.path.remove(REF)
    return ref_rt, ref_vl, ref_bb


HIDDEN, HEADS, ENC, DEC, FFN = 64, 4, 2, 2, 128


def build_reference_model(ref_modules):
    """Assemble the reference RefTR directly (bypassing from_pretrained)."""
    ref_rt, ref_vl, ref_bb = ref_modules
    from transformers import BertConfig as HFBertConfig
    from transformers import BertModel as HFBertModel

    class A:  # args namespace for the reference builders
        lr_backbone = 0.0  # frozen backbone -> deterministic
        masks = False
        num_feature_levels = 1
        backbone = "resnet50"
        dilation = False
        position_embedding = "sine"
        hidden_dim = HIDDEN
        nheads = HEADS
        enc_layers = ENC
        dec_layers = DEC
        dim_feedforward = FFN
        dropout = 0.0
        max_lang_seq = 128

    torch.manual_seed(11)
    img_backbone = ref_bb.build_backbone(A)
    # NB the reference zero-inits bbox_embed's LAST layer
    # (reftr_transformer.py:131-132), which makes every pred box a constant
    # sigmoid(0)=0.5 under random weights — box parity would be trivially
    # true. randomize_bbox_head() below restores a real signal.
    vl = ref_vl.build_vl_transformer(A)
    hf_cfg = HFBertConfig(
        vocab_size=512, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128,
        max_position_embeddings=128, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0)
    lang = HFBertModel(hf_cfg)
    model = ref_rt.RefTR(
        img_backbone=img_backbone, lang_backbone=lang, vl_transformer=vl,
        num_feature_levels=1, num_queries_per_phrase=1, aux_loss=True)
    # randomize the frozen BN stats so parity actually exercises them
    g = torch.Generator().manual_seed(12)
    sd = model.state_dict()
    for k, v in sd.items():
        if k.endswith("running_mean"):
            sd[k] = torch.randn(v.shape, generator=g) * 0.1
        elif k.endswith("running_var"):
            sd[k] = torch.rand(v.shape, generator=g) + 0.5
    model.load_state_dict(sd)
    randomize_bbox_head(model, g)
    return model.eval()


def randomize_bbox_head(model, g):
    """Un-zero bbox_embed's last layer so box outputs depend on the input
    (small scale keeps sigmoid outputs away from saturation)."""
    last = model.bbox_embed.layers[-1]
    with torch.no_grad():
        last.weight.copy_(torch.randn(last.weight.shape, generator=g) * 0.05)
        last.bias.copy_(torch.randn(last.bias.shape, generator=g) * 0.1)


def make_inputs(rng, multi_phrase=False):
    """Two images of different sizes -> torch NestedTensor vs our canvas."""
    h0, w0 = 64, 48
    h1, w1 = 56, 64
    img0 = rng.normal(size=(3, h0, w0)).astype(np.float32)
    img1 = rng.normal(size=(3, h1, w1)).astype(np.float32)
    S = 12
    ids = rng.integers(1, 512, size=(2, S)).astype(np.int64)
    mask = np.zeros((2, S), np.int64)
    mask[0, :8] = 1
    mask[1, :11] = 1
    # keep pad ids = 0 for cleanliness
    ids[0, 8:] = 0
    ids[1, 11:] = 0

    torch_samples = {
        "img": [torch.from_numpy(img0), torch.from_numpy(img1)],
        "sentence": torch.from_numpy(ids),
        "sentence_mask": torch.from_numpy(mask),
    }

    canvas = np.zeros((2, 64, 64, 3), np.float32)
    canvas[0, :h0, :w0] = img0.transpose(1, 2, 0)
    canvas[1, :h1, :w1] = img1.transpose(1, 2, 0)
    valid = np.zeros((2, 64, 64), bool)
    valid[0, :h0, :w0] = True
    valid[1, :h1, :w1] = True
    our_batch = {
        "image": canvas,
        "image_valid": valid,
        "sentence": ids.astype(np.int32),
        "sentence_valid": mask.astype(np.int32),
    }
    if multi_phrase:
        P, SP = 3, 6
        ph = rng.integers(1, 512, size=(2, P, SP)).astype(np.int64)
        ph_mask = np.zeros((2, P, SP), np.int64)
        ph_mask[:, :, :2] = 1
        ph_mask[0, :2, :5] = 1  # 2 live phrases
        ph_mask[1, :3, :4] = 1  # 3 live phrases
        pl_ = np.array([[1, 3, 0], [2, 4, 6]], np.int64)
        pr_ = pl_ + 2
        torch_samples.update({
            "phrase": torch.from_numpy(ph),
            "phrase_mask": torch.from_numpy(ph_mask),
            "phrase_pos_l": torch.from_numpy(pl_),
            "phrase_pos_r": torch.from_numpy(pr_),
        })
        our_batch.update({
            "phrases": ph.astype(np.int32),
            "phrase_valid": ph_mask.astype(np.int32),
            "phrase_pos_l": pl_.astype(np.int32),
            "phrase_pos_r": pr_.astype(np.int32),
        })
    return torch_samples, our_batch


def build_our_model(ref_torch_model):
    import jax

    from reftr_tpu.core.config import BertConfig, ModelConfig
    from reftr_tpu.models.reftr import RefTR
    from reftr_tpu.nn.convert import convert_reftr

    mc = ModelConfig(
        hidden_dim=HIDDEN, nheads=HEADS, enc_layers=ENC, dec_layers=DEC,
        dim_feedforward=FFN, dropout=0.0, aux_loss=True,
        bert=BertConfig.tiny(), dtype="float32")
    model = RefTR(mc)
    params = convert_reftr(
        ref_torch_model.state_dict(), ENC, DEC,
        bert_layers=2, backbone="resnet50", num_feature_levels=1)
    return model, {"params": params}


def test_single_phrase_full_parity(ref_modules, rng):
    ref_model = build_reference_model(ref_modules)
    torch_samples, our_batch = make_inputs(rng)
    with torch.no_grad():
        want = ref_model(torch_samples)
    want_boxes = want["pred_boxes"].numpy()  # [B, n_ph, n_q, 4]

    model, variables = build_our_model(ref_model)
    out = model.apply(variables, our_batch)
    got_boxes = np.asarray(out["pred_boxes"])

    assert got_boxes.shape == want_boxes.shape
    np.testing.assert_allclose(got_boxes, want_boxes, rtol=1e-3, atol=1e-3)
    # aux layers too
    for i, aux in enumerate(out["aux_outputs"]):
        np.testing.assert_allclose(
            np.asarray(aux["pred_boxes"]),
            want["aux_outputs"][i]["pred_boxes"].numpy(),
            rtol=1e-3, atol=1e-3)


def test_multi_phrase_full_parity(ref_modules, rng):
    ref_model = build_reference_model(ref_modules)
    torch_samples, our_batch = make_inputs(rng, multi_phrase=True)
    with torch.no_grad():
        want = ref_model(torch_samples)
    want_boxes = want["pred_boxes"].numpy()
    want_mask = want["phrase_mask"].numpy()

    model, variables = build_our_model(ref_model)
    out = model.apply(variables, our_batch)
    got_boxes = np.asarray(out["pred_boxes"])
    got_mask = np.asarray(out["phrase_mask"])

    np.testing.assert_array_equal(got_mask, want_mask)
    # compare only valid phrases (invalid slots are garbage in both)
    valid = want_mask.reshape(2, -1, 1).astype(bool)
    np.testing.assert_allclose(
        got_boxes[valid[:, :, 0]], want_boxes[valid[:, :, 0]],
        rtol=1e-3, atol=1e-3)


def test_seg_full_parity(ref_modules, rng):
    """RefTRSeg end-to-end: boxes AND mask logits vs the reference."""
    ref_rt, ref_vl, ref_bb = ref_modules
    sys.path.insert(0, REF)
    try:
        import models.reftr_segmentation as ref_seg
    finally:
        sys.path.remove(REF)
    from transformers import BertConfig as HFBertConfig
    from transformers import BertModel as HFBertModel

    H2, HD2 = 8, 128  # mask head GroupNorm(8) needs 2*hidden+heads % 8 == 0

    class A:
        lr_backbone = 0.0
        masks = True
        num_feature_levels = 1
        backbone = "resnet50"
        dilation = False
        position_embedding = "sine"
        hidden_dim = HD2
        nheads = H2
        enc_layers = ENC
        dec_layers = DEC
        dim_feedforward = FFN
        dropout = 0.0
        max_lang_seq = 128

    torch.manual_seed(21)
    hf_cfg = HFBertConfig(
        vocab_size=512, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128,
        max_position_embeddings=128, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0)
    ref_model = ref_seg.RefTRSeg(
        img_backbone=ref_bb.build_backbone(A),
        lang_backbone=HFBertModel(hf_cfg),
        vl_transformer=ref_vl.build_vl_transformer(A),
        num_feature_levels=1, num_queries_per_phrase=1).eval()
    # randomize frozen BN stats
    g = torch.Generator().manual_seed(22)
    sd = ref_model.state_dict()
    for k, v in sd.items():
        if k.endswith("running_mean"):
            sd[k] = torch.randn(v.shape, generator=g) * 0.1
        elif k.endswith("running_var"):
            sd[k] = torch.rand(v.shape, generator=g) + 0.5
    ref_model.load_state_dict(sd)
    randomize_bbox_head(ref_model, g)

    torch_samples, our_batch = make_inputs(rng)
    with torch.no_grad():
        want = ref_model(torch_samples)

    import jax

    from reftr_tpu.core.config import BertConfig, ModelConfig
    from reftr_tpu.models.reftr_seg import RefTRSeg
    from reftr_tpu.nn.convert import convert_reftr

    mc = ModelConfig(
        hidden_dim=HD2, nheads=H2, enc_layers=ENC, dec_layers=DEC,
        dim_feedforward=FFN, dropout=0.0, masks=True,
        bert=BertConfig.tiny(), dtype="float32")
    model = RefTRSeg(mc)
    params = convert_reftr(ref_model.state_dict(), ENC, DEC, bert_layers=2,
                           backbone="resnet50", num_feature_levels=1)
    out = model.apply({"params": params}, our_batch)

    want_boxes = want["pred_boxes"].numpy()
    got_boxes = np.asarray(out["pred_boxes"])
    np.testing.assert_allclose(got_boxes, want_boxes, rtol=1e-3, atol=1e-3)

    # mask logits: reference [B*nq, 1, h, w] -> ours [B, nq, h, w]
    want_masks = want["pred_masks"].numpy()
    got_masks = np.asarray(out["pred_masks"])
    wm = want_masks.reshape(got_masks.shape)
    np.testing.assert_allclose(got_masks, wm, rtol=1e-2, atol=5e-3)

    # attention maps
    want_att = want["mask_att"].numpy()  # [B, heads, h, w]
    got_att = np.asarray(out["mask_att"])
    np.testing.assert_allclose(got_att, want_att, rtol=1e-3, atol=1e-4)
