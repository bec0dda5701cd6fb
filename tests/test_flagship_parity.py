"""FLAGSHIP-SHAPE parity: 640px / d=256 / 6+6 / 12-layer BERT-base-shaped
language backbone, random converted weights, vs the reference oracle — the
full production geometry of configs/refcoco/RefTR_refcoco.sh, not the toy
d=64 shapes of test_full_model_parity.py. Also measures bf16-vs-fp32 output
drift at this shape (recorded in PERFORMANCE.md).
"""

import os
import sys

import numpy as np
import pytest
import torch

REF = "/root/reference"

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not os.path.isdir(REF),
                       reason="reference repo not available"),
]

HIDDEN, HEADS, ENC, DEC, FFN = 256, 8, 6, 6, 2048
BERT_LAYERS, BERT_HIDDEN, BERT_FFN, BERT_HEADS = 12, 768, 3072, 12
VOCAB = 2048  # full depth/width; small vocab keeps the embedding cheap
IMG = 640
SENT = 40


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


def build_flagship_reference(ref_modules):
    ref_rt, ref_vl, ref_bb = ref_modules
    from transformers import BertConfig as HFBertConfig
    from transformers import BertModel as HFBertModel

    class A:
        lr_backbone = 0.0
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

    torch.manual_seed(31)
    hf_cfg = HFBertConfig(
        vocab_size=VOCAB, hidden_size=BERT_HIDDEN,
        num_hidden_layers=BERT_LAYERS, num_attention_heads=BERT_HEADS,
        intermediate_size=BERT_FFN, max_position_embeddings=512,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    model = ref_rt.RefTR(
        img_backbone=ref_bb.build_backbone(A),
        lang_backbone=HFBertModel(hf_cfg),
        vl_transformer=ref_vl.build_vl_transformer(A),
        num_feature_levels=1, num_queries_per_phrase=1, aux_loss=False)
    g = torch.Generator().manual_seed(32)
    sd = model.state_dict()
    for k, v in sd.items():
        if k.endswith("running_mean"):
            sd[k] = torch.randn(v.shape, generator=g) * 0.1
        elif k.endswith("running_var"):
            sd[k] = torch.rand(v.shape, generator=g) + 0.5
    model.load_state_dict(sd)
    # the reference zero-inits the bbox head's last layer
    # (reftr_transformer.py:131-132) -> constant sigmoid(0)=0.5 boxes; give
    # it real weights so parity is a non-trivial comparison
    from tests.test_full_model_parity import randomize_bbox_head

    randomize_bbox_head(model, g)
    return model.eval()


def flagship_inputs(rng):
    """Two flagship-sized images (640-long-side, unequal aspect)."""
    h0, w0 = IMG, 480
    h1, w1 = 512, IMG
    img0 = rng.normal(size=(3, h0, w0)).astype(np.float32)
    img1 = rng.normal(size=(3, h1, w1)).astype(np.float32)
    ids = rng.integers(1, VOCAB, size=(2, SENT)).astype(np.int64)
    mask = np.zeros((2, SENT), np.int64)
    mask[0, :17] = 1
    mask[1, :33] = 1
    ids[0, 17:] = 0
    ids[1, 33:] = 0
    torch_samples = {
        "img": [torch.from_numpy(img0), torch.from_numpy(img1)],
        "sentence": torch.from_numpy(ids),
        "sentence_mask": torch.from_numpy(mask),
    }
    canvas = np.zeros((2, IMG, IMG, 3), np.float32)
    canvas[0, :h0, :w0] = img0.transpose(1, 2, 0)
    canvas[1, :h1, :w1] = img1.transpose(1, 2, 0)
    valid = np.zeros((2, IMG, IMG), bool)
    valid[0, :h0, :w0] = True
    valid[1, :h1, :w1] = True
    our_batch = {
        "image": canvas,
        "image_valid": valid,
        "sentence": ids.astype(np.int32),
        "sentence_valid": mask.astype(np.int32),
    }
    return torch_samples, our_batch


def test_flagship_shape_parity_and_bf16_drift(ref_modules, rng):
    from reftr_tpu.core.config import BertConfig, ModelConfig
    from reftr_tpu.models.reftr import RefTR
    from reftr_tpu.nn.convert import convert_reftr

    ref_model = build_flagship_reference(ref_modules)
    torch_samples, our_batch = flagship_inputs(rng)
    with torch.no_grad():
        want = ref_model(torch_samples)
    want_boxes = want["pred_boxes"].numpy()

    bert = BertConfig(vocab_size=VOCAB, hidden_size=BERT_HIDDEN,
                      num_hidden_layers=BERT_LAYERS,
                      num_attention_heads=BERT_HEADS,
                      intermediate_size=BERT_FFN,
                      hidden_dropout=0.0, attention_dropout=0.0)
    params = convert_reftr(ref_model.state_dict(), ENC, DEC,
                           bert_layers=BERT_LAYERS, backbone="resnet50",
                           num_feature_levels=1)

    mc32 = ModelConfig(hidden_dim=HIDDEN, nheads=HEADS, enc_layers=ENC,
                       dec_layers=DEC, dim_feedforward=FFN, dropout=0.0,
                       aux_loss=False, bert=bert, dtype="float32")
    got32 = np.asarray(
        RefTR(mc32).apply({"params": params}, our_batch)["pred_boxes"])

    # BASELINE.md's stated target, asserted at the PRODUCTION shape
    assert got32.shape == want_boxes.shape
    dev = np.abs(got32 - want_boxes).max()
    print(f"\nflagship fp32 max box deviation vs reference: {dev:.2e}")
    np.testing.assert_allclose(got32, want_boxes, rtol=1e-3, atol=1e-3)

    # bf16 compute drift on the SAME params (boxes are normalized cxcywh,
    # so this bound is in coordinate units)
    mc16 = ModelConfig(hidden_dim=HIDDEN, nheads=HEADS, enc_layers=ENC,
                       dec_layers=DEC, dim_feedforward=FFN, dropout=0.0,
                       aux_loss=False, bert=bert, dtype="bfloat16")
    got16 = np.asarray(
        RefTR(mc16).apply({"params": params}, our_batch)["pred_boxes"])
    drift = np.abs(got16.astype(np.float32) - got32).max()
    print(f"flagship bf16 max box drift vs fp32: {drift:.2e}")
    assert drift < 0.03, f"bf16 drift {drift} exceeds 0.03 normalized units"
