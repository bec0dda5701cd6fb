"""Parity tests: our Flax modules vs torch oracles with converted weights.

Oracles:
  * torch.nn.MultiheadAttention (stock torch) for attention,
  * the reference's DETR-style encoder/decoder layers, loaded directly from
    /root/reference/models/modeling/transformer.py as a standalone module
    (it only imports torch) — a pure test oracle, nothing is copied,
  * HF transformers BertModel (torch) with a tiny random config.
"""

import importlib.util
import os

import numpy as np
import pytest
import torch

from reftr_tpu.core.config import BertConfig
from reftr_tpu.nn.attention import MultiHeadAttention
from reftr_tpu.nn.bert import BertModel
from reftr_tpu.nn.convert import (
    convert_bert,
    convert_decoder_layer,
    convert_encoder_layer,
    mha as convert_mha,
)
from reftr_tpu.nn.transformer import (
    TransformerDecoderLayer,
    TransformerEncoderLayer,
)

REF = "/root/reference/models/modeling/transformer.py"


def load_reference_transformer():
    if not os.path.exists(REF):
        pytest.skip("reference repo not available")
    spec = importlib.util.spec_from_file_location("ref_transformer", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


D, H, FF, B, S = 64, 4, 128, 3, 11


def make_pad(rng):
    pad = np.zeros((B, S), dtype=bool)
    pad[0, 8:] = True
    pad[2, 5:] = True
    return pad


def test_mha_vs_torch(rng):
    torch.manual_seed(0)
    t_mha = torch.nn.MultiheadAttention(D, H, dropout=0.0).eval()
    q = rng.normal(size=(B, S, D)).astype(np.float32)
    kv = rng.normal(size=(B, S, D)).astype(np.float32)
    pad = make_pad(rng)

    with torch.no_grad():
        want, _ = t_mha(
            torch.from_numpy(q).transpose(0, 1),
            torch.from_numpy(kv).transpose(0, 1),
            torch.from_numpy(kv).transpose(0, 1),
            key_padding_mask=torch.from_numpy(pad),
        )
    want = want.transpose(0, 1).numpy()

    ours = MultiHeadAttention(D, H, 0.0)
    params = {"params": convert_mha(t_mha.state_dict(), "")}
    # our convention: valid mask (True = keep)
    got = np.asarray(ours.apply(params, q, kv, kv, ~pad))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("normalize_before", [False, True])
def test_encoder_layer_vs_reference(rng, normalize_before):
    ref = load_reference_transformer()
    torch.manual_seed(1)
    t_layer = ref.TransformerEncoderLayer(
        D, H, FF, dropout=0.0, activation="relu",
        normalize_before=normalize_before).eval()
    src = rng.normal(size=(B, S, D)).astype(np.float32)
    pos = rng.normal(size=(B, S, D)).astype(np.float32)
    pad = make_pad(rng)
    with torch.no_grad():
        want = t_layer(
            torch.from_numpy(src).transpose(0, 1),
            src_key_padding_mask=torch.from_numpy(pad),
            pos=torch.from_numpy(pos).transpose(0, 1),
        ).transpose(0, 1).numpy()

    layer = TransformerEncoderLayer(D, H, FF, dropout=0.0,
                                    normalize_before=normalize_before)
    params = {"params": convert_encoder_layer(t_layer.state_dict())}
    got = np.asarray(layer.apply(params, src, pos, ~pad))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_decoder_layer_vs_reference(rng):
    ref = load_reference_transformer()
    torch.manual_seed(2)
    t_layer = ref.TransformerDecoderLayer(D, H, FF, dropout=0.0).eval()
    nq = 5
    tgt = rng.normal(size=(B, nq, D)).astype(np.float32)
    qpos = rng.normal(size=(B, nq, D)).astype(np.float32)
    mem = rng.normal(size=(B, S, D)).astype(np.float32)
    mpos = rng.normal(size=(B, S, D)).astype(np.float32)
    mem_pad = make_pad(rng)
    tgt_pad = np.zeros((B, nq), dtype=bool)
    tgt_pad[1, 3:] = True
    with torch.no_grad():
        want = t_layer(
            torch.from_numpy(tgt).transpose(0, 1),
            torch.from_numpy(mem).transpose(0, 1),
            tgt_key_padding_mask=torch.from_numpy(tgt_pad),
            memory_key_padding_mask=torch.from_numpy(mem_pad),
            pos=torch.from_numpy(mpos).transpose(0, 1),
            query_pos=torch.from_numpy(qpos).transpose(0, 1),
        ).transpose(0, 1).numpy()

    layer = TransformerDecoderLayer(D, H, FF, dropout=0.0)
    params = {"params": convert_decoder_layer(t_layer.state_dict())}
    got = np.asarray(
        layer.apply(params, tgt, mem, ~tgt_pad, ~mem_pad, mpos, qpos))
    # rows for fully-padded queries are garbage in both; compare valid only
    valid = ~tgt_pad
    np.testing.assert_allclose(got[valid], want[valid], rtol=1e-4, atol=1e-5)


def test_bert_vs_hf(rng):
    from transformers import BertConfig as HFBertConfig
    from transformers import BertModel as HFBertModel

    cfg = BertConfig.tiny()
    hf_cfg = HFBertConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        intermediate_size=cfg.intermediate_size,
        max_position_embeddings=cfg.max_position_embeddings,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(3)
    hf = HFBertModel(hf_cfg).eval()

    ids = rng.integers(1, cfg.vocab_size, size=(B, S)).astype(np.int32)
    mask = np.ones((B, S), dtype=np.int32)
    mask[0, 8:] = 0
    mask[2, 6:] = 0
    with torch.no_grad():
        out = hf(
            torch.from_numpy(ids).long(),
            attention_mask=torch.from_numpy(mask).long(),
        )
    want_seq = out.last_hidden_state.numpy()
    want_pool = out.pooler_output.numpy()

    ours = BertModel(cfg)
    params = {"params": convert_bert(hf.state_dict(), cfg.num_hidden_layers)}
    got_seq, got_pool = ours.apply(params, ids, mask)
    np.testing.assert_allclose(np.asarray(got_seq), want_seq, rtol=1e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_pool), want_pool, rtol=1e-4, atol=2e-5)
