"""Byte-level BPE tokenizer parity vs HF tokenizers.

The oracle is an HF ByteLevelBPETokenizer TRAINED in-test on a small corpus,
saved as vocab.json + merges.txt, then loaded by our C++ implementation —
so ids, merges, and offsets are compared on the exact same model files that
a real roberta-base directory provides.
"""

import os
import tempfile

import numpy as np
import pytest

from reftr_tpu.data.native import ByteLevelBPETokenizer

CORPUS = [
    "a man in a red shirt is walking his dog",
    "two young women are playing in the green field",
    "the person on the left holds a blue umbrella",
    "a dog runs after the ball near the water",
    "children don't like waiting, they're running around!",
    "a group of people standing next to bicycles",
    "someone's hat flew off in the wind... twice",
    "the number 42 bus arrives at 10:30 sharp",
]


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    from tokenizers import ByteLevelBPETokenizer as HFBPE

    d = tmp_path_factory.mktemp("bpe")
    corpus_file = os.path.join(d, "corpus.txt")
    with open(corpus_file, "w") as f:
        f.write("\n".join(CORPUS))
    hf = HFBPE(trim_offsets=True)  # RobertaTokenizerFast semantics, what the reference consumes
    hf.train([corpus_file], vocab_size=400, min_frequency=1,
             special_tokens=["<s>", "<pad>", "</s>", "<unk>", "<mask>"])
    hf.save_model(str(d))
    ours = ByteLevelBPETokenizer(os.path.join(d, "vocab.json"),
                                 os.path.join(d, "merges.txt"))
    return hf, ours


SENTENCES = [
    "a man in a red shirt",
    "the dog is running in the field",
    "they're playing, aren't they?",
    "bus 42 at 10:30... sharp!",
    "  spaced   out ",
    "unknownzzz word",
    "",
]


def test_bpe_ids_vs_hf(trained):
    hf, ours = trained
    for s in SENTENCES:
        want = hf.encode(s).ids
        ids, mask, _ = ours.encode(s, max_length=40)
        n = int(mask.sum())
        got = list(ids[1:n - 1])  # strip our <s>/</s> (HF base has none)
        assert got == want, (s, got, want, hf.encode(s).tokens)


def test_bpe_offsets_vs_hf(trained):
    hf, ours = trained
    for s in SENTENCES:
        enc = hf.encode(s)
        ids, mask, offsets = ours.encode(s, max_length=40)
        n = int(mask.sum())
        got = [tuple(map(int, o)) for o in offsets[1:n - 1]]
        # HF ByteLevelBPETokenizer default has trim_offsets=True
        assert got == list(enc.offsets), (s, got, enc.offsets, enc.tokens)


def test_bpe_specials_and_padding(trained):
    _, ours = trained
    ids, mask, _ = ours.encode("a dog", max_length=10)
    n = int(mask.sum())
    assert ids[0] == ours.cls_id and ids[n - 1] == ours.sep_id
    assert (ids[n:] == ours.pad_id).all()


def test_bpe_truncation(trained):
    hf, ours = trained
    s = " ".join(CORPUS)
    ids, mask, _ = ours.encode(s, max_length=12)
    assert int(mask.sum()) == 12
    assert ids[11] == ours.sep_id
    want = hf.encode(s).ids[:10]
    assert list(ids[1:11]) == want
