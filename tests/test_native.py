"""Parity tests for the native C++ data runtime vs the reference's own
dependencies (HF tokenizers for WordPiece+offsets, PIL for antialiased
bilinear resize, scipy for LSAP)."""

import os
import tempfile

import numpy as np
import pytest

from reftr_tpu.data import native

VOCAB = """[PAD]
[UNK]
[CLS]
[SEP]
the
a
man
woman
dog
in
red
shirt
hat
##s
##ing
##ed
play
walk
run
jump
field
grass
green
blue
left
right
.
,
!
?
'
##'
##t
is
on
with
his
her
two
young
person
##son
per
hold
##ing'
bicycle
bi
##cycle
"""


@pytest.fixture(scope="module")
def vocab_path():
    f = tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False)
    f.write(VOCAB)
    f.close()
    return f.name


@pytest.fixture(scope="module")
def hf_tok(vocab_path):
    from tokenizers import BertWordPieceTokenizer

    return BertWordPieceTokenizer(vocab_path, lowercase=True)


@pytest.fixture(scope="module")
def our_tok(vocab_path):
    return native.WordPieceTokenizer(vocab_path)


SENTENCES = [
    "the man in a red shirt",
    "A woman holding two dogs.",
    "The DOG is running in the GREEN field!",
    "a person on a bicycle, walking left",
    "man's hat",
    "unknownword in grass",
    "  spaced   out  text ",
    "café dog",  # accent stripping
    "",
]


def test_tokenizer_ids_vs_hf(hf_tok, our_tok):
    for s in SENTENCES:
        want = hf_tok.encode(s)
        ids, mask, _ = our_tok.encode(s, max_length=24)
        n = int(mask.sum())
        assert list(ids[:n]) == want.ids, (s, list(ids[:n]), want.ids,
                                           want.tokens)


def test_tokenizer_offsets_vs_hf(hf_tok, our_tok):
    for s in SENTENCES:
        want = hf_tok.encode(s)
        ids, mask, offsets = our_tok.encode(s, max_length=24)
        n = int(mask.sum())
        got = [tuple(map(int, o)) for o in offsets[:n]]
        assert got == list(want.offsets), (s, got, want.offsets)


def test_tokenizer_truncation(hf_tok, our_tok):
    s = "the man in a red shirt walking on the green grass with a dog " * 3
    ids, mask, _ = our_tok.encode(s, max_length=10)
    assert int(mask.sum()) == 10
    assert ids[0] == our_tok.cls_id and ids[9] == our_tok.sep_id
    want = hf_tok.encode(s)
    assert list(ids[1:9]) == want.ids[1:9]


def test_char_to_token(hf_tok, our_tok):
    s = "the man in a red shirt"
    enc = hf_tok.encode(s)
    ids, mask, offsets = our_tok.encode(s, max_length=24)
    for pos in range(len(s)):
        want = enc.char_to_token(pos)
        got = native.WordPieceTokenizer.char_to_token(offsets, mask, pos)
        assert got == want, (pos, s[pos], got, want)


def test_tokenizer_padding(our_tok):
    ids, mask, _ = our_tok.encode("the dog", max_length=12)
    n = int(mask.sum())
    assert n == 4  # CLS the dog SEP
    assert (ids[n:] == our_tok.pad_id).all()
    assert (mask[n:] == 0).all()


# ---------------------------------------------------------------------------
# image ops
# ---------------------------------------------------------------------------

def test_resize_vs_pil(rng):
    from PIL import Image

    img = rng.integers(0, 256, size=(37, 53, 3)).astype(np.uint8)
    for out_hw in [(20, 30), (74, 106), (37, 53), (640, 480)]:
        want = np.asarray(
            Image.fromarray(img).resize((out_hw[1], out_hw[0]),
                                        Image.BILINEAR))
        got = native.resize_bilinear(img, out_hw)
        # Pillow uses fixed-point int16 coefficients; allow 1 LSB
        diff = np.abs(got.astype(int) - want.astype(int))
        assert diff.max() <= 1, (out_hw, diff.max())


def test_pack_canvas(rng):
    img = rng.integers(0, 256, size=(5, 7, 3)).astype(np.uint8)
    canvas = native.pack_canvas(img, (10, 12))
    assert canvas.shape == (10, 12, 3)
    np.testing.assert_array_equal(canvas[:5, :7], img)
    assert (canvas[5:] == 0).all() and (canvas[:, 7:] == 0).all()


def test_hsv_jitter_identity(rng):
    img = rng.integers(0, 256, size=(16, 16, 3)).astype(np.uint8)
    out = native.hsv_jitter(img, 1.0, 1.0)
    diff = np.abs(out.astype(int) - img.astype(int))
    assert diff.max() <= 1  # rgb->hsv->rgb roundtrip, float path


def test_hsv_jitter_darkens(rng):
    img = rng.integers(50, 200, size=(8, 8, 3)).astype(np.uint8)
    out = native.hsv_jitter(img, 1.0, 0.5)
    assert out.max() < img.max()
    assert out.astype(int).sum() < img.astype(int).sum()


# ---------------------------------------------------------------------------
# LSAP
# ---------------------------------------------------------------------------

def test_lsap_vs_scipy(rng):
    from scipy.optimize import linear_sum_assignment

    for n, m in [(1, 1), (3, 3), (5, 9), (8, 8), (16, 32)]:
        cost = rng.normal(size=(n, m))
        rows, cols = linear_sum_assignment(cost)
        got = native.lsap(cost)
        want_total = cost[rows, cols].sum()
        got_total = cost[np.arange(n), got].sum()
        assert len(set(got.tolist())) == n  # valid assignment
        np.testing.assert_allclose(got_total, want_total, rtol=1e-9)
