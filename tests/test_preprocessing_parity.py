"""Preprocessing parity with the REFERENCE DATASET CLASSES as oracle
(VERDICT r2 missing #2 / next #4).

Writes fixture JPEGs + reference-format ``.pth`` annotation pickles, feeds
the SAME files through the reference's dataset classes
(resc_refer_dataset.py ReferDataset via refer_resc.RefCOCO, and
refer_dataset.py FlickrMultiPhraseDataset via refer_multiphrase.flickr30k,
with the real reference transform pipeline make_refer_transforms) and
through reftr_tpu.data.datasets, and compares the emitted tensors
item-for-item: resized+normalized pixels on the valid extent, token
ids/masks, char_to_token phrase spans, normalized cxcywh boxes, sizes.

The reference needs torchvision (absent here): tests.torchvision_stub
provides the exact surface it touches, including a PIL-backed
transforms.functional whose resize IS PIL's (the oracle semantics).
"""

import os
import sys

import numpy as np
import pytest
import torch

REF = "/root/reference"

VOCAB = "\n".join([
    "[PAD]", "[UNK]", "[CLS]", "[SEP]",
    "a", "the", "man", "red", "car", "dog", "next", "to", "on", "left",
    "right", "holding", "big", "stand", "##ing", "##s",
]) + "\n"

PHRASES = ["a man", "the red car", "two dogs standing"]
SENTENCE = "a man next to the red car"
# char starts of "a man" and "the red car" in SENTENCE
CHAR_STARTS = [0, 14]


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    """images + unc (refcoco) + flickr reference-format annotations."""
    from PIL import Image

    root = tmp_path_factory.mktemp("prep_parity")
    img_dir = root / "images"
    img_dir.mkdir()
    rng = np.random.default_rng(7)
    sizes = [(90, 120), (132, 75), (600, 800)]  # last one exercises the cap
    files = []
    for i, (h, w) in enumerate(sizes):
        # smooth-ish content so JPEG decode differences stay tiny
        yy, xx = np.mgrid[0:h, 0:w]
        img = np.stack([
            (yy * 255 / h), (xx * 255 / w),
            ((yy + xx) * 255 / (h + w))], axis=-1).astype(np.uint8)
        img += rng.integers(0, 30, size=img.shape).astype(np.uint8)
        name = f"fix_{i:06d}.jpg"
        Image.fromarray(img).save(str(img_dir / name), quality=95)
        files.append((name, h, w))

    ann = root / "ann"
    (ann / "unc").mkdir(parents=True)
    (ann / "flickr").mkdir(parents=True)
    # resc 'unc' tuple: (img_file, _, bbox_xywh, phrase, attri)
    # (resc_refer_dataset.py:121-131)
    unc_records = []
    for i, (name, h, w) in enumerate(files):
        box = [int(w * 0.1) + i, int(h * 0.2), int(w * 0.5), int(h * 0.4)]
        unc_records.append((name, None, box, PHRASES[i % len(PHRASES)], None))
    torch.save(unc_records, str(ann / "unc" / "unc_val.pth"))

    # flickr multi-phrase tuple:
    # (img_file, phrase_char_starts, bboxes, phrases, _, sentence)
    # (refer_dataset.py:92-97 — char START only; end derived from phrase)
    fl_records = []
    for i, (name, h, w) in enumerate(files):
        boxes = [[int(w * 0.1), int(h * 0.1), int(w * 0.4), int(h * 0.5)],
                 [int(w * 0.5), int(h * 0.3), int(w * 0.9), int(h * 0.8)]]
        fl_records.append((name, list(CHAR_STARTS), boxes,
                           [SENTENCE[:5], SENTENCE[14:]], None, SENTENCE))
    torch.save(fl_records, str(ann / "flickr" / "flickr_val.pth"))

    vocab = root / "vocab.txt"
    vocab.write_text(VOCAB)
    return {"img_dir": str(img_dir), "ann": str(ann), "vocab": str(vocab),
            "files": files}


@pytest.fixture(scope="module")
def ref_modules(fixture_dir):
    """Import the reference dataset modules with the torchvision stub and a
    local-vocab tokenizer (the sandbox is offline: from_pretrained would
    fail)."""
    from tests import torchvision_stub

    torchvision_stub.install()
    # compat shims for the reference's py3.8-era idioms: removed numpy
    # aliases (np.int / np.bool) and collections.Iterable
    import collections
    import collections.abc

    for alias, typ in (("int", int), ("bool", bool), ("float", float)):
        if alias not in np.__dict__:
            setattr(np, alias, typ)
    if not hasattr(collections, "Iterable"):
        collections.Iterable = collections.abc.Iterable
    sys.path.insert(0, REF)
    try:
        import datasets.grounding_datasets.resc_refer_dataset as ref_rd
        import datasets.grounding_datasets.refer_dataset as ref_fd
        import datasets.refer_resc as ref_resc
        import datasets.refer_multiphrase as ref_mp
    finally:
        sys.path.remove(REF)
    from transformers import BertTokenizerFast

    tok = BertTokenizerFast(vocab_file=fixture_dir["vocab"],
                            do_lower_case=True)
    ref_rd.build_bert_tokenizer = lambda m: tok
    ref_fd.build_bert_tokenizer = lambda m: tok
    return ref_rd, ref_fd, ref_resc, ref_mp


def unnorm_chw(img_tensor):
    """Invert the reference's ToTensor+Normalize back to uint8 HWC."""
    t = img_tensor.numpy().transpose(1, 2, 0)
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    return np.clip(np.rint((t * std + mean) * 255.0), 0, 255).astype(np.uint8)


def test_resc_refcoco_item_parity(fixture_dir, ref_modules):
    _, _, ref_resc, _ = ref_modules
    from reftr_tpu.data.datasets import ReferDatasetResc
    from reftr_tpu.data.native import WordPieceTokenizer

    ref_ds = ref_resc.RefCOCO(
        data_root=fixture_dir["ann"], im_dir=fixture_dir["img_dir"],
        split="val", version="unc", max_query_len=40,
        transforms=ref_resc.make_refer_transforms(640, 640, test=True))
    our_ds = ReferDatasetResc(
        fixture_dir["ann"], fixture_dir["img_dir"], "unc", "val",
        WordPieceTokenizer(fixture_dir["vocab"]),
        img_size=640, max_img_size=640, max_query_len=40, train=False)
    assert len(ref_ds) == len(our_ds) == len(fixture_dir["files"])

    for i in range(len(ref_ds)):
        ref_s, ref_t = ref_ds[i]
        our_s, our_t = our_ds[i]
        # token ids + mask byte-identical
        np.testing.assert_array_equal(our_s["sentence"], ref_s["sentence"])
        np.testing.assert_array_equal(our_s["sentence_valid"],
                                      ref_s["sentence_mask"])
        # sizes
        oh, ow = (int(x) for x in ref_t["size"])
        np.testing.assert_array_equal(np.asarray(our_t["size"]), [oh, ow])
        np.testing.assert_array_equal(np.asarray(our_t["orig_size"]),
                                      ref_t["orig_size"].numpy())
        # pixels on the valid extent: our uint8 canvas vs the reference's
        # normalized tensor inverted — both are PIL-style antialiased
        # bilinear over the same cv2-decoded JPEG
        want = unnorm_chw(ref_s["img"])
        assert want.shape == (oh, ow, 3)
        got = np.asarray(our_s["image"][:oh, :ow])
        diff = np.abs(got.astype(np.int32) - want.astype(np.int32))
        assert diff.max() <= 2, (i, diff.max(), (diff > 2).mean())
        # canvas padding beyond the valid extent is zero
        assert not our_s["image"][oh:].any()
        assert not our_s["image"][:, ow:].any()
        # normalized cxcywh boxes
        np.testing.assert_allclose(np.asarray(our_t["boxes"]),
                                   ref_t["boxes"].numpy(),
                                   rtol=1e-5, atol=1e-6)


def test_flickr_multiphrase_item_parity(fixture_dir, ref_modules):
    _, _, _, ref_mp = ref_modules
    from reftr_tpu.data.datasets import FlickrMultiPhraseDataset
    from reftr_tpu.data.native import WordPieceTokenizer

    ref_ds = ref_mp.flickr30k(
        data_root=fixture_dir["ann"], im_dir=fixture_dir["img_dir"],
        split="val", max_seq_len=90,
        transforms=ref_mp.make_refer_transforms(640, 640, test=True))
    our_ds = FlickrMultiPhraseDataset(
        fixture_dir["ann"], fixture_dir["img_dir"], "val",
        WordPieceTokenizer(fixture_dir["vocab"]),
        img_size=640, max_img_size=640, max_sentence_len=90,
        phrase_seq_len=22, max_num_phrases=16, train=False,
        dataset="flickr")
    assert len(ref_ds) == len(our_ds)

    for i in range(len(ref_ds)):
        ref_s, ref_t = ref_ds[i]
        our_s, our_t = our_ds[i]
        np.testing.assert_array_equal(our_s["sentence"], ref_s["sentence"])
        np.testing.assert_array_equal(our_s["sentence_valid"].astype(bool),
                                      ref_s["sentence_mask"])
        # per-phrase tokenizations incl. the empty-string padding slots
        np.testing.assert_array_equal(our_s["phrases"], ref_s["phrase"])
        np.testing.assert_array_equal(our_s["phrase_valid"].astype(bool),
                                      ref_s["phrase_mask"])
        # char_to_token spans (refer_dataset.py:160-171)
        np.testing.assert_array_equal(our_s["phrase_pos_l"],
                                      ref_s["phrase_pos_l"])
        np.testing.assert_array_equal(our_s["phrase_pos_r"],
                                      ref_s["phrase_pos_r"])
        # pixels
        oh, ow = (int(x) for x in ref_t["size"])
        want = unnorm_chw(ref_s["img"])
        got = np.asarray(our_s["image"][:oh, :ow])
        diff = np.abs(got.astype(np.int32) - want.astype(np.int32))
        assert diff.max() <= 2, (i, diff.max())
        # boxes: the valid phrase rows match; padding rows are flagged
        n = 2
        np.testing.assert_allclose(np.asarray(our_t["boxes"][:n]),
                                   ref_t["boxes"].numpy()[:n],
                                   rtol=1e-5, atol=1e-6)
        assert our_t["box_valid"][:n].all()
        assert not our_t["box_valid"][n:].any()
