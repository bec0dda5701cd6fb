"""Grounding datasets.

Rebuilds the reference's dataset layer (/root/reference/datasets/):
  * ReferDatasetResc — single-phrase REC over .pth annotation pickles
    (resc_refer_dataset.py): refcoco/+/g (xywh->xyxy fix), referit, flickr
    single-phrase, visual genome.
  * FlickrMultiPhraseDataset — Flickr30k Entities multi-phrase
    (grounding_datasets/refer_dataset.py:53-211): full-sentence + per-phrase
    tokenization, token-level phrase spans via char_to_token, padding to
    max_num_phrases with empty-phrase tokenizations.
  * ReferSegDataset — REC+RES with .npy masks (refer_dataset.py:213-318).
  * SyntheticGroundingDataset — in-memory fixture (no files needed) used by
    tests and smoke training; generates colored rectangles + template
    phrases so a model can actually learn the task.

Every dataset emits STATIC-shape numpy samples ready for stacking:
  image [S,S,3] u8, image_valid [S,S] bool, sentence/sentence_valid,
  (multi-phrase: phrases/phrase_valid/phrase_pos_l/phrase_pos_r),
  boxes [P,4] normalized cxcywh, box_valid [P], orig_size [2],
  (seg: mask [S,S] f32, mask_valid scalar).
"""

from __future__ import annotations

import os
import os.path as osp
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from reftr_tpu.data.native import WordPieceTokenizer
from reftr_tpu.data.transforms import transform_sample

# split tables: resc_refer_dataset.py:58-78
SUPPORTED_DATASETS = {
    "referit": {"splits": ("train", "val", "trainval", "test")},
    "unc": {"splits": ("train", "val", "trainval", "testA", "testB")},
    "unc+": {"splits": ("train", "val", "trainval", "testA", "testB")},
    "gref": {"splits": ("train", "val")},
    "gref_umd": {"splits": ("train", "val", "test")},
    "flickr": {"splits": ("train", "val", "test")},
    "vg": {"splits": ("all",)},
}


def load_annotations(data_root: str, dataset: str,
                     split: str) -> List[tuple]:
    """Load {dataset}_{split} annotations (resc_refer_dataset.py:110-116);
    trainval = train+val for non-referit. Prefers torch-free .json files
    (from reftr_tpu.tools.convert_annotations), falls back to the
    reference's .pth torch pickles."""
    path = osp.join(data_root, dataset)
    valid = SUPPORTED_DATASETS[dataset]["splits"]
    if split not in valid:
        raise ValueError(f"{dataset} has no split {split}")
    splits = [split]
    if dataset != "referit" and split == "trainval":
        splits = ["train", "val"]
    images: List[tuple] = []
    for s in splits:
        json_path = osp.join(path, f"{dataset}_{s}.json")
        if osp.exists(json_path):
            import json

            with open(json_path) as f:
                images += [tuple(r) for r in json.load(f)]
        else:
            import torch

            images += torch.load(osp.join(path, f"{dataset}_{s}.pth"),
                                 weights_only=False)
    return images


def _load_image(path: str) -> np.ndarray:
    """RGB uint8 HWC; grayscale replicated to 3 channels
    (resc_refer_dataset.py:134-140)."""
    try:
        import cv2

        img = cv2.imread(path)
        if img is None:
            raise FileNotFoundError(path)
        if img.ndim == 3 and img.shape[-1] == 3:
            return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        return np.stack([img.squeeze()] * 3, axis=-1)
    except ImportError:
        from PIL import Image

        return np.asarray(Image.open(path).convert("RGB"))


class ReferDatasetResc:
    """Single-phrase REC dataset over resc-format annotations."""

    def __init__(
        self,
        data_root: str,
        im_dir: str,
        dataset: str,
        split: str,
        tokenizer: WordPieceTokenizer,
        img_size: int = 640,
        max_img_size: int = 640,
        max_query_len: int = 40,
        train: bool = False,
        hsv_fraction: float = 0.5,
        seed: int = 0,
    ):
        self.records = load_annotations(data_root, dataset, split)
        self.dataset = dataset
        self.im_dir = im_dir
        self.tokenizer = tokenizer
        self.img_size = img_size
        self.max_img_size = max_img_size
        self.max_query_len = max_query_len
        self.train = train
        self.hsv_fraction = hsv_fraction
        self.seed = seed
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def _rng(self, idx: int) -> np.random.Generator:
        # per-call generator: thread-safe under the loader's thread pool and
        # deterministic per (seed, epoch, sample)
        return np.random.default_rng((self.seed, self.epoch, idx))

    def __len__(self):
        return len(self.records)

    def pull_item(self, idx: int):
        """(image u8 HWC, phrase, bbox xyxy) — format fix per
        resc_refer_dataset.py:121-140."""
        rec = self.records[idx]
        if self.dataset in ("flickr", "vg"):
            img_file, bbox, phrase = rec[:3]
        else:
            img_file, _, bbox, phrase = rec[:4]
        bbox = np.array(bbox, dtype=np.int64).astype(np.float32)
        if self.dataset not in ("referit", "flickr"):
            bbox[2] += bbox[0]
            bbox[3] += bbox[1]
        img = _load_image(osp.join(self.im_dir, img_file))
        return img, str(phrase), bbox, img_file

    def __getitem__(self, idx: int) -> Tuple[Dict, Dict]:
        img, phrase, bbox, _ = self.pull_item(idx)
        ts = transform_sample(
            img, bbox[None], self.img_size, self.max_img_size, self.train,
            self._rng(idx), self.hsv_fraction)
        ids, mask, _ = self.tokenizer.encode(phrase.lower(),
                                             self.max_query_len)
        oh, ow = ts.valid_hw
        valid = np.zeros((self.max_img_size, self.max_img_size), bool)
        valid[:oh, :ow] = True
        sample = {
            "image": ts.canvas,
            "image_valid": valid,
            "sentence": ids,
            "sentence_valid": mask,
        }
        target = {
            "boxes": ts.boxes_cxcywh,  # [1, 4]
            "box_valid": np.ones(1, bool),
            "orig_size": np.array(ts.orig_hw, np.int32),
            "size": np.array(ts.valid_hw, np.int32),
            "image_id": np.asarray(idx, np.int32),
        }
        return sample, target


class FlickrMultiPhraseDataset:
    """Flickr30k Entities: one sentence, up to max_num_phrases phrases."""

    def __init__(
        self,
        data_root: str,
        im_dir: str,
        split: str,
        tokenizer: WordPieceTokenizer,
        img_size: int = 640,
        max_img_size: int = 640,
        max_sentence_len: int = 90,
        phrase_seq_len: int = 22,
        max_num_phrases: int = 16,
        train: bool = False,
        hsv_fraction: float = 0.5,
        seed: int = 0,
        dataset: str = "flickr30k_entities",
    ):
        json_path = osp.join(data_root, dataset, f"{dataset}_{split}.json")
        if osp.exists(json_path):
            import json

            with open(json_path) as f:
                self.records = [tuple(r) for r in json.load(f)]
        else:
            import torch

            path = osp.join(data_root, dataset, f"{dataset}_{split}.pth")
            self.records = torch.load(path, weights_only=False)
        self.im_dir = im_dir
        self.tokenizer = tokenizer
        self.img_size = img_size
        self.max_img_size = max_img_size
        self.max_sentence_len = max_sentence_len
        self.phrase_seq_len = phrase_seq_len
        self.max_num_phrases = max_num_phrases
        self.train = train
        self.hsv_fraction = hsv_fraction
        self.seed = seed
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def _rng(self, idx: int) -> np.random.Generator:
        return np.random.default_rng((self.seed, self.epoch, idx))

    def __len__(self):
        return len(self.records)

    def __getitem__(self, idx: int) -> Tuple[Dict, Dict]:
        # annotation tuple: (img_file, phrase_pos, bbox, phrases, _, sentence)
        # (refer_dataset.py:92-97)
        img_file, phrase_pos, bboxes, phrases, _, sentence = \
            self.records[idx][:6]
        img = _load_image(osp.join(self.im_dir, img_file))
        boxes = np.array(bboxes, np.float32).reshape(-1, 4)
        ts = transform_sample(
            img, boxes, self.img_size, self.max_img_size, self.train,
            self._rng(idx), self.hsv_fraction)
        sample, target = self.pack_language(str(sentence), list(phrases),
                                            list(phrase_pos), ts)
        target["image_id"] = np.asarray(idx, np.int32)
        return sample, target

    def pack_language(self, sentence, phrases, phrase_pos, ts):
        tok = self.tokenizer
        sent_ids, sent_mask, sent_offsets = tok.encode(
            sentence.lower(), self.max_sentence_len)

        P, SP = self.max_num_phrases, self.phrase_seq_len
        ph_ids = np.zeros((P, SP), np.int32)
        ph_mask = np.zeros((P, SP), np.int32)
        pos_l = np.zeros(P, np.int32)
        pos_r = np.zeros(P, np.int32)
        n = min(len(phrases), P)
        for j in range(n):
            ids, mask, _ = tok.encode(str(phrases[j]).lower(), SP)
            ph_ids[j] = ids
            ph_mask[j] = mask
            # token span from char positions (refer_dataset.py:160-171).
            # The reference .pth format stores only the char START per
            # phrase (refer_dataset.py:93,160-162: the end is derived from
            # len(phrase)); converted .json annotations may carry (l, r)
            # pairs — accept both.
            pp = phrase_pos[j]
            if np.ndim(pp) == 0:
                c_l = int(pp)
                c_r = c_l + len(str(phrases[j]))
            else:
                c_l, c_r = int(pp[0]), int(pp[1])
            t_l = tok.char_to_token(sent_offsets, sent_mask, c_l)
            t_r = tok.char_to_token(sent_offsets, sent_mask, max(c_r - 1, c_l))
            if t_l is None:
                t_l = 0
            if t_r is None:
                t_r = int(sent_mask.sum()) - 1
            pos_l[j] = t_l
            pos_r[j] = t_r + 1
        # pad slots get empty-phrase tokenization ([CLS][SEP]) and the
        # (0, 1) span like refer_dataset.py:173-183
        for j in range(n, P):
            ids, mask, _ = tok.encode("", SP)
            ph_ids[j] = ids
            ph_mask[j] = mask
            pos_l[j] = 0
            pos_r[j] = 1

        boxes_pad = np.zeros((P, 4), np.float32)
        boxes_pad[:n] = ts.boxes_cxcywh[:n]
        box_valid = np.zeros(P, bool)
        box_valid[:n] = True

        oh, ow = ts.valid_hw
        valid = np.zeros((self.max_img_size, self.max_img_size), bool)
        valid[:oh, :ow] = True
        sample = {
            "image": ts.canvas,
            "image_valid": valid,
            "sentence": sent_ids,
            "sentence_valid": sent_mask,
            "phrases": ph_ids,
            "phrase_valid": ph_mask,
            "phrase_pos_l": pos_l,
            "phrase_pos_r": pos_r,
        }
        target = {
            "boxes": boxes_pad,
            "box_valid": box_valid,
            "orig_size": np.array(ts.orig_hw, np.int32),
            "size": np.array(ts.valid_hw, np.int32),
        }
        return sample, target


class ReferSegDataset(ReferDatasetResc):
    """REC+RES: adds the segmentation mask target (refer_dataset.py:213-318;
    masks are .npy files under <data_root>/masks)."""

    def __init__(self, *args, mask_dir: Optional[str] = None, **kwargs):
        super().__init__(*args, **kwargs)
        self.mask_dir = mask_dir

    def pull_item(self, idx: int):
        # seg annotation tuple: (img_file, seg_file, bbox xyxy, phrase)
        img_file, seg_file, bbox, phrase = self.records[idx][:4]
        img = _load_image(osp.join(self.im_dir, img_file))
        bbox = np.array(bbox, np.float32)
        return img, str(phrase), bbox, img_file, str(seg_file)

    def __getitem__(self, idx: int):
        img, phrase, bbox, _, seg_file = self.pull_item(idx)
        mask = np.load(osp.join(self.mask_dir, seg_file), allow_pickle=True)
        mask = (np.asarray(mask) > 0).astype(np.float32)
        ts = transform_sample(
            img, bbox[None], self.img_size, self.max_img_size, self.train,
            self._rng(idx), self.hsv_fraction, seg_mask=mask)
        ids, tmask, _ = self.tokenizer.encode(phrase.lower(),
                                              self.max_query_len)
        oh, ow = ts.valid_hw
        valid = np.zeros((self.max_img_size, self.max_img_size), bool)
        valid[:oh, :ow] = True
        sample = {
            "image": ts.canvas,
            "image_valid": valid,
            "sentence": ids,
            "sentence_valid": tmask,
        }
        target = {
            "boxes": ts.boxes_cxcywh,
            "box_valid": np.ones(1, bool),
            "masks": ts.mask_canvas,
            "mask_valid": np.asarray(True),
            "orig_size": np.array(ts.orig_hw, np.int32),
            "size": np.array(ts.valid_hw, np.int32),
            "image_id": np.asarray(idx, np.int32),
        }
        return sample, target


# ---------------------------------------------------------------------------
# synthetic fixture
# ---------------------------------------------------------------------------

_COLORS = {
    "red": (200, 40, 40), "green": (40, 180, 60), "blue": (40, 70, 200),
}
_SHAPES = ("box", "block")


class SyntheticGroundingDataset:
    """Colored-rectangle grounding: phrase = '<color> <shape> on the
    <left|right>', box = that rectangle. Learnable end-to-end; no files."""

    def __init__(self, tokenizer: WordPieceTokenizer, n: int = 128,
                 img_size: int = 64, max_query_len: int = 12,
                 with_masks: bool = False, seed: int = 0,
                 canvas: Optional[int] = None,
                 box_frac: Tuple[float, float] = (1 / 6, 1 / 3)):
        # NB: `seed` is accepted for builder-signature uniformity but is
        # UNUSED — item content is a pure function of the index (_make),
        # so the fixture is identical across runs and seeds by design.
        del seed
        self.tokenizer = tokenizer
        self.n = n
        self.img_size = img_size
        self.canvas = canvas or img_size
        self.max_query_len = max_query_len
        self.with_masks = with_masks
        # rectangle side range as a fraction of img_size; the e2e learning
        # test uses larger boxes so IoU@0.5 is a localization test, not a
        # sub-stride precision test
        self.box_frac = box_frac
        # items are generated LAZILY and deterministically per index
        # (_make seeds its own rng with the index), so n can be large —
        # e.g. a from-scratch pretraining stream — without materializing
        # n canvases in host RAM.
        self._paths: Optional[List[str]] = None

    def export_images(self, out_dir: str) -> List[str]:
        """Write the fixture's images to JPEG files and switch __getitem__
        to decode them from disk — a realistic loader workload (decode +
        resize + pack) for measuring data_time vs step_time."""
        from PIL import Image

        os.makedirs(out_dir, exist_ok=True)
        paths = []
        for i in range(self.n):
            p = osp.join(out_dir, f"synth_{i:05d}.jpg")
            if not osp.exists(p):
                Image.fromarray(self._make(i)[0]).save(p, quality=95)
            paths.append(p)
        self._paths = paths
        return paths

    def _make(self, i):
        rng = np.random.default_rng(1000 + i)
        s = self.img_size
        img = np.full((s, s, 3), 128, np.uint8)
        img += rng.integers(-20, 20, size=img.shape).astype(np.uint8)
        color = list(_COLORS)[rng.integers(len(_COLORS))]
        side = "left" if rng.random() < 0.5 else "right"
        lo, hi = (max(2, int(s * f)) for f in self.box_frac)
        w = int(rng.integers(lo, hi))
        h = int(rng.integers(lo, hi))
        x0 = int(rng.integers(0, s // 2 - w)) if side == "left" else int(
            rng.integers(s // 2, s - w))
        y0 = int(rng.integers(0, s - h))
        img[y0:y0 + h, x0:x0 + w] = _COLORS[color]
        # distractor rectangle of a different color on the other side
        other = [c for c in _COLORS if c != color][rng.integers(2)]
        ox = int(rng.integers(s // 2, s - w)) if side == "left" else int(
            rng.integers(0, s // 2 - w))
        oy = int(rng.integers(0, s - h))
        img[oy:oy + h, ox:ox + w] = _COLORS[other]
        phrase = f"the {color} {_SHAPES[int(rng.integers(2))]} on the {side}"
        box = np.array([x0, y0, x0 + w, y0 + h], np.float32)
        mask = None
        if self.with_masks:
            mask = np.zeros((s, s), np.float32)
            mask[y0:y0 + h, x0:x0 + w] = 1.0
        return img, phrase, box, mask

    def __len__(self):
        return self.n

    def __getitem__(self, idx: int):
        img, phrase, box, mask = self._make(idx)
        if self._paths is not None:
            img = _load_image(self._paths[idx])
        ts = transform_sample(img, box[None], self.img_size, self.canvas,
                              False, np.random.default_rng(idx),
                              seg_mask=mask)
        ids, tmask, _ = self.tokenizer.encode(phrase, self.max_query_len)
        oh, ow = ts.valid_hw
        valid = np.zeros((self.canvas, self.canvas), bool)
        valid[:oh, :ow] = True
        sample = {
            "image": ts.canvas,
            "image_valid": valid,
            "sentence": ids,
            "sentence_valid": tmask,
        }
        target = {
            "boxes": ts.boxes_cxcywh,
            "box_valid": np.ones(1, bool),
            "orig_size": np.array(ts.orig_hw, np.int32),
            "size": np.array(ts.valid_hw, np.int32),
            "image_id": np.asarray(idx, np.int32),
        }
        if self.with_masks:
            target["masks"] = ts.mask_canvas
            target["mask_valid"] = np.asarray(True)
        return sample, target


SYNTHETIC_VOCAB = [
    "[PAD]", "[UNK]", "[CLS]", "[SEP]",
    "the", "red", "green", "blue", "box", "block", "on", "left", "right",
]


def write_synthetic_vocab(path: str) -> str:
    """Vocab file covering SyntheticGroundingDataset's phrase templates."""
    with open(path, "w") as f:
        f.write("\n".join(SYNTHETIC_VOCAB) + "\n")
    return path


class SyntheticMultiPhraseDataset:
    """Multi-phrase fixture (flickr30k-entities-shaped): one sentence names
    BOTH rectangles ("the red box on the left and the green box on the
    right"), each phrase grounded to its own box. Exercises per-phrase
    tokenization, char->token spans, and phrase padding end to end."""

    def __init__(self, tokenizer: WordPieceTokenizer, n: int = 128,
                 img_size: int = 64, max_sentence_len: int = 20,
                 phrase_seq_len: int = 8, max_num_phrases: int = 4,
                 seed: int = 0, canvas: Optional[int] = None,
                 box_frac: Tuple[float, float] = (1 / 6, 1 / 3)):
        self.tokenizer = tokenizer
        self.n = n
        self.img_size = img_size
        self.canvas = canvas or img_size
        self.max_sentence_len = max_sentence_len
        self.phrase_seq_len = phrase_seq_len
        self.max_num_phrases = max_num_phrases
        self.box_frac = box_frac
        self.rng = np.random.default_rng(seed)
        self._packer = FlickrMultiPhraseDataset.pack_language

    def __len__(self):
        return self.n

    def __getitem__(self, idx: int):
        rng = np.random.default_rng(5000 + idx)
        s = self.img_size
        img = np.full((s, s, 3), 128, np.uint8)
        colors = list(_COLORS)
        c_left = colors[rng.integers(len(colors))]
        c_right = [c for c in colors if c != c_left][rng.integers(2)]
        boxes = []
        for side, color in (("left", c_left), ("right", c_right)):
            lo, hi = (max(2, int(s * f)) for f in self.box_frac)
            w = int(rng.integers(lo, hi))
            h = int(rng.integers(lo, hi))
            x0 = int(rng.integers(0, s // 2 - w)) if side == "left" else int(
                rng.integers(s // 2, s - w))
            y0 = int(rng.integers(0, s - h))
            img[y0:y0 + h, x0:x0 + w] = _COLORS[color]
            boxes.append([x0, y0, x0 + w, y0 + h])
        ph1 = f"the {c_left} box"
        ph2 = f"the {c_right} box"
        sentence = f"{ph1} on the left and {ph2} on the right"
        pos1 = (0, len(ph1))
        p2_start = sentence.index(ph2, len(ph1))
        pos2 = (p2_start, p2_start + len(ph2))

        ts = transform_sample(img, np.array(boxes, np.float32),
                              self.img_size, self.canvas, False, self.rng)
        # reuse the flickr packer via a stand-in namespace
        class _Self:
            tokenizer = self.tokenizer
            max_sentence_len = self.max_sentence_len
            phrase_seq_len = self.phrase_seq_len
            max_num_phrases = self.max_num_phrases
            max_img_size = self.canvas

        return FlickrMultiPhraseDataset.pack_language(
            _Self, sentence, [ph1, ph2], [pos1, pos2], ts)
