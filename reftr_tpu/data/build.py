"""Dataset registry (rebuilds /root/reference/datasets/__init__.py:17-132).

Maps --dataset names to dataset builders with the reference's directory
layout relative to `data_root` (the reference hardcodes "./data"):

  flickr30k        -> multi-phrase Flickr30k Entities
  referit          -> resc 'referit'
  refcoco_unc / refcoco+_unc / refcocog_google / refcocog_umd -> resc
  vg               -> visual genome (split 'all'), other splits -> referit
  flickr30k_resc   -> single-phrase flickr
  flickr30k_refcoco-> concat(flickr_resc, refcoco trainval) for train
  --masks          -> segmentation dataset over refcoco anns

One extra knob vs the reference: `synthetic` builds the in-memory fixture.
"""

from __future__ import annotations

import os.path as osp
from typing import Optional

from reftr_tpu.core.config import DataConfig
from reftr_tpu.data.datasets import (
    FlickrMultiPhraseDataset,
    ReferDatasetResc,
    ReferSegDataset,
    SyntheticGroundingDataset,
)
from reftr_tpu.data.native import WordPieceTokenizer

REFCOCO_VERSIONS = {
    "refcoco_unc": "unc",
    "refcoco+_unc": "unc+",
    "refcocog_google": "gref",
    "refcocog_umd": "gref_umd",
}


class ConcatDataset:
    """GeneralReferDataset equivalent (refer_resc.py:7-24)."""

    def __init__(self, datasets):
        self.datasets = list(datasets)
        self._offsets = []
        total = 0
        for d in self.datasets:
            self._offsets.append(total)
            total += len(d)
        self._total = total

    def __len__(self):
        return self._total

    def __getitem__(self, idx):
        for d, off in zip(reversed(self.datasets), reversed(self._offsets)):
            if idx >= off:
                return d[idx - off]
        raise IndexError(idx)


def build_refer_dataset(split: str, cfg: DataConfig,
                        tokenizer: WordPieceTokenizer, train: bool,
                        masks: bool = False, seed: int = 0):
    root = cfg.data_root
    common = dict(img_size=cfg.img_size, max_img_size=cfg.max_img_size,
                  max_query_len=cfg.max_query_len, train=train,
                  hsv_jitter=None, seed=seed)
    common.pop("hsv_jitter")
    common["hsv_fraction"] = cfg.hsv_jitter

    if cfg.dataset == "synthetic":
        return SyntheticGroundingDataset(
            tokenizer, n=cfg.synthetic_n if train else 64,
            img_size=cfg.img_size,
            canvas=cfg.max_img_size, max_query_len=cfg.max_query_len,
            with_masks=masks, seed=seed,
            box_frac=tuple(cfg.synthetic_box_frac))

    if masks:
        version = REFCOCO_VERSIONS.get(cfg.dataset, cfg.dataset)
        return ReferSegDataset(
            osp.join(root, "refcoco", "anns"),
            osp.join(root, "refcoco", "images", "train2014"),
            version, split, tokenizer,
            mask_dir=osp.join(root, "refcoco", "masks"), **common)

    if cfg.dataset == "flickr30k":
        return FlickrMultiPhraseDataset(
            osp.join(root, "annotations"),
            osp.join(root, "flickr30k", "f30k_images"),
            split, tokenizer, img_size=cfg.img_size,
            max_img_size=cfg.max_img_size,
            max_sentence_len=cfg.max_sentence_len,
            phrase_seq_len=cfg.phrase_seq_len,
            max_num_phrases=cfg.max_num_phrases, train=train,
            hsv_fraction=cfg.hsv_jitter, seed=seed)
    if cfg.dataset == "referit":
        return ReferDatasetResc(
            osp.join(root, "annotations_resc"),
            osp.join(root, "referit", "images"),
            "referit", split, tokenizer, **common)
    if cfg.dataset in REFCOCO_VERSIONS:
        return ReferDatasetResc(
            osp.join(root, "annotations_resc"),
            osp.join(root, "refcoco", "images", "train2014"),
            REFCOCO_VERSIONS[cfg.dataset], split, tokenizer, **common)
    if cfg.dataset == "vg":
        if split != "all":
            return ReferDatasetResc(
                osp.join(root, "annotations_resc"),
                osp.join(root, "referit", "images"),
                "referit", split, tokenizer, **common)
        return ReferDatasetResc(
            osp.join(root, "annotations_resc"),
            osp.join(root, "visualgenome", "VG_100K"),
            "vg", "all", tokenizer, **common)
    if cfg.dataset == "flickr30k_resc":
        return ReferDatasetResc(
            osp.join(root, "annotations_resc"),
            osp.join(root, "flickr30k", "f30k_images"),
            "flickr", split, tokenizer, **common)
    if cfg.dataset == "flickr30k_refcoco":
        f30k = ReferDatasetResc(
            osp.join(root, "annotations_resc"),
            osp.join(root, "flickr30k", "f30k_images"),
            "flickr", split, tokenizer, **common)
        if not split.startswith("train"):
            return f30k
        refcoco = ReferDatasetResc(
            osp.join(root, "annotations_resc"),
            osp.join(root, "refcoco", "images", "train2014"),
            "unc", "trainval", tokenizer, **common)
        return ConcatDataset([f30k, refcoco])
    raise NotImplementedError(cfg.dataset)
