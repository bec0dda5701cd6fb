"""Whole-pipeline dress rehearsal on reference-format data.

Fabricates a miniature `unc` (RefCOCO) data tree in the reference's own
on-disk formats — JPEG images, `.pth` torch-pickled annotation tuples
(resc_refer_dataset.py:110-116 / refer_dataset.py:260-272), `.npy` masks
(refer_dataset.py:265) — then drives the REAL CLI end to end exactly like
the reference's operational loop (README.md:66-84, main_vg.py:167-431):

    --dataset refcoco_unc --masks  ->  train 2 epochs -> per-epoch eval ->
    checkpoint/log.txt/result.json  ->  predict --masks from that checkpoint

This complements tests/test_preprocessing_parity.py (item-level parity)
with the operational proof: the framework ingests the reference's data
formats and completes train -> eval -> checkpoint -> predict in one run.
"""

import json
import os
import os.path as osp

import numpy as np
import pytest

IMG = 64  # canvas + native image size (images are 64x48 to exercise padding)
N_TRAIN, N_VAL = 12, 6

PHRASES = [
    "the red box on the left",
    "a green block on the right",
    "the blue square in the middle",
]
COLORS = [(200, 40, 40), (40, 180, 60), (40, 70, 200)]

# minimal WordPiece vocab covering PHRASES (the tokenizer loads
# vocab.txt from the data root like the offline-HF path, train/loop.py)
VOCAB = "\n".join([
    "[PAD]", "[UNK]", "[CLS]", "[SEP]",
    "a", "the", "red", "green", "blue", "box", "block", "square",
    "on", "in", "left", "right", "middle", "thing",
]) + "\n"


def _write_vocab(root: str) -> None:
    os.makedirs(root, exist_ok=True)
    with open(osp.join(root, "vocab.txt"), "w") as f:
        f.write(VOCAB)


def _fabricate_unc_tree(root: str) -> None:
    """Miniature refcoco/unc tree in the reference's formats.

    Seg annotation tuple (refer_dataset.py:260-272):
        (img_file, seg_file, bbox_xyxy, phrase)
    stored as torch pickles `unc_{split}.pth` under refcoco/anns/unc/.
    """
    import torch
    from PIL import Image

    im_dir = osp.join(root, "refcoco", "images", "train2014")
    ann_dir = osp.join(root, "refcoco", "anns", "unc")
    mask_dir = osp.join(root, "refcoco", "masks")
    for d in (im_dir, ann_dir, mask_dir):
        os.makedirs(d, exist_ok=True)

    def make_split(split: str, n: int, seed: int):
        rng = np.random.default_rng(seed)
        records = []
        for i in range(n):
            h, w = 48, 64
            img = rng.integers(60, 90, size=(h, w, 3)).astype(np.uint8)
            k = int(rng.integers(0, len(PHRASES)))
            bw, bh = int(rng.integers(12, 24)), int(rng.integers(10, 20))
            x0 = int(rng.integers(0, w - bw))
            y0 = int(rng.integers(0, h - bh))
            img[y0:y0 + bh, x0:x0 + bw] = COLORS[k]
            mask = np.zeros((h, w), np.uint8)
            mask[y0:y0 + bh, x0:x0 + bw] = 1
            img_file = f"{split}_{i}.jpg"
            seg_file = f"{split}_{i}.npy"
            Image.fromarray(img).save(osp.join(im_dir, img_file),
                                      quality=95)
            np.save(osp.join(mask_dir, seg_file), mask)
            records.append((img_file, seg_file,
                            [x0, y0, x0 + bw, y0 + bh], PHRASES[k]))
        torch.save(records, osp.join(ann_dir, f"unc_{split}.pth"))

    make_split("train", N_TRAIN, seed=0)
    make_split("val", N_VAL, seed=1)


def _model_flags():
    # hidden_dim=128 / nheads=8: MaskHeadSmallConv GroupNorm(8) needs every
    # channel count (down to hidden//16) divisible by 8 (test_seg_model.py)
    return [
        "--dataset", "refcoco_unc", "--masks",
        "--train_split", "train", "--test_split", "val",
        "--img_size", str(IMG), "--max_img_size", str(IMG),
        "--num_feature_levels", "1",
        "--enc_layers", "2", "--dec_layers", "2",
        "--hidden_dim", "128", "--nheads", "8",
        "--dim_feedforward", "128", "--bert_size", "tiny",
        "--dtype", "float32",
    ]


@pytest.mark.slow
def test_unc_masks_train_eval_checkpoint_predict(tmp_path, capsys):
    from reftr_tpu.cli.main import main as train_main
    from reftr_tpu.cli.predict import main as predict_main

    root = str(tmp_path / "data")
    out = str(tmp_path / "run")
    _write_vocab(root)
    _fabricate_unc_tree(root)

    argv = _model_flags() + [
        "--data_root", root, "--output_dir", out,
        "--batch_size", "8", "--epochs", "2", "--num_workers", "2",
        "--lr", "3e-4", "--lr_backbone", "3e-4",
        "--lr_schedule", "CosineWarmupLR", "--warm_up_epoch", "1",
        "--seed", "0", "--no_donate_state",
    ]
    assert train_main(argv) == 0
    capsys.readouterr()

    # the reference's operational artifacts (main_vg.py:372-421)
    assert osp.isdir(osp.join(out, "checkpoint"))
    log_lines = [json.loads(l) for l in open(osp.join(out, "log.txt"))]
    assert len(log_lines) == 2
    for rec in log_lines:
        assert np.isfinite(rec["train_loss"])
        assert "test_val_accuracy_iou0.5" in rec
        assert "test_val_seg_miou" in rec
    # {image_id: [[x0,y0,x1,y1]]} in original-image pixels
    results = json.load(open(osp.join(out, "refcoco_unc_val_result.json")))
    assert len(results) == N_VAL
    for boxes in results.values():
        (x0, y0, x1, y1), = boxes
        assert 0 <= x0 <= x1 <= 64 + 1e-3 and 0 <= y0 <= y1 <= 48 + 1e-3

    # predict --masks from the run's checkpoint, on a fabricated image
    img_path = osp.join(root, "refcoco", "images", "train2014",
                        "val_0.jpg")
    pargv = _model_flags() + [
        "--data_root", root,
        "--resume", osp.join(out, "checkpoint"),
        "--image", img_path, "--phrase", PHRASES[0],
    ]
    assert predict_main(pargv) == 0
    lines = [l for l in capsys.readouterr().out.splitlines()
             if l.strip().startswith("{")]
    r = json.loads(lines[-1])
    assert r["phrase"] == PHRASES[0]
    assert r["mask_shape"] == [48, 64]
    x0, y0, x1, y1 = r["box_xyxy"]
    assert 0 <= x0 <= x1 <= 64 + 1e-3
    assert 0 <= y0 <= y1 <= 48 + 1e-3


@pytest.mark.slow
def test_unc_rec_pth_ingestion_eval_only(tmp_path, capsys):
    """REC (non-seg) path over resc-format .pth: xywh->xyxy fix
    (resc_refer_dataset.py:127-131) + eval-only mode (main_vg.py:351-361)."""
    import torch

    from reftr_tpu.cli.main import main as train_main

    root = str(tmp_path / "data")
    im_dir = osp.join(root, "refcoco", "images", "train2014")
    ann_dir = osp.join(root, "annotations_resc", "unc")
    _write_vocab(root)
    os.makedirs(im_dir, exist_ok=True)
    os.makedirs(ann_dir, exist_ok=True)

    from PIL import Image

    rng = np.random.default_rng(2)
    records = []
    for i in range(8):
        img = rng.integers(0, 255, size=(48, 64, 3)).astype(np.uint8)
        img_file = f"v{i}.jpg"
        Image.fromarray(img).save(osp.join(im_dir, img_file))
        # resc REC tuple: (img_file, _, bbox xywh, phrase, attri)
        records.append((img_file, None, [10, 8, 20, 16], "the thing", ""))
    torch.save(records, osp.join(ann_dir, "unc_val.pth"))

    out = str(tmp_path / "run")
    argv = [
        "--dataset", "refcoco_unc", "--eval",
        "--train_split", "val", "--test_split", "val",
        "--img_size", str(IMG), "--max_img_size", str(IMG),
        "--num_feature_levels", "1",
        "--enc_layers", "1", "--dec_layers", "1",
        "--hidden_dim", "64", "--nheads", "4",
        "--dim_feedforward", "64", "--bert_size", "tiny",
        "--dtype", "float32",
        "--data_root", root, "--output_dir", out,
        "--batch_size", "8", "--num_workers", "2", "--no_donate_state",
    ]
    assert train_main(argv) == 0
    results = json.load(open(osp.join(out, "refcoco_unc_val_result.json")))
    assert len(results) == 8
    for boxes in results.values():
        (x0, y0, x1, y1), = boxes
        assert 0 <= x0 <= x1 <= 64 + 1e-3 and 0 <= y0 <= y1 <= 48 + 1e-3
