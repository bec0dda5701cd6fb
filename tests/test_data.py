"""Data layer tests: transforms, samplers, loader, synthetic dataset, and a
resc-format .pth ingestion roundtrip."""

import os
import tempfile

import numpy as np
import pytest

from reftr_tpu.data.datasets import (
    FlickrMultiPhraseDataset,
    ReferDatasetResc,
    SyntheticGroundingDataset,
    write_synthetic_vocab,
)
from reftr_tpu.data.loader import DataLoader, collate
from reftr_tpu.data.native import WordPieceTokenizer
from reftr_tpu.data.samplers import NodeShardedSampler, ShardedSampler
from reftr_tpu.data.transforms import resize_target_hw, transform_sample


@pytest.fixture(scope="module")
def synth_tok():
    path = os.path.join(tempfile.mkdtemp(), "vocab.txt")
    write_synthetic_vocab(path)
    return WordPieceTokenizer(path)


def test_resize_target_matches_reference_rule():
    # size == max_size == 640: long side -> 640
    assert resize_target_hw(480, 640, 640, 640) == (480, 640)
    assert resize_target_hw(400, 500, 640, 640) == (512, 640)
    assert resize_target_hw(500, 400, 640, 640) == (640, 512)
    assert resize_target_hw(640, 640, 640, 640) == (640, 640)
    # classic DETR: short side 800 capped at 1333
    assert resize_target_hw(480, 640, 800, 1333) == (800, 1066)


def test_transform_sample_box_normalization(rng):
    img = rng.integers(0, 255, size=(100, 200, 3)).astype(np.uint8)
    boxes = np.array([[20, 10, 60, 50]], np.float32)
    ts = transform_sample(img, boxes, 64, 64, train=False)
    # 200x100 -> (32, 64)
    assert ts.valid_hw == (32, 64)
    assert ts.canvas.shape == (64, 64, 3)
    # box scaled by 0.32 both axes then normalized by (64, 32)
    b = ts.boxes_cxcywh[0]
    np.testing.assert_allclose(
        b, [(20 + 60) / 2 * 0.32 / 64, (10 + 50) / 2 * 0.32 / 32,
            40 * 0.32 / 64, 40 * 0.32 / 32], rtol=1e-5)
    # canvas below the valid rows is zero
    assert (ts.canvas[32:] == 0).all()


def test_sharded_sampler_partition():
    total = set()
    for rank in range(4):
        s = ShardedSampler(103, num_replicas=4, rank=rank, seed=7)
        s.set_epoch(3)
        idx = list(s)
        assert len(idx) == 26
        total.update(idx)
    assert total == set(range(103))  # every sample covered after padding

    # different epochs give different orders
    s = ShardedSampler(103, num_replicas=1, rank=0, seed=7)
    s.set_epoch(0)
    a = list(s)
    s.set_epoch(1)
    b = list(s)
    assert a != b and sorted(a) == sorted(b)


def test_node_sharded_sampler():
    # 2 nodes x 2 local ranks; rank r's local cache holds idx % 2 == r % 2
    seen = []
    for rank in range(4):
        s = NodeShardedSampler(64, num_replicas=4, rank=rank,
                               local_rank=rank % 2, local_size=2)
        idx = list(s)
        assert all(i % 2 == rank % 2 for i in idx)
        seen += idx
    assert set(seen) == set(range(64))


def test_synthetic_dataset_and_loader(synth_tok):
    ds = SyntheticGroundingDataset(synth_tok, n=20, img_size=32)
    sample, target = ds[0]
    assert sample["image"].shape == (32, 32, 3)
    assert sample["sentence"].shape == (12,)
    assert target["boxes"].shape == (1, 4)
    assert (target["boxes"] >= 0).all() and (target["boxes"] <= 1).all()

    loader = DataLoader(ds, batch_size=4,
                        sampler=ShardedSampler(len(ds), shuffle=True))
    batches = list(loader)
    assert len(batches) == 5
    s, t = batches[0]
    assert s["image"].shape == (4, 32, 32, 3)
    assert s["image"].dtype == np.uint8
    assert t["boxes"].shape == (4, 1, 4)


def test_loader_propagates_worker_errors(synth_tok):
    ds = SyntheticGroundingDataset(synth_tok, n=8, img_size=16)

    class Broken:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            if i == 3:
                raise RuntimeError("boom")
            return ds[i % 8]

    loader = DataLoader(Broken(), batch_size=4)
    with pytest.raises(RuntimeError, match="boom"):
        list(loader)


def _write_resc_pth(tmpdir, rng):
    """Fixture: refcoco-style annotations + images on disk."""
    import cv2
    import torch

    os.makedirs(os.path.join(tmpdir, "unc"), exist_ok=True)
    im_dir = os.path.join(tmpdir, "images")
    os.makedirs(im_dir, exist_ok=True)
    records = []
    for i in range(6):
        name = f"img_{i}.jpg"
        img = rng.integers(0, 255, size=(80, 120, 3)).astype(np.uint8)
        cv2.imwrite(os.path.join(im_dir, name), img)
        # resc refcoco tuple: (img_file, _, bbox xywh, phrase, attri)
        records.append((name, None, [10, 20, 30, 40], f"thing {i}", None))
    torch.save(records, os.path.join(tmpdir, "unc", "unc_val.pth"))
    return tmpdir, im_dir


def test_resc_dataset_ingestion(rng, synth_tok):
    tmp = tempfile.mkdtemp()
    data_root, im_dir = _write_resc_pth(tmp, rng)
    ds = ReferDatasetResc(data_root, im_dir, "unc", "val", synth_tok,
                          img_size=64, max_img_size=64, max_query_len=8)
    assert len(ds) == 6
    sample, target = ds[2]
    assert sample["image"].shape == (64, 64, 3)
    # xywh -> xyxy: [10,20,40,60] on a 120x80 image -> resized (43,64)
    oh, ow = target["size"]
    assert (oh, ow) == (43, 64)
    b = target["boxes"][0]
    rw, rh = 64 / 120, 43 / 80
    np.testing.assert_allclose(
        b, [25 * rw / 64, 40 * rh / 43, 30 * rw / 64, 40 * rh / 43],
        rtol=1e-4)


def test_flickr_multiphrase_spans(rng, synth_tok):
    """char spans -> token spans through the real tokenizer."""
    import torch

    tmp = tempfile.mkdtemp()
    ddir = os.path.join(tmp, "flickr30k_entities")
    os.makedirs(ddir)
    im_dir = os.path.join(tmp, "images")
    os.makedirs(im_dir)
    import cv2

    cv2.imwrite(os.path.join(im_dir, "a.jpg"),
                rng.integers(0, 255, size=(60, 90, 3)).astype(np.uint8))
    sentence = "the red box on the left"
    # phrase "red box" at chars [4, 11); "the left" at [15, 23)
    rec = ("a.jpg", [(4, 11), (15, 23)], [[5, 5, 30, 30], [40, 10, 80, 50]],
           ["red box", "the left"], None, sentence)
    torch.save([rec], os.path.join(ddir, "flickr30k_entities_val.pth"))

    ds = FlickrMultiPhraseDataset(
        tmp, im_dir, "val", synth_tok, img_size=64, max_img_size=64,
        max_sentence_len=16, phrase_seq_len=6, max_num_phrases=4)
    sample, target = ds[0]
    # sentence tokens: [CLS] the red box on the left [SEP]
    assert int(sample["sentence_valid"].sum()) == 8
    np.testing.assert_array_equal(sample["phrase_pos_l"][:2], [2, 5])
    np.testing.assert_array_equal(sample["phrase_pos_r"][:2], [4, 7])
    # 2 real phrases + 2 pad slots with [CLS][SEP]-only masks
    np.testing.assert_array_equal(target["box_valid"], [1, 1, 0, 0])
    assert int(sample["phrase_valid"][2].sum()) == 2
    # phrase-validity rule used by the model: 3rd token of the mask
    assert sample["phrase_valid"][0, 2] == 1
    assert sample["phrase_valid"][2, 2] == 0


def test_annotation_json_conversion(rng, synth_tok):
    """convert .pth -> .json, then the dataset loads from JSON (no torch)."""
    from reftr_tpu.tools.convert_annotations import convert_file

    tmp = tempfile.mkdtemp()
    data_root, im_dir = _write_resc_pth(tmp, rng)
    pth = os.path.join(data_root, "unc", "unc_val.pth")
    out = convert_file(pth)
    assert out.endswith("unc_val.json")
    os.remove(pth)  # force the JSON path
    ds = ReferDatasetResc(data_root, im_dir, "unc", "val", synth_tok,
                          img_size=64, max_img_size=64, max_query_len=8)
    assert len(ds) == 6
    sample, target = ds[1]
    assert sample["image"].shape == (64, 64, 3)
    assert target["boxes"].shape == (1, 4)


def test_random_affine_and_letterbox(rng):
    from reftr_tpu.data.affine import letterbox, random_affine, wrap_points

    img = rng.integers(0, 255, size=(60, 90, 3)).astype(np.uint8)
    boxes = np.array([[20, 10, 60, 45]], np.float32)

    # identity-ish affine (zero ranges) keeps the box where it was
    g = np.random.default_rng(0)
    out, _, b2 = random_affine(img, None, boxes, g, degrees=(0, 0),
                               translate=(0, 0), scale=(1, 1), shear=(0, 0))
    assert out.shape == (90, 90, 3)
    np.testing.assert_allclose(b2[0], boxes[0], atol=1.0)

    # a real warp keeps boxes inside the canvas and areas sane
    g = np.random.default_rng(3)
    out, mask, b3 = random_affine(
        img, (rng.uniform(size=(60, 90)) > 0.5).astype(np.uint8) * 255,
        boxes, g)
    assert (b3 >= 0).all() and (b3 <= 90).all()
    assert (b3[:, 2] > b3[:, 0]).all() and (b3[:, 3] > b3[:, 1]).all()
    assert mask.shape == (90, 90)

    lb, lmask, ratio, dw, dh = letterbox(img, None, 64)
    assert lb.shape == (64, 64, 3)
    assert ratio == 64 / 90


def test_affine_rotation_matches_cv2():
    import cv2
    import math
    from reftr_tpu.data.affine import _affine_matrix

    class FixedRng:
        """rng.random() sequence: rotation-a, scale-s, tx, ty, shx, shy."""
        def __init__(self, vals):
            self.vals = list(vals)
        def random(self):
            return self.vals.pop(0)

    # rotation+scale only (translate/shear zeroed by ranges)
    M, a = _affine_matrix((60, 90), FixedRng([0.73, 0.4, 0.5, 0.5, 0.5, 0.5]),
                          degrees=(-10, 10), translate=(0, 0),
                          scale=(0.9, 1.1), shear=(0, 0))
    s = 0.4 * 0.2 + 0.9
    cvR = cv2.getRotationMatrix2D(angle=a, center=(45.0, 30.0), scale=s)
    np.testing.assert_allclose(M[:2], cvR, atol=1e-9)


def test_synthetic_multiphrase_e2e(synth_tok):
    from reftr_tpu.data.datasets import SyntheticMultiPhraseDataset

    ds = SyntheticMultiPhraseDataset(synth_tok, n=8, img_size=32)
    sample, target = ds[0]
    assert sample["phrases"].shape == (4, 8)
    np.testing.assert_array_equal(target["box_valid"], [1, 1, 0, 0])
    # both phrase spans point at real sentence tokens
    assert sample["phrase_pos_l"][0] >= 1
    assert sample["phrase_pos_r"][1] > sample["phrase_pos_l"][1]
    assert (target["boxes"][:2] > 0).all()

    # full multi-phrase model forward + criterion on a collated batch
    import jax

    from reftr_tpu.data.loader import collate
    from reftr_tpu.core.config import LossConfig
    from reftr_tpu.models.criterion import criterion
    from reftr_tpu.models.reftr import RefTR
    from tests.test_model_forward import tiny_model_config

    samples, targets = collate([ds[i] for i in range(4)])
    model = RefTR(tiny_model_config())
    params = model.init(jax.random.PRNGKey(0), samples)
    out = model.apply(params, samples)
    assert out["pred_boxes"].shape == (4, 4, 1, 4)
    pm = np.asarray(out["phrase_mask"]).reshape(4, 4)
    np.testing.assert_array_equal(pm[:, :2], np.ones((4, 2), bool))
    np.testing.assert_array_equal(pm[:, 2:], np.zeros((4, 2), bool))
    t = {k: v for k, v in targets.items() if k in ("boxes", "box_valid")}
    losses = criterion(out, t, LossConfig())
    assert np.isfinite(float(losses["loss_bbox"]))


def test_disk_backed_synthetic_roundtrip(tmp_path, synth_tok):
    ds = SyntheticGroundingDataset(synth_tok, n=4, img_size=32)
    s_mem, t_mem = ds[1]
    ds.export_images(str(tmp_path))
    assert len(list(tmp_path.glob("*.jpg"))) == 4
    s_disk, t_disk = ds[1]
    # JPEG is lossy: images close, targets identical
    assert s_disk["image"].shape == s_mem["image"].shape
    err = np.abs(s_disk["image"].astype(np.int32)
                 - s_mem["image"].astype(np.int32)).mean()
    assert err < 16.0  # JPEG noise; a wrong image would be ~85
    np.testing.assert_array_equal(t_disk["boxes"], t_mem["boxes"])


def test_loader_pipelines_across_batches():
    """A straggler item in batch N must not stall batch N+1's fetches
    (the round-1 loader pool.map'd one span to completion at a time)."""
    import threading
    import time

    starts = {}
    lock = threading.Lock()
    item0_done = threading.Event()

    class SlowFirst:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            with lock:
                # ordering by events, not wall-clock thresholds (the loaded
                # 1-core sandbox schedules worker threads late)
                starts[i] = item0_done.is_set()
            if i == 0:
                time.sleep(1.0)
                item0_done.set()
            return ({"x": np.zeros(1, np.float32)},
                    {"y": np.zeros(1, np.float32)})

    loader = DataLoader(SlowFirst(), batch_size=2, num_workers=4,
                        drop_last=True)
    batches = list(iter(loader))
    assert len(batches) == 4
    # batch 1 items (2,3) started while item 0 was still sleeping
    assert starts[2] is False, "batch 2 fetch waited on batch 0 straggler"
    assert starts[3] is False
