"""TensorBoard log conversion and qualitative eval dump tools."""

import json
import os

import jax
import numpy as np
import pytest

from reftr_tpu.tools.visualize import (
    draw_boxes,
    dump_eval_visuals,
    heatmap_image,
)


def test_vis_log_conversion(tmp_path):
    tf = pytest.importorskip("tensorflow")

    from reftr_tpu.tools.vis_log import convert_from_log

    lines = [
        {"epoch": 0, "train_loss": 3.2, "test_val_accuracy_iou0.5": 0.1,
         "n_parameters": 1000, "note": "text ignored"},
        {"epoch": 1, "train_loss": 2.1, "test_val_accuracy_iou0.5": 0.4,
         "n_parameters": 1000},
    ]
    with open(tmp_path / "log.txt", "w") as f:
        for ln in lines:
            f.write(json.dumps(ln) + "\n")
    convert_from_log(str(tmp_path))
    tb = tmp_path / "tb"
    events = [f for f in os.listdir(tb) if "tfevents" in f]
    assert events, "no event file written"
    # read the scalars back
    seen = {}
    for e in tf.compat.v1.train.summary_iterator(str(tb / events[0])):
        for v in e.summary.value:
            val = tf.make_ndarray(v.tensor) if v.HasField("tensor") else \
                v.simple_value
            seen.setdefault(v.tag, []).append((e.step, float(val)))
    assert ("train/train_loss" in seen
            and "test/test_val_accuracy_iou0.5" in seen)
    assert sorted(seen["train/train_loss"]) == [(0, pytest.approx(3.2)),
                                                (1, pytest.approx(2.1))]


def test_unnormalize_round_trip(rng):
    """normalize -> unnormalize recovers the uint8 pixels exactly (the
    qualitative eval dumps use this inverse; the old rough *58+116
    constants produced a color cast)."""
    from reftr_tpu.ops.image import normalize_images, unnormalize_images

    img = rng.integers(0, 256, (2, 16, 16, 3)).astype(np.uint8)
    norm = np.asarray(normalize_images(img))
    back = unnormalize_images(norm)
    np.testing.assert_array_equal(back, img)


def test_draw_boxes_and_heatmap(rng):
    img = rng.integers(0, 255, (40, 60, 3)).astype(np.uint8)
    im = draw_boxes(img, np.array([[5, 5, 20, 20], [30, 10, 55, 35]]))
    arr = np.asarray(im)
    assert arr.shape == (40, 60, 3)
    # the red outline actually landed on the first box's top edge
    assert (arr[5, 5:20] == [255, 0, 0]).all(axis=-1).any()

    hm = heatmap_image(rng.random((16, 16)))
    assert np.asarray(hm).shape == (16, 16, 3)


def test_dump_eval_visuals(tmp_path, rng):
    img = rng.integers(0, 255, (32, 32, 3)).astype(np.uint8)
    dump_eval_visuals(
        str(tmp_path), 7, img,
        pred_box_xyxy=np.array([4, 4, 20, 20], np.float32),
        gt_box_xyxy=np.array([5, 5, 21, 21], np.float32),
        pred_mask=rng.random((32, 32)) > 0.5,
        gt_mask=(rng.random((32, 32)) > 0.5).astype(np.float32),
        attention=rng.random((4, 8, 8)).astype(np.float32))
    vis = tmp_path / "vis"
    assert (vis / "boxes" / "00007.jpg").exists()
    assert (vis / "mask" / "00007.jpg").exists()
    assert (vis / "gt_mask" / "00007.jpg").exists()
    assert (vis / "att" / "00007_h3.jpg").exists()
    from PIL import Image

    for sub in ("boxes", "mask", "gt_mask", "att"):
        for f in (vis / sub).iterdir():
            Image.open(f).verify()  # valid image files


@pytest.mark.skipif(jax.default_backend() not in ("tpu", "axon"),
                    reason="xprof framework_op_stats has no rows for the "
                    "XLA-CPU backend (host plane only, single IDLE row); "
                    "run with REFTR_TEST_TPU=1")
def test_op_profile_tiny(capsys):
    """The xprof op-profile tool (tools/op_profile.py) end to end: trace a
    tiny forward, parse framework_op_stats, print a ranked device-op
    table. Verified by hand on the real chip (499 device ops, HBM-bound
    copy-dones + backbone convs at the top, as expected at 64px)."""
    from reftr_tpu.tools.op_profile import profile

    dev, idx = profile("tiny", topk=5, steps=2)
    out = capsys.readouterr().out
    assert " ops=" in out and "operation" in out
    assert len(dev) > 0
    # every row the tool ranked is a device op with a parseable self time
    assert all(float(r[idx["total_self_time"]]) >= 0 for r in dev)
