"""Single-image predict CLI (reftr_tpu/cli/predict.py).

No reference counterpart (the reference only evaluates datasets,
main_vg.py:351-361); this pins the serving entry: image file + phrases ->
one JSON-able dict per phrase with a pixel-space box inside the image,
and an annotated JPEG when --output is given.
"""

import json
import os
import tempfile

import numpy as np


def test_predict_cli_end_to_end(tmp_path, capsys):
    from PIL import Image

    from reftr_tpu.cli.predict import main

    rs = np.random.default_rng(0)
    img = rs.integers(0, 255, size=(96, 128, 3)).astype(np.uint8)
    img_path = str(tmp_path / "in.jpg")
    Image.fromarray(img).save(img_path)
    out_path = str(tmp_path / "out.jpg")

    argv = ["--preset", "synthetic_smoke",
            "--image", img_path,
            "--phrase", "a red box",
            "--phrase", "the left thing",
            "--output", out_path]
    assert main(argv) == 0
    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    assert len(lines) == 2
    for line, phrase in zip(lines, ("a red box", "the left thing")):
        r = json.loads(line)
        assert r["phrase"] == phrase
        x0, y0, x1, y1 = r["box_xyxy"]
        # pixel-space box in the ORIGINAL image frame (w=128, h=96)
        assert 0 <= x0 <= x1 <= 128 + 1e-3
        assert 0 <= y0 <= y1 <= 96 + 1e-3
    assert os.path.getsize(out_path) > 0


def test_predict_cli_masks(tmp_path, capsys):
    """--masks e2e: the RES model's mask stats come out in the ORIGINAL
    image frame (the eval-path postproc order, reftr_segmentation.py:
    282-302)."""
    from PIL import Image

    from reftr_tpu.cli.predict import main

    rs = np.random.default_rng(1)
    img = rs.integers(0, 255, size=(80, 112, 3)).astype(np.uint8)
    img_path = str(tmp_path / "in.jpg")
    Image.fromarray(img).save(img_path)

    # hidden_dim=128 / nheads=8: MaskHeadSmallConv GroupNorm(8) needs every
    # channel count (down to hidden//16) divisible by 8 (test_seg_model.py)
    argv = ["--preset", "synthetic_smoke", "--masks",
            "--hidden_dim", "128", "--nheads", "8",
            "--image", img_path,
            "--phrase", "the dark region"]
    assert main(argv) == 0
    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    assert len(lines) == 1
    r = json.loads(lines[0])
    assert r["phrase"] == "the dark region"
    assert r["mask_shape"] == [80, 112]
    assert 0 <= r["mask_area_px"] <= 80 * 112
    x0, y0, x1, y1 = r["box_xyxy"]
    assert 0 <= x0 <= x1 <= 112 + 1e-3
    assert 0 <= y0 <= y1 <= 80 + 1e-3
