"""Micro-batching HTTP serving runtime (tools/serve.py).

No reference counterpart (the reference deploys nothing; serving means
--eval over a dataset). These tests pin the production contract: JSON
requests round-trip through preprocessing -> micro-batcher -> compiled
forward -> pixel-space boxes, concurrent requests share one static-shape
batch, and the exported-artifact backend serves the same API.
"""

import base64
import concurrent.futures
import io
import json
import os
import tempfile
import threading
import urllib.request

import numpy as np
import pytest

from reftr_tpu.core.config import BertConfig, DataConfig, ModelConfig, \
    RefTRConfig
from reftr_tpu.tools.serve import build_server


def tiny_cfg():
    mc = ModelConfig(backbone="resnet50", enc_layers=2, dec_layers=2,
                     dim_feedforward=64, hidden_dim=32, nheads=4,
                     bert=BertConfig.tiny(), aux_loss=False,
                     dtype="float32")
    dc = DataConfig(dataset="synthetic", img_size=64, max_img_size=64,
                    max_query_len=12)
    return RefTRConfig(model=mc, data=dc)


def encode_image(rng, h=48, w=64):
    from PIL import Image

    img = rng.integers(0, 255, size=(h, w, 3)).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG")
    return base64.b64encode(buf.getvalue()).decode()


def post(url, payload, timeout=120):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    try:
        with urllib.request.urlopen(req, timeout=timeout) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def get(url, timeout=30):
    with urllib.request.urlopen(url, timeout=timeout) as r:
        return r.status, json.loads(r.read())


@pytest.fixture(scope="module")
def server():
    cfg = tiny_cfg()
    srv, batcher = build_server(cfg, host="127.0.0.1", port=0,
                                serve_batch=4, batch_timeout_ms=40.0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    yield base
    srv.shutdown()
    batcher.stop()
    srv.server_close()


def test_healthz(server):
    code, body = get(server + "/healthz")
    assert code == 200
    assert body["ok"] is True
    assert body["batch_size"] == 4


def test_predict_single_request(server):
    rng = np.random.default_rng(0)
    code, body = post(server + "/predict", {
        "image_b64": encode_image(rng, h=48, w=64),
        "phrases": ["the red box", "a thing"],
    })
    assert code == 200, body
    results = body["results"]
    assert [r["phrase"] for r in results] == ["the red box", "a thing"]
    for r in results:
        x0, y0, x1, y1 = r["box_xyxy"]
        # pixel-space box in the ORIGINAL (pre-resize) image frame
        assert 0 <= x0 <= x1 <= 64 + 1e-3
        assert 0 <= y0 <= y1 <= 48 + 1e-3


def test_concurrent_requests_share_batches(server):
    rng = np.random.default_rng(1)
    img = encode_image(rng)
    _, before = get(server + "/stats")
    with concurrent.futures.ThreadPoolExecutor(4) as ex:
        futs = [ex.submit(post, server + "/predict",
                          {"image_b64": img, "phrases": [f"phrase {i}"]})
                for i in range(4)]
        outs = [f.result() for f in futs]
    assert all(code == 200 for code, _ in outs)
    _, after = get(server + "/stats")
    assert after["rows"] - before["rows"] == 4
    # 4 single-row requests against batch_size=4 with a 40 ms window must
    # coalesce into fewer than 4 dispatches
    assert after["batches"] - before["batches"] < 4


def test_bad_requests(server):
    code, body = post(server + "/predict", {"phrases": ["x"]})
    assert code == 400 and "image_b64" in body["error"]
    code, body = post(server + "/predict", {"image_b64": "zzz"})
    assert code == 400
    rng = np.random.default_rng(2)
    code, body = post(server + "/predict", {
        "image_b64": encode_image(rng),
        "phrases": [f"p{i}" for i in range(5)],  # > serve_batch
    })
    assert code == 500 and "serve batch" in body["error"]
    code, _ = get(server + "/stats")
    assert code == 200  # server still healthy


def test_serve_seg_model_emits_masks():
    """RES serving end-to-end: a masks=True model served over HTTP returns
    per-phrase mask stats in the ORIGINAL image frame, preserving the
    reference's seg postproc semantics (upsample -> crop valid extent ->
    resize to original; reftr_segmentation.py:282-302)."""
    # hidden_dim=128 / nheads=8 so every MaskHeadSmallConv GroupNorm(8)
    # channel count divides by 8 (see tests/test_seg_model.py::seg_setup)
    mc = ModelConfig(backbone="resnet50", enc_layers=2, dec_layers=2,
                     dim_feedforward=64, hidden_dim=128, nheads=8,
                     bert=BertConfig.tiny(), aux_loss=False,
                     dtype="float32", masks=True)
    dc = DataConfig(dataset="synthetic", img_size=64, max_img_size=64,
                    max_query_len=12)
    cfg = RefTRConfig(model=mc, data=dc)
    srv, batcher = build_server(cfg, host="127.0.0.1", port=0,
                                serve_batch=2, batch_timeout_ms=5.0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    rng = np.random.default_rng(5)
    try:
        code, body = get(base + "/healthz")
        assert code == 200 and body["masks"] is True
        code, body = post(base + "/predict", {
            "image_b64": encode_image(rng, h=40, w=56),
            "phrases": ["the blob", "its shadow"],
        })
        assert code == 200, body
        results = body["results"]
        assert [r["phrase"] for r in results] == ["the blob", "its shadow"]
        for r in results:
            # mask stats in the ORIGINAL (pre-resize) image frame
            assert r["mask_shape"] == [40, 56]
            assert 0 <= r["mask_area_px"] <= 40 * 56
            x0, y0, x1, y1 = r["box_xyxy"]
            assert 0 <= x0 <= x1 <= 56 + 1e-3
            assert 0 <= y0 <= y1 <= 40 + 1e-3
    finally:
        srv.shutdown()
        batcher.stop()
        srv.server_close()


def test_exported_artifact_backend():
    """The full deployment chain: export an AOT artifact, serve from it."""
    from reftr_tpu.tools.export_model import export_with_config

    cfg = tiny_cfg()
    rng = np.random.default_rng(3)
    with tempfile.TemporaryDirectory() as d:
        out = os.path.join(d, "exported")
        export_with_config(cfg, resume="", out_dir=out, batch_size=2,
                           platforms=("cpu",), print_fn=lambda *a: None)
        srv, batcher = build_server(cfg, host="127.0.0.1", port=0,
                                    serve_batch=8,  # overridden by manifest
                                    batch_timeout_ms=5.0, exported_dir=out)
        assert batcher.model.batch_size == 2  # manifest wins
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        base = f"http://127.0.0.1:{srv.server_address[1]}"
        try:
            code, body = post(base + "/predict", {
                "image_b64": encode_image(rng, h=40, w=56),
                "phrases": ["the blob"],
            })
            assert code == 200, body
            x0, y0, x1, y1 = body["results"][0]["box_xyxy"]
            assert 0 <= x0 <= x1 <= 56 + 1e-3
            assert 0 <= y0 <= y1 <= 40 + 1e-3
        finally:
            srv.shutdown()
            batcher.stop()
            srv.server_close()
