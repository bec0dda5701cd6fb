"""Launcher, URL checkpoint hub, and crop/hflip capability transforms."""

import http.server
import os
import sys
import tempfile
import threading

import numpy as np
import pytest

from reftr_tpu.core import hub
from reftr_tpu.data.transforms import (
    center_crop_region,
    crop,
    hflip,
    random_crop_region,
)
from reftr_tpu.tools.launch import build_env, launch, parse_args


# ---------------------------------------------------------------- launcher

def test_launcher_spawns_ranked_processes():
    out = tempfile.mkdtemp()
    script = (
        "import os; open(os.path.join(%r, os.environ['JAX_PROCESS_ID']),"
        " 'w').write(','.join(os.environ[k] for k in"
        " ('JAX_PROCESS_ID', 'JAX_NUM_PROCESSES', 'LOCAL_RANK',"
        " 'JAX_COORDINATOR_ADDRESS')))" % out)
    args = parse_args([
        "--nproc_per_node", "3", "--coordinator_port", "12355", "--",
        sys.executable, "-c", script])
    assert launch(args) == 0
    got = {f: open(os.path.join(out, f)).read() for f in os.listdir(out)}
    assert set(got) == {"0", "1", "2"}
    for r in range(3):
        pid, world, local, coord = got[str(r)].split(",")
        assert (int(pid), int(world), int(local)) == (r, 3, r)
        assert coord == "127.0.0.1:12355"


def test_launcher_multinode_rank_offset():
    args = parse_args(["--nnodes", "2", "--node_rank", "1",
                       "--nproc_per_node", "4", "--", "true"])
    env = build_env(args, local_rank=2)
    assert env["JAX_PROCESS_ID"] == "6"
    assert env["JAX_NUM_PROCESSES"] == "8"
    assert env["RANK"] == "6" and env["WORLD_SIZE"] == "8"


def test_launcher_propagates_child_failure():
    # rank 1 fails fast; the launcher must return its code and reap rank 0
    script = ("import os, sys, time\n"
              "if os.environ['JAX_PROCESS_ID'] == '1': sys.exit(3)\n"
              "time.sleep(30)\n")
    args = parse_args(["--nproc_per_node", "2", "--",
                       sys.executable, "-c", script])
    assert launch(args) == 3  # returns promptly: sibling terminated


# -------------------------------------------------------------------- hub

def test_url_checkpoint_download_and_cache(tmp_path, monkeypatch):
    monkeypatch.setenv("REFTR_CACHE_DIR", str(tmp_path / "cache"))
    serve_dir = tmp_path / "srv"
    serve_dir.mkdir()
    (serve_dir / "model.pth").write_bytes(b"payload-v1")

    handler = lambda *a, **kw: http.server.SimpleHTTPRequestHandler(
        *a, directory=str(serve_dir), **kw)
    httpd = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{port}/model.pth"
        assert hub.is_url(url) and not hub.is_url("/tmp/model.pth")
        local = hub.download_checkpoint(url, progress_fn=lambda *_: None)
        assert open(local, "rb").read() == b"payload-v1"
        assert local.endswith("model.pth")
        # cached: a second call must not re-fetch (server file changed)
        (serve_dir / "model.pth").write_bytes(b"payload-v2")
        again = hub.download_checkpoint(url, progress_fn=lambda *_: None)
        assert again == local
        assert open(again, "rb").read() == b"payload-v1"
        # no stray .part files left behind
        assert not [f for f in os.listdir(hub.cache_dir())
                    if f.endswith(".part")]
    finally:
        httpd.shutdown()
        httpd.server_close()


# ------------------------------------------------------------- crop/hflip

def test_crop_box_clamp_and_keep(rng):
    img = rng.integers(0, 255, (100, 120, 3)).astype(np.uint8)
    boxes = np.array([
        [10, 10, 50, 50],    # fully inside after shift
        [0, 0, 18, 90],      # left of crop -> degenerate (w=0), dropped
        [30, 5, 110, 40],    # clipped at the right edge
    ], np.float32)
    masks = rng.random((3, 100, 120)) > 0.5
    out_img, out_boxes, keep, out_masks = crop(
        img, boxes, (20, 20, 60, 80), masks=masks)
    assert out_img.shape == (60, 80, 3)
    np.testing.assert_array_equal(keep, [True, False, True])
    # reference math (datasets/transforms.py:32-40): shift by (j,i)=(20,20),
    # clamp to [0, (w=80, h=60)]
    np.testing.assert_allclose(out_boxes, [[0, 0, 30, 30], [10, 0, 80, 20]])
    assert out_masks.shape == (2, 60, 80)
    np.testing.assert_array_equal(out_masks[0], masks[0, 20:80, 20:100])


def test_hflip_matches_reference_math(rng):
    img = rng.integers(0, 255, (40, 60, 3)).astype(np.uint8)
    boxes = np.array([[10, 5, 30, 25]], np.float32)
    mask = rng.random((40, 60)) > 0.5
    out_img, out_boxes, out_mask = hflip(img, boxes, masks=mask)
    # x' = w - x (datasets/transforms.py:72): [60-30, 5, 60-10, 25]
    np.testing.assert_allclose(out_boxes, [[30, 5, 50, 25]])
    np.testing.assert_array_equal(out_img, img[:, ::-1])
    np.testing.assert_array_equal(out_mask, mask[:, ::-1])
    # involution
    img2, boxes2 = hflip(out_img, out_boxes)
    np.testing.assert_array_equal(img2, img)
    np.testing.assert_allclose(boxes2, boxes)


def test_crop_region_helpers(rng):
    assert center_crop_region(100, 80, 60, 40) == (20, 20, 60, 40)
    g = np.random.default_rng(0)
    for _ in range(20):
        t, l, h, w = random_crop_region(50, 70, 30, 30, g)
        assert 0 <= t <= 20 and 0 <= l <= 40 and (h, w) == (30, 30)
    assert random_crop_region(30, 30, 30, 30, g) == (0, 0, 30, 30)


@pytest.mark.slow
def test_url_pretrained_end_to_end(tmp_path, monkeypatch):
    """https:// pretrained load, end to end: a reference-shaped torch
    checkpoint served over HTTP is downloaded (core/hub.py), converted
    (nn/convert.py), and merged into live params — the reference's
    torch.hub URL resume (main_vg.py:307-309)."""
    import torch

    from tests.test_full_model_parity import build_reference_model
    from tests import torchvision_stub

    torchvision_stub.install()
    sys.path.insert(0, "/root/reference")
    try:
        import models.reftr_transformer as ref_rt
        import models.reftr as ref_vl
        import models.modeling.backbone as ref_bb
    finally:
        sys.path.remove("/root/reference")

    ref_model = build_reference_model((ref_rt, ref_vl, ref_bb))
    ckpt = tmp_path / "srv" / "reftr_toy.pth"
    ckpt.parent.mkdir()
    # the FULL reference checkpoint dict (main_vg.py:377-385) — the
    # converter must ignore every non-model key
    sd = ref_model.state_dict()
    fake_opt = {"state": {0: {"step": 3,
                              "exp_avg": torch.zeros(4),
                              "exp_avg_sq": torch.zeros(4)}},
                "param_groups": [{"lr": 1e-4, "params": [0]}]}
    torch.save({
        "model": sd,
        "optimizer": fake_opt,
        "lr_scheduler": {"last_epoch": 120, "_step_count": 121},
        "epoch": 3,
        "args": {"lr": 1e-4, "backbone": "resnet50"},
        "best_val_acc": 0.71,
    }, str(ckpt))

    monkeypatch.setenv("REFTR_CACHE_DIR", str(tmp_path / "cache"))
    handler = lambda *a, **kw: http.server.SimpleHTTPRequestHandler(
        *a, directory=str(ckpt.parent), **kw)
    httpd = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        import jax

        from reftr_tpu.core.config import BertConfig, ModelConfig, RefTRConfig
        from reftr_tpu.models.reftr import RefTR
        from reftr_tpu.nn.convert import convert_reftr
        from reftr_tpu.train.loop import _load_pretrained
        from tests.test_full_model_parity import (
            DEC, ENC, FFN, HEADS, HIDDEN, make_inputs)

        cfg = RefTRConfig(model=ModelConfig(
            hidden_dim=HIDDEN, nheads=HEADS, enc_layers=ENC, dec_layers=DEC,
            dim_feedforward=FFN, dropout=0.0, aux_loss=True,
            bert=BertConfig.tiny(), dtype="float32"))
        model = RefTR(cfg.model)
        rng = np.random.default_rng(0)
        _, batch = make_inputs(rng)
        params = model.init(jax.random.PRNGKey(0), batch)["params"]

        url = f"http://127.0.0.1:{port}/reftr_toy.pth"
        loaded = _load_pretrained(params, url, cfg)

        want = convert_reftr(ref_model.state_dict(), ENC, DEC, bert_layers=2,
                             backbone="resnet50", num_feature_levels=1)
        got_leaf = np.asarray(
            loaded["vl_transformer"]["encoder"]["layers_0"]["self_attn"]
            ["q_proj"]["kernel"])
        np.testing.assert_allclose(
            got_leaf,
            want["vl_transformer"]["encoder"]["layers_0"]["self_attn"]
            ["q_proj"]["kernel"], rtol=1e-6)
        bb = np.asarray(loaded["img_backbone"]["conv1"]["kernel"])
        np.testing.assert_allclose(
            bb, want["img_backbone"]["conv1"]["kernel"], rtol=1e-6)

        # missing/unexpected keys are reported exactly (main_vg.py:312-318):
        # a param tree with an extra head (missing from the checkpoint) and
        # without bbox_embed (whose converted keys become unexpected)
        import reftr_tpu.train.loop as loop_mod

        logs = []
        monkeypatch.setattr(loop_mod, "master_print",
                            lambda *a: logs.append(" ".join(map(str, a))))
        mutated = dict(params)
        mutated["extra_head"] = {"kernel": np.zeros((4, 4), np.float32)}
        popped = mutated.pop("bbox_embed")
        loaded2 = loop_mod._load_pretrained(mutated, url, cfg)
        missing_msgs = [m for m in logs if m.startswith("Missing keys:")]
        unexpected_msgs = [m for m in logs if m.startswith("Unexpected keys:")]
        assert len(missing_msgs) == 1 and len(unexpected_msgs) == 1
        # exactly the one extra leaf is missing (single-element list: no
        # comma separators in the printed repr)
        assert "extra_head" in missing_msgs[0]
        assert ", " not in missing_msgs[0]
        n_bbox_leaves = len(jax.tree_util.tree_leaves(popped))
        assert unexpected_msgs[0].count("bbox_embed") == n_bbox_leaves
        # the extra head passes through untouched; real keys still merged
        np.testing.assert_array_equal(
            np.asarray(loaded2["extra_head"]["kernel"]), 0.0)
    finally:
        httpd.shutdown()
        httpd.server_close()
