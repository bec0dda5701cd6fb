"""Single-image inference CLI: image + phrase(s) -> boxes (and masks).

The reference offers only dataset-level evaluation (`--eval`,
/root/reference/main_vg.py:351-361) and its in-module visualization smoke
tests; this is the serving-oriented complement for a single request:

    python -m reftr_tpu.cli.predict \
        --image photo.jpg --phrase "the red car" --phrase "a person" \
        --resume exps/run/checkpoint --output out.jpg [model flags]

Accepts any model flags from cli.main (backbone, bert_model, masks, ...)
plus a checkpoint via --resume (Orbax dir, converted-on-the-fly reference
.pth, or URL — the same loaders as training, train/loop.py). Each phrase
runs as one batch row against the same image. Prints one JSON line per
phrase with the box in original-image pixels (and mask polygon stats with
--masks); --output draws the boxes onto the image.
"""

from __future__ import annotations

import json
import os
import sys
from typing import List

import numpy as np


def get_args_parser():
    from reftr_tpu.cli.main import get_args_parser as base_parser

    p = base_parser()
    p.add_argument("--image", required=True, help="input image (JPEG/PNG)")
    p.add_argument("--phrase", action="append", required=True,
                   help="referring expression (repeatable)")
    p.add_argument("--output", default="",
                   help="write the image with predicted boxes drawn here")
    return p


def predict(args) -> List[dict]:
    import jax
    import jax.numpy as jnp

    from reftr_tpu.cli.main import args_to_config
    from reftr_tpu.data.datasets import _load_image
    from reftr_tpu.data.transforms import transform_sample
    from reftr_tpu.models import build_model
    from reftr_tpu.models.postprocess import decode_boxes, segm_masks
    from reftr_tpu.train.loop import _load_pretrained, build_tokenizer

    cfg = args_to_config(args)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.dirname(__file__))), ".jax_cache"))

    tokenizer = build_tokenizer(cfg)
    img = _load_image(args.image)
    ts = transform_sample(img, np.zeros((0, 4), np.float32),
                          cfg.data.img_size, cfg.data.max_img_size,
                          train=False)
    oh, ow = ts.valid_hw
    valid = np.zeros((cfg.data.max_img_size, cfg.data.max_img_size), bool)
    valid[:oh, :ow] = True

    phrases = list(args.phrase)
    b = len(phrases)
    ids = np.zeros((b, cfg.data.max_query_len), np.int32)
    svalid = np.zeros((b, cfg.data.max_query_len), bool)
    for i, ph in enumerate(phrases):
        ii, mm, _ = tokenizer.encode(ph.lower(), cfg.data.max_query_len)
        ids[i], svalid[i] = ii, mm
    batch = {
        "image": np.broadcast_to(ts.canvas, (b,) + ts.canvas.shape).copy(),
        "image_valid": np.broadcast_to(valid, (b,) + valid.shape).copy(),
        "sentence": ids,
        "sentence_valid": svalid,
    }

    model, _ = build_model(cfg)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), batch)["params"]
    resume = cfg.train.resume
    if resume:
        params = _load_pretrained(params, resume, cfg)
    else:
        print("WARNING: no --resume checkpoint; predicting with random "
              "weights", file=sys.stderr)
    params = jax.device_put(params)

    @jax.jit
    def fwd(params, batch):
        return model.apply({"params": params}, batch)

    out = jax.device_get(fwd(params, batch))
    # normalized cxcywh on the valid extent -> original-image pixels: the
    # extent maps 1:1 onto the original via the resize scale (transforms)
    boxes = decode_boxes(jnp.asarray(out["pred_boxes"]))  # [b, P, 4] xyxy
    boxes = np.asarray(boxes)[:, 0]  # single phrase per row
    h0, w0 = ts.orig_hw
    scale = np.array([w0, h0, w0, h0], np.float32)
    boxes_px = boxes * scale

    results = []
    for i, ph in enumerate(phrases):
        r = {"phrase": ph,
             "box_xyxy": [round(float(v), 2) for v in boxes_px[i]]}
        if cfg.model.masks and "pred_masks" in out:
            # upsample logits to the canvas, crop the valid extent, nearest
            # resize to the original shape (the eval-path order,
            # models/postprocess.py + reftr_segmentation.py:282-302)
            S = cfg.data.max_img_size
            m = np.asarray(segm_masks(jnp.asarray(out["pred_masks"]),
                                      (S, S)))[i, 0][:oh, :ow]
            ys = np.floor(np.arange(h0) * (oh / h0)).astype(np.int64)
            xs = np.floor(np.arange(w0) * (ow / w0)).astype(np.int64)
            m = m[ys][:, xs]
            r["mask_area_px"] = int(m.sum())
            r["mask_shape"] = list(m.shape)
        results.append(r)

    if args.output:
        from reftr_tpu.tools.visualize import draw_boxes

        im = draw_boxes(img, boxes_px)
        im.save(args.output, quality=92)
    return results


def main(argv=None) -> int:
    args = get_args_parser().parse_args(argv)
    if getattr(args, "preset", None):
        from reftr_tpu.cli.presets import apply_preset

        apply_preset(args, args.preset, argv)
    for r in predict(args):
        print(json.dumps(r))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
