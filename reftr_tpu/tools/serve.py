"""Micro-batching HTTP serving runtime (stdlib-only, no pip deps).

The reference has no serving story at all — deployment means running the
full training stack with `--eval` (/root/reference/main_vg.py:351-361).
This is the production complement for online traffic, built TPU-first:

- ONE compiled program at a static batch size: requests are micro-batched
  (up to ``--serve_batch`` rows, flushing ``--batch_timeout_ms`` after the
  first row arrives) and padded to the static shape, so XLA compiles once
  and every dispatch hits the cache. Dynamic batching with dynamic shapes
  would recompile per fill level — the classic TPU serving mistake.
- Two model backends: a live checkpoint (same loaders as training:
  Orbax dir, reference ``.pth``, or URL) or an AOT ``jax.export`` artifact
  produced by ``tools/export_model.py`` (weights baked in, int8-capable).
- Preprocessing parity with evaluation: the exact transform pipeline
  (aspect-preserving resize -> canvas pack -> validity mask; C++ ops) and
  tokenizer the eval path uses, so served boxes match ``--eval`` outputs.

API (JSON over HTTP):
  POST /predict   {"image_b64": <base64 JPEG/PNG>, "phrases": ["...", ...]}
               -> {"results": [{"phrase","box_xyxy"[,"mask_area_px"]}...]}
  GET  /healthz -> {"ok": true, ...}
  GET  /stats   -> {"requests","rows","batches","mean_batch_fill"}

Usage::

    python -m reftr_tpu.tools.serve --preset refcoco_det \
        --resume exps/refcoco/checkpoint --fold_bn --fold_normalize \
        --port 8080 --serve_batch 64 --batch_timeout_ms 5
    # or from an exported artifact:
    python -m reftr_tpu.tools.serve --exported exported/ --port 8080
"""

from __future__ import annotations

import base64
import io
import json
import os
import queue
import threading
import time
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, List, Optional

import numpy as np


@dataclass
class _Request:
    """One client request = `k` model rows (one per phrase), atomic in a
    batch so a response never spans two dispatches."""

    rows: Dict[str, np.ndarray]  # each leaf [k, ...]
    k: int
    orig_hw: tuple
    valid_hw: tuple
    phrases: List[str]
    done: threading.Event = field(default_factory=threading.Event)
    result: Optional[List[dict]] = None
    error: Optional[str] = None


class ServingModel:
    """The compiled forward: live checkpoint or exported artifact."""

    def __init__(self, cfg, batch_size: int, exported_dir: str = ""):
        import jax

        self.cfg = cfg
        self.batch_size = batch_size
        self.masks = bool(cfg.model.masks)
        if exported_dir:
            from reftr_tpu.tools.export_model import load_exported

            self._call, manifest = load_exported(exported_dir)
            self.batch_size = int(manifest["batch_size"])
            self.masks = bool(manifest.get("model", {}).get("masks", False))
        else:
            from reftr_tpu.tools.export_model import _build_serving_model

            model, params = _build_serving_model(cfg, cfg.train.resume)
            params = jax.device_put(params)

            @jax.jit
            def fwd(batch):
                out = model.apply({"params": params}, batch)
                kept = {"pred_boxes": out["pred_boxes"]}
                if "pred_masks" in out:
                    kept["pred_masks"] = out["pred_masks"]
                return kept

            self._call = fwd

    def dispatch(self, batch: Dict[str, np.ndarray]):
        """Submit a batch to the device WITHOUT fetching the result — jax
        dispatch is async, so the host returns while the chip computes."""
        return self._call(batch)

    @staticmethod
    def fetch(out) -> Dict[str, np.ndarray]:
        import jax

        return jax.device_get(out)

    def __call__(self, batch: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        return self.fetch(self.dispatch(batch))


class MicroBatcher:
    """Collects request rows into static-shape batches and runs the model.

    Flush policy: the batch runs when it is full OR ``timeout_ms`` after
    its FIRST row arrived — bounded tail latency under light load, full
    MXU batches under heavy load."""

    def __init__(self, model: ServingModel, cfg, timeout_ms: float = 5.0,
                 pipeline: bool = True):
        self.model = model
        self.cfg = cfg
        self.timeout_s = timeout_ms / 1e3
        self.pipeline = pipeline  # False: fetch each batch before the next
        #                           dispatch (the pre-overlap behavior)
        self.q: "queue.Queue[_Request]" = queue.Queue()
        self.stats = {"requests": 0, "rows": 0, "batches": 0,
                      "rows_in_batches": 0, "dispatch_overlaps": 0}
        self._stop = threading.Event()
        self.thread = threading.Thread(target=self._run, daemon=True,
                                       name="reftr-microbatcher")
        self.thread.start()

    def submit(self, req: _Request) -> None:
        if req.k > self.model.batch_size:
            req.error = (f"request has {req.k} phrases > serve batch "
                         f"{self.model.batch_size}")
            req.done.set()
            return
        self.q.put(req)

    def stop(self) -> None:
        self._stop.set()
        self.thread.join(timeout=5)

    # ------------------------------------------------------------------
    def _run(self) -> None:
        # Double-buffered dispatch: while batch N computes on the device,
        # the host collects batch N+1, dispatches it, and only THEN fetches
        # N's results — the device never idles between batches, and N's
        # device->host fetch (tunnel RTT) overlaps N+1's compute. Under
        # light load (queue empty while one batch is in flight) the fetch
        # happens immediately, so single-request latency is unchanged.
        inflight = None  # (group, device_out)
        while not self._stop.is_set():
            if inflight is not None:
                try:
                    first = self.q.get_nowait()
                except queue.Empty:
                    self._finish(*inflight)
                    inflight = None
                    continue
            else:
                try:
                    first = self.q.get(timeout=0.05)
                except queue.Empty:
                    continue
            group = [first]
            used = first.k
            deadline = time.perf_counter() + self.timeout_s
            while used < self.model.batch_size:
                left = deadline - time.perf_counter()
                if left <= 0:
                    break
                try:
                    nxt = self.q.get(timeout=left)
                except queue.Empty:
                    break
                if used + nxt.k > self.model.batch_size:
                    # atomic requests: put it back for the next batch
                    self.q.put(nxt)
                    break
                group.append(nxt)
                used += nxt.k
            try:
                out = self.model.dispatch(self._pad_batch(group))
            except Exception as e:  # noqa: BLE001 — report to the client
                for r in group:
                    r.error = f"{type(e).__name__}: {e}"
                    r.done.set()
                continue
            if inflight is not None:
                self.stats["dispatch_overlaps"] += 1
                self._finish(*inflight)  # overlaps `group` on the device
            if self.pipeline:
                inflight = (group, out)
            else:
                self._finish(group, out)
        if inflight is not None:
            self._finish(*inflight)

    def _pad_batch(self, group: List[_Request]) -> Dict[str, np.ndarray]:
        b = self.model.batch_size
        keys = group[0].rows.keys()
        batch = {}
        for k in keys:
            rows = np.concatenate([g.rows[k] for g in group], axis=0)
            pad = np.zeros((b - rows.shape[0],) + rows.shape[1:],
                           rows.dtype)
            batch[k] = np.concatenate([rows, pad], axis=0)
        # padding rows must stay well-formed: CLS+1 valid (models/reftr.py
        # CLS rule), full image validity — their outputs are discarded
        if len(group) and batch["sentence_valid"].shape[0] > 0:
            n = sum(g.k for g in group)
            batch["sentence_valid"][n:, :2] = 1
            batch["image_valid"][n:] = True
        return batch

    def _finish(self, group: List[_Request], device_out) -> None:
        """Fetch a dispatched batch's results and complete its requests."""
        try:
            self._postprocess(group, self.model.fetch(device_out))
        except Exception as e:  # noqa: BLE001 — report to the client
            for r in group:
                r.error = f"{type(e).__name__}: {e}"
                r.done.set()

    def _postprocess(self, group: List[_Request], out) -> None:
        import jax.numpy as jnp

        from reftr_tpu.models.postprocess import decode_boxes, segm_masks

        self.stats["batches"] += 1
        self.stats["rows_in_batches"] += self.model.batch_size
        boxes = np.asarray(decode_boxes(jnp.asarray(
            out["pred_boxes"], jnp.float32)))[:, 0]  # [B, 4] xyxy, row 0
        row = 0
        for g in group:
            h0, w0 = g.orig_hw
            oh, ow = g.valid_hw
            scale = np.array([w0, h0, w0, h0], np.float32)
            results = []
            for i, ph in enumerate(g.phrases):
                r = {"phrase": ph,
                     "box_xyxy": [round(float(v), 2)
                                  for v in boxes[row + i] * scale]}
                if self.model.masks and "pred_masks" in out:
                    S = self.cfg.data.max_img_size
                    m = np.asarray(segm_masks(
                        jnp.asarray(out["pred_masks"][row + i:row + i + 1]),
                        (S, S)))[0, 0][:oh, :ow]
                    ys = np.floor(np.arange(h0) * (oh / h0)).astype(np.int64)
                    xs = np.floor(np.arange(w0) * (ow / w0)).astype(np.int64)
                    m = m[ys][:, xs]
                    r["mask_area_px"] = int(m.sum())
                    r["mask_shape"] = list(m.shape)
                results.append(r)
            g.result = results
            self.stats["requests"] += 1
            self.stats["rows"] += g.k
            row += g.k
            g.done.set()


class Frontend:
    """Request parsing + preprocessing (the eval transform pipeline)."""

    def __init__(self, cfg, tokenizer):
        self.cfg = cfg
        self.tokenizer = tokenizer

    def preprocess(self, payload: dict) -> _Request:
        from reftr_tpu.data.transforms import transform_sample

        phrases = payload.get("phrases") or []
        if not phrases or not isinstance(phrases, list):
            raise ValueError("payload needs a non-empty 'phrases' list")
        if "image_b64" not in payload:
            raise ValueError("payload needs 'image_b64'")
        from PIL import Image

        img = np.asarray(Image.open(io.BytesIO(
            base64.b64decode(payload["image_b64"]))).convert("RGB"))
        d = self.cfg.data
        ts = transform_sample(img, np.zeros((0, 4), np.float32),
                              d.img_size, d.max_img_size, train=False)
        oh, ow = ts.valid_hw
        valid = np.zeros((d.max_img_size, d.max_img_size), bool)
        valid[:oh, :ow] = True
        k = len(phrases)
        ids = np.zeros((k, d.max_query_len), np.int32)
        svalid = np.zeros((k, d.max_query_len), np.int32)
        for i, ph in enumerate(phrases):
            ii, mm, _ = self.tokenizer.encode(str(ph).lower(),
                                              d.max_query_len)
            ids[i], svalid[i] = ii, mm
        rows = {
            "image": np.broadcast_to(ts.canvas, (k,) + ts.canvas.shape
                                     ).copy(),
            "image_valid": np.broadcast_to(valid, (k,) + valid.shape).copy(),
            "sentence": ids,
            "sentence_valid": svalid,
        }
        return _Request(rows=rows, k=k, orig_hw=ts.orig_hw,
                        valid_hw=ts.valid_hw, phrases=[str(p) for p in
                                                       phrases])


def make_handler(frontend: Frontend, batcher: MicroBatcher,
                 request_timeout_s: float = 60.0):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):  # quiet by default
            pass

        def _send(self, code: int, obj: dict) -> None:
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._send(200, {
                    "ok": True,
                    "batch_size": batcher.model.batch_size,
                    "masks": batcher.model.masks,
                })
            elif self.path == "/stats":
                s = dict(batcher.stats)
                s["mean_batch_fill"] = round(
                    s["rows"] / max(1, s["rows_in_batches"]), 4)
                self._send(200, s)
            else:
                self._send(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/predict":
                self._send(404, {"error": "unknown path"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                payload = json.loads(self.rfile.read(n))
                req = frontend.preprocess(payload)
            except Exception as e:  # noqa: BLE001 — client error
                self._send(400, {"error": f"{type(e).__name__}: {e}"})
                return
            batcher.submit(req)
            if not req.done.wait(request_timeout_s):
                self._send(503, {"error": "timed out waiting for batch"})
                return
            if req.error:
                self._send(500, {"error": req.error})
                return
            self._send(200, {"results": req.result})

    return Handler


def build_server(cfg, host: str = "127.0.0.1", port: int = 8080,
                 serve_batch: int = 16, batch_timeout_ms: float = 5.0,
                 exported_dir: str = ""):
    """Assemble (server, batcher); caller runs server.serve_forever()."""
    from reftr_tpu.train.loop import build_tokenizer

    model = ServingModel(cfg, serve_batch, exported_dir)
    batcher = MicroBatcher(model, cfg, batch_timeout_ms)
    frontend = Frontend(cfg, build_tokenizer(cfg))
    handler = make_handler(frontend, batcher)
    server = ThreadingHTTPServer((host, port), handler)
    return server, batcher


def get_args_parser():
    from reftr_tpu.cli.main import get_args_parser as base_parser

    p = base_parser()
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--serve_batch", type=int, default=16,
                   help="static micro-batch size (one compiled program)")
    p.add_argument("--batch_timeout_ms", type=float, default=5.0,
                   help="flush a partial batch this long after its first "
                        "row arrives")
    p.add_argument("--exported", default="",
                   help="serve an AOT artifact dir (tools/export_model.py) "
                        "instead of a live checkpoint")
    return p


def main(argv=None) -> int:
    import jax

    from reftr_tpu.cli.main import args_to_config

    args = get_args_parser().parse_args(argv)
    if getattr(args, "preset", None):
        from reftr_tpu.cli.presets import apply_preset

        apply_preset(args, args.preset, argv)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.dirname(__file__))), ".jax_cache"))
    cfg = args_to_config(args)
    server, batcher = build_server(
        cfg, args.host, args.port, args.serve_batch, args.batch_timeout_ms,
        exported_dir=args.exported)
    print(json.dumps({"serving": f"http://{args.host}:{args.port}",
                      "batch_size": batcher.model.batch_size,
                      "backend": "exported" if args.exported else "live"}))
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        batcher.stop()
        server.server_close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
