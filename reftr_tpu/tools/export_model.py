"""AOT serving export: serialize the jitted serving forward to a portable
`jax.export` artifact (StableHLO bytes) that loads and runs WITHOUT the
model code, the config system, or the checkpoint — the TPU-native analogue
of a TorchScript/SavedModel deployment artifact.

The reference has no export/deployment story at all: serving means running
`main_vg.py --eval` with the full training stack and a live checkpoint
(/root/reference/main_vg.py:351-361). This tool closes that production gap
the JAX way: parameters are baked into the program as constants (int8 for
a --quantize_int8 export), the program is lowered AOT for an explicit list
of target platforms (a CPU host can produce a TPU artifact), and the
loader needs only `jax` + the artifact directory.

Artifact layout (``<out>/``):
  ``serving_fn.jaxexp`` — ``jax.export`` serialized bytes
  ``manifest.json``     — input/output specs, target platforms, model
                          flags, parameter count, jax version

CLI (accepts every model flag from ``cli.main`` plus the export knobs)::

    python -m reftr_tpu.tools.export_model --out exported/ \
        --resume <ckpt|.pth|URL> --fold_bn --fold_normalize \
        [--quantize_int8] [--export_batch 64] \
        [--export_platforms tpu,cpu] [--selfcheck]

Loading (deployment side)::

    from reftr_tpu.tools.export_model import load_exported
    call, manifest = load_exported("exported/")
    out = call(batch)          # {"pred_boxes": ...[, "pred_masks": ...]}
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

ARTIFACT_NAME = "serving_fn.jaxexp"
MANIFEST_NAME = "manifest.json"


def serving_batch_spec(cfg, batch_size: int) -> Dict[str, "object"]:
    """ShapeDtypeStructs for the production serving inputs.

    Mirrors the loader's static-canvas collate (data/collate.py): uint8
    NHWC canvases + validity masks, int32 token ids. Multi-phrase inputs
    (cfg.data.multi_phrase) add the phrase tensors the model dispatches on
    (models/reftr.py, `"phrases" in batch`).
    """
    import jax

    d = cfg.data
    b, hw = batch_size, d.max_img_size
    s = d.max_sentence_len if d.multi_phrase else d.max_query_len
    spec = {
        "image": jax.ShapeDtypeStruct((b, hw, hw, 3), np.uint8),
        "image_valid": jax.ShapeDtypeStruct((b, hw, hw), np.bool_),
        "sentence": jax.ShapeDtypeStruct((b, s), np.int32),
        "sentence_valid": jax.ShapeDtypeStruct((b, s), np.int32),
    }
    if d.multi_phrase:
        p, sp = d.max_num_phrases, d.phrase_seq_len
        spec.update({
            "phrases": jax.ShapeDtypeStruct((b, p, sp), np.int32),
            "phrase_valid": jax.ShapeDtypeStruct((b, p, sp), np.int32),
            "phrase_pos_l": jax.ShapeDtypeStruct((b, p), np.int32),
            "phrase_pos_r": jax.ShapeDtypeStruct((b, p), np.int32),
        })
    return spec


def export_serving(model, params, batch_spec: Dict,
                   platforms: Sequence[str] = ("tpu",)):
    """Export ``model.apply`` with ``params`` baked in as constants.

    Returns a ``jax.export.Exported``. Only the serving outputs
    (pred_boxes [+ pred_masks/phrase_mask]) are exported — aux losses and
    intermediate activations are dead code the lowering drops.
    """
    import jax
    from jax import export as jexport

    def fwd(batch):
        out = model.apply({"params": params}, batch)
        kept = {"pred_boxes": out["pred_boxes"]}
        if "pred_masks" in out:
            kept["pred_masks"] = out["pred_masks"]
        if "phrase_mask" in out:
            kept["phrase_mask"] = out["phrase_mask"]
        return kept

    return jexport.export(jax.jit(fwd), platforms=tuple(platforms))(
        batch_spec)


def save_exported(exported, out_dir: str, extra_manifest: Optional[Dict]
                  = None) -> Dict:
    """Write the serialized program + a JSON manifest; returns the manifest."""
    import jax

    os.makedirs(out_dir, exist_ok=True)
    blob = exported.serialize()
    with open(os.path.join(out_dir, ARTIFACT_NAME), "wb") as f:
        f.write(blob)

    def _specs(avals):
        return [{"shape": list(a.shape), "dtype": str(a.dtype)}
                for a in avals]

    manifest = {
        "format": "jax.export.v" + str(exported.calling_convention_version),
        "jax_version": jax.__version__,
        "platforms": list(exported.platforms),
        "artifact_bytes": len(blob),
        "in_tree": str(exported.in_tree),
        "inputs": _specs(exported.in_avals),
        "outputs": _specs(exported.out_avals),
    }
    manifest.update(extra_manifest or {})
    with open(os.path.join(out_dir, MANIFEST_NAME), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return manifest


def load_exported(path: str):
    """Load an exported artifact; returns ``(call, manifest)``.

    ``call`` is the jitted deserialized program: it takes the same batch
    dict the model takes and returns the serving outputs. Needs only jax —
    no reftr_tpu model code, flags, or checkpoint.
    """
    import jax
    from jax import export as jexport

    with open(os.path.join(path, ARTIFACT_NAME), "rb") as f:
        exported = jexport.deserialize(f.read())
    with open(os.path.join(path, MANIFEST_NAME)) as f:
        manifest = json.load(f)
    return jax.jit(exported.call), manifest


def _build_serving_model(cfg, resume: str, calib_batches=None,
                         print_fn=print):
    """Build the model + params exactly as the eval path does: fp load,
    reparameterization folds, then optional int8 PTQ (train/loop.py)."""
    import jax

    from reftr_tpu.models import build_model

    if cfg.model.quantize_int8:
        # PTQ rewrites the fp params post-load (mirrors train/loop.py:164)
        fp_cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, quantize_int8=False))
    else:
        fp_cfg = cfg
    fp_model, _ = build_model(fp_cfg)
    spec = serving_batch_spec(cfg, batch_size=1)
    zero = {k: np.zeros(v.shape, v.dtype) for k, v in spec.items()}
    zero["image_valid"][:] = True
    zero["sentence_valid"][:, :2] = 1  # CLS+1 valid (reftr.py CLS rule)
    if "phrase_valid" in zero:
        zero["phrase_valid"][:, :, :2] = 1
        zero["phrase_pos_r"][:] = 1
    params = jax.jit(fp_model.init)(jax.random.PRNGKey(0), zero)["params"]
    if resume:
        from reftr_tpu.train.loop import _load_pretrained

        params = _load_pretrained(params, resume, fp_cfg)
    else:
        print_fn("WARNING: no --resume checkpoint; exporting random "
                 "weights (smoke/bench export)")
    if cfg.model.quantize_int8:
        from reftr_tpu.nn.quant import calibrate_and_quantize

        if calib_batches is None:
            # no calibration data given: synthesize one representative
            # batch (random pixels bound activation ranges loosely; for a
            # production artifact pass real batches via export_with_config)
            rng = np.random.default_rng(0)
            cb = {k: np.zeros(v.shape, v.dtype) for k, v in spec.items()}
            cb["image"] = rng.integers(
                0, 255, size=spec["image"].shape).astype(np.uint8)
            cb["image_valid"] = np.ones(spec["image_valid"].shape, bool)
            cb["sentence"] = rng.integers(
                1, cfg.model.bert.vocab_size,
                size=spec["sentence"].shape).astype(np.int32)
            cb["sentence_valid"] = np.zeros(
                spec["sentence_valid"].shape, np.int32)
            cb["sentence_valid"][:, :8] = 1
            calib_batches = [(cb, None)]
            print_fn("int8 PTQ: no calibration batches supplied; "
                     "calibrating on one synthetic batch")
        params = calibrate_and_quantize(fp_cfg, params, iter(calib_batches),
                                        n_batches=len(calib_batches),
                                        print_fn=print_fn)
    model, _ = build_model(cfg)
    return model, params


def export_with_config(cfg, resume: str, out_dir: str, batch_size: int,
                       platforms: Sequence[str] = ("tpu",),
                       calib_batches=None, print_fn=print
                       ) -> Tuple[object, object, object, Dict]:
    """End-to-end: build serving model per cfg, export, save. Returns
    (model, params, Exported, manifest) — model/params so callers can
    cross-check the artifact against the live model."""
    import jax

    model, params = _build_serving_model(cfg, resume, calib_batches,
                                         print_fn=print_fn)
    spec = serving_batch_spec(cfg, batch_size)
    exported = export_serving(model, params, spec, platforms)
    n_params = sum(int(np.prod(x.shape))
                   for x in jax.tree_util.tree_leaves(params))
    mc = cfg.model
    manifest = save_exported(exported, out_dir, {
        "model": {
            "backbone": mc.backbone, "hidden_dim": mc.hidden_dim,
            "enc_layers": mc.enc_layers, "dec_layers": mc.dec_layers,
            "masks": mc.masks, "dtype": mc.dtype,
            "fold_bn": mc.fold_bn, "fold_normalize": mc.fold_normalize,
            "quantize_int8": mc.quantize_int8,
        },
        "batch_size": batch_size,
        "n_parameters": n_params,
        "resume": resume or "",
    })
    return model, params, exported, manifest


def get_args_parser():
    from reftr_tpu.cli.main import get_args_parser as base_parser

    p = base_parser()
    p.add_argument("--out", required=True,
                   help="output artifact directory")
    p.add_argument("--export_batch", type=int, default=64,
                   help="static batch size baked into the artifact")
    p.add_argument("--export_platforms", default="tpu",
                   help="comma-separated lowering targets (tpu,cpu,cuda)")
    p.add_argument("--selfcheck", action="store_true",
                   help="after export, deserialize and compare against the "
                        "live model on one random batch (current backend "
                        "must be in --export_platforms)")
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
    platforms = tuple(s.strip() for s in args.export_platforms.split(",")
                      if s.strip())
    model, params, exported, manifest = export_with_config(
        cfg, cfg.train.resume, args.out, args.export_batch, platforms)
    print(json.dumps({k: manifest[k] for k in
                      ("platforms", "artifact_bytes", "batch_size",
                       "n_parameters")}))
    if args.selfcheck:
        spec = serving_batch_spec(cfg, args.export_batch)
        call, _ = load_exported(args.out)
        rng = np.random.default_rng(0)
        batch = {k: (rng.integers(0, 255, size=v.shape).astype(np.uint8)
                     if v.dtype == np.uint8 else
                     np.ones(v.shape, v.dtype) if v.dtype == np.bool_ else
                     rng.integers(1, 100, size=v.shape).astype(v.dtype))
                 for k, v in spec.items()}
        got = jax.device_get(call(batch))
        want = jax.device_get(jax.jit(
            lambda b: model.apply({"params": params}, b)["pred_boxes"])(
                batch))
        err = float(np.abs(np.asarray(got["pred_boxes"], np.float32)
                           - np.asarray(want, np.float32)).max())
        print(f"selfcheck: max |exported - live| = {err:.3e}")
        if not np.isfinite(err) or err > 1e-5:
            return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
