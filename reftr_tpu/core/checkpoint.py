"""Checkpoint / resume via Orbax.

Rebuilds the reference's checkpoint protocol (/root/reference/main_vg.py:
298-349, 372-412) on Orbax/TensorStore:

  * every epoch -> 'checkpoint' (atomic), periodic 'checkpoint{epoch:04d}'
    on lr_drop / ckpt_cycle boundaries,
  * best-on-val -> 'checkpoint_best' tracked on accuracy_iou0.5 of the
    first val split,
  * saved payload: params, opt_state, step, epoch, best_val_acc, config
    (the reference pickles args into the checkpoint; we embed the config
    dict),
  * --auto_resume: pick up <output_dir>/checkpoint if present,
  * resume_model_only: restore params only (fine-tuning),
  * non-strict pretrained init with missing/unexpected key report
    (main_vg.py:312-318).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from reftr_tpu.core.config import RefTRConfig


def _ckpt_dir(output_dir: str, name: str) -> str:
    return os.path.join(os.path.abspath(output_dir), name)


def save_checkpoint(
    output_dir: str,
    name: str,
    params: Any,
    opt_state: Any = None,
    step: int = 0,
    epoch: int = 0,
    best_val_acc: float = 0.0,
    config: Optional[RefTRConfig] = None,
) -> None:
    path = _ckpt_dir(output_dir, name)
    ckptr = ocp.StandardCheckpointer()
    payload = {"params": params}
    if opt_state is not None:
        payload["opt_state"] = opt_state
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    meta = {
        "step": int(step),
        "epoch": int(epoch),
        "best_val_acc": float(best_val_acc),
    }
    if config is not None:
        meta["config"] = config.to_json()
    import json

    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f)


def restore_checkpoint(
    output_dir: str,
    name: str,
    template: Dict[str, Any],
    partial: bool = False,
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Restore payload matching `template` structure; returns (payload, meta).

    partial=True restores only the subtree present in `template` (the
    --resume_model_only path: params without optimizer state)."""
    import json

    path = _ckpt_dir(output_dir, name)
    if partial:
        with ocp.PyTreeCheckpointer() as ckptr:
            payload = ckptr.restore(
                path, args=ocp.args.PyTreeRestore(item=template,
                                                  partial_restore=True))
    else:
        ckptr = ocp.StandardCheckpointer()
        payload = ckptr.restore(path, template)
    meta_path = os.path.join(path, "meta.json")
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return payload, meta


def checkpoint_exists(output_dir: str, name: str = "checkpoint") -> bool:
    return os.path.isdir(_ckpt_dir(output_dir, name))


def load_pretrained_nonstrict(params: Any, pretrained: Any,
                              log=print) -> Any:
    """Merge a (possibly partial) pretrained param tree into `params`,
    reporting missing/unexpected keys like main_vg.py:312-318."""
    flat_cur = dict(jax.tree_util.tree_flatten_with_path(params)[0])
    flat_new = dict(jax.tree_util.tree_flatten_with_path(pretrained)[0])
    missing = [jax.tree_util.keystr(k) for k in flat_cur if k not in flat_new]
    unexpected = [jax.tree_util.keystr(k) for k in flat_new
                  if k not in flat_cur]
    shape_skipped = []
    merged = dict(flat_cur)
    for k, v in flat_new.items():
        if k in flat_cur:
            if np.shape(flat_cur[k]) == np.shape(v):
                merged[k] = v
            else:
                shape_skipped.append(jax.tree_util.keystr(k))
    if missing:
        log(f"Missing keys: {missing}")
    if unexpected:
        log(f"Unexpected keys: {unexpected}")
    if shape_skipped:
        log(f"Shape-mismatched keys skipped: {shape_skipped}")
    treedef = jax.tree_util.tree_structure(params)
    keys = [k for k, _ in jax.tree_util.tree_flatten_with_path(params)[0]]
    return jax.tree_util.tree_unflatten(treedef, [merged[k] for k in keys])
