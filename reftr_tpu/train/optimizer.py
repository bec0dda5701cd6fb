"""Optimizer with the reference's 4-way param grouping.

Rebuilds /root/reference/main_vg.py:229-268 with optax.multi_transform:

  group 'base'        : everything else                  @ lr
  group 'backbone'    : trainable ResNet convs           @ lr_backbone
  group 'bert'        : language backbone                @ lr_bert
                        (the reference also uses lr_backbone here)
  group 'mask_branch' : bbox_attention + mask_head       @ lr * lr_mask_branch_proj
  group 'frozen'      : never trained -> set_to_zero

Frozen exactly like the reference:
  * all FrozenBN tensors (torch buffers: backbone.py:43-58),
  * ResNet stem (conv1/bn1) and layer1 always (backbone.py:85-89),
  * layer2-4 when lr_backbone <= 0,
  * the whole language backbone when freeze_bert (main_vg.py:104) — dead
    code in the reference (freeze_lang_backbone is never consumed and
    freeze_bert() references a nonexistent self.textmodel); we implement
    the documented intent, a deliberate fix of a reference bug,
  * everything except the mask branch when freeze_reftr.

AdamW (torch semantics: weight decay on ALL params of a trainable group) or
SGD momentum 0.9; global-norm grad clip at clip_max_norm applied over the
whole tree before the update (engine_vg.py:62-64).
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import optax

from reftr_tpu.core.config import ModelConfig, TrainConfig
from reftr_tpu.train.schedules import Schedule

GROUPS = ("base", "backbone", "bert", "mask_branch", "frozen")

_FROZEN_BN_LEAVES = {"weight", "bias", "running_mean", "running_var"}


def label_fn(model_cfg: ModelConfig, train_cfg: TrainConfig) -> Callable:
    """Returns params -> same-structure tree of group labels."""
    train_backbone = train_cfg.lr_backbone > 0 and not model_cfg.freeze_backbone

    def match(path: str, keywords) -> bool:
        # reference match_name_keywords (main_vg.py:223-229): substring
        return any(k in path for k in keywords)

    def label_one(key_path, _v) -> str:
        parts = []
        for k in key_path:
            parts.append(str(getattr(k, "key", getattr(k, "idx", k))))
        path = "/".join(parts)
        leaf = parts[-1]
        if "img_backbone" in parts:
            # structural freezes, regardless of LR-group targeting:
            # FrozenBN tensors are buffers; stem + layer1 never train.
            # NB: match the STEM's conv1/bn1 only (the module directly under
            # img_backbone) — every Bottleneck also has a conv1/bn1 that must
            # stay trainable (backbone.py:85-89 freezes by 'layer2/3/4 not in
            # name', i.e. stem + layer1 only).
            # backbone_norm='group' has no buffers: GroupNorm scale/bias are
            # ordinary trainable affines (the from-scratch mode's point).
            if (model_cfg.backbone_norm == "frozen"
                    and leaf in _FROZEN_BN_LEAVES):
                return "frozen"
            bb_idx = parts.index("img_backbone")
            child = parts[bb_idx + 1] if bb_idx + 1 < len(parts) else ""
            if not model_cfg.train_stem and (
                    child in ("conv1", "conv1_s2d", "bn1")
                    or child.startswith("layer1_")):
                return "frozen"
        if match(path, train_cfg.lr_backbone_names):
            return "backbone" if train_backbone else "frozen"
        if match(path, train_cfg.lr_bert_names):
            return "frozen" if model_cfg.freeze_bert else "bert"
        if match(path, train_cfg.lr_mask_branch_names):
            return "mask_branch"
        if model_cfg.freeze_reftr:
            # the reference freezes the trunk BEFORE constructing the mask
            # branch AND the CEM block (reftr_segmentation.py:52-63), so
            # cem_block stays trainable at the base LR under freeze_reftr
            return "base" if "cem_block" in parts else "frozen"
        return "base"

    def fn(params):
        return jax.tree_util.tree_map_with_path(label_one, params)

    return fn


def build_optimizer(
    model_cfg: ModelConfig,
    train_cfg: TrainConfig,
    schedule: Schedule,
) -> optax.GradientTransformation:
    def lr_for(group: str) -> Callable:
        base = {
            "base": train_cfg.lr,
            "backbone": train_cfg.lr_backbone,
            "bert": train_cfg.lr_bert,
            "mask_branch": train_cfg.lr * train_cfg.lr_mask_branch_proj,
        }[group]
        return lambda step: base * schedule(step)

    def make(group: str) -> optax.GradientTransformation:
        if group == "frozen":
            return optax.set_to_zero()
        if train_cfg.sgd:
            # torch SGD adds wd*param to the gradient before momentum
            return optax.chain(
                optax.add_decayed_weights(train_cfg.weight_decay),
                optax.sgd(lr_for(group), momentum=train_cfg.momentum),
            )
        return optax.adamw(lr_for(group), b1=0.9, b2=0.999, eps=1e-8,
                           weight_decay=train_cfg.weight_decay)

    transforms: Dict[str, optax.GradientTransformation] = {
        g: make(g) for g in GROUPS
    }
    labels = label_fn(model_cfg, train_cfg)
    tx = optax.multi_transform(transforms, labels)
    if train_cfg.clip_max_norm > 0:
        # torch's clip_grad_norm_ only sees requires_grad params (frozen
        # ones have grad=None); zero frozen grads BEFORE the global norm so
        # they don't dilute the clip scaling. Most are exact zeros already
        # via the model's stop_gradient pruning; this also catches the
        # FrozenBN leaves inside trainable stages.
        def frozen_mask(tree):
            return jax.tree_util.tree_map(
                lambda l: l == "frozen", labels(tree))

        tx = optax.chain(
            optax.masked(optax.set_to_zero(), frozen_mask),
            optax.clip_by_global_norm(train_cfg.clip_max_norm),
            tx,
        )
    return tx
