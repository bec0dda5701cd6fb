"""Model factory (rebuilds /root/reference/models/__init__.py:4-11).

Dispatch: reftr_type prefix 'transformer' + masks -> RefTRSeg else RefTR;
anything else raises NotImplementedError like the reference.
"""

from __future__ import annotations

from typing import Dict, Tuple

from flax import linen as nn

from reftr_tpu.core.config import RefTRConfig
from reftr_tpu.models.criterion import weight_dict as build_weight_dict
from reftr_tpu.models.reftr import RefTR


def build_model(cfg: RefTRConfig) -> Tuple[nn.Module, Dict[str, float]]:
    mc = cfg.model
    if not mc.reftr_type.startswith("transformer"):
        raise NotImplementedError(
            f"reftr_type {mc.reftr_type!r} is not implemented")
    if mc.backbone_norm not in ("frozen", "group"):
        raise ValueError(f"backbone_norm {mc.backbone_norm!r}")
    if mc.backbone_norm != "frozen" and (
            mc.fold_bn or mc.fold_normalize or mc.quantize_int8
            or mc.quantize_train_prefix):
        raise ValueError(
            "backbone_norm='group' has no frozen statistics to fold or "
            "quantize: drop fold_bn/fold_normalize/quantize_int8/"
            "quantize_train_prefix")
    if mc.quantize_train_prefix:
        if not mc.fold_bn:
            raise ValueError("quantize_train_prefix requires fold_bn (the "
                             "BN scale must fold into the conv kernel)")
        if mc.train_stem:
            raise ValueError("quantize_train_prefix quantizes the FROZEN "
                             "stem+layer1; it cannot combine with "
                             "train_stem")
        if mc.quantize_int8:
            raise ValueError("quantize_train_prefix and quantize_int8 are "
                             "mutually exclusive (serving PTQ expects an "
                             "fp layer1; serve prefix-trained checkpoints "
                             "with quantize_train_prefix instead)")
    if mc.heatmap_box:
        if not mc.vision_aux:
            raise ValueError("heatmap_box decodes the vision_aux heatmap; "
                             "enable --vision_aux_loss")
        if mc.masks:
            raise ValueError("heatmap_box is a REC head; the RES path "
                             "decodes masks instead")
        if mc.num_queries_per_phrase != 1 or "multi" in mc.reftr_type:
            raise ValueError("heatmap_box supports single-phrase REC with "
                             "one query per phrase only")
    if mc.masks:
        from reftr_tpu.models.reftr_seg import RefTRSeg

        model: nn.Module = RefTRSeg(mc)
    else:
        model = RefTR(mc)
    wd = build_weight_dict(cfg.loss, mc.dec_layers, mc.aux_loss,
                           with_masks=mc.masks,
                           vision_aux=mc.vision_aux and not mc.masks,
                           heatmap_box=mc.heatmap_box)
    return model, wd
