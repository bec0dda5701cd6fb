"""Named presets mirroring the reference's shell configs (configs/**/*.sh).

Each preset is a dict of argparse overrides applied before config assembly,
reproducing the flag combinations the reference bakes into shell scripts
(e.g. configs/refcoco/RefTR_refcoco.sh stage 1 == 'refcoco_det').
"""

from __future__ import annotations

from typing import Dict

PRESETS: Dict[str, Dict] = {
    # configs/refcoco/RefTR_refcoco.sh stage 1 (REC detection)
    "refcoco_det": dict(
        num_feature_levels=1, dataset="refcoco_unc", train_split="train",
        test_split=["val", "testA", "testB"], dec_layers=6, aux_loss=True,
        img_size=640, max_img_size=640, epochs=90, lr_drop=60,
    ),
    # configs/refcoco/RefTR_refcoco.sh stage 2 (REC+RES fine-tune)
    "refcoco_seg": dict(
        num_feature_levels=1, masks=True, lr=1e-5, lr_mask_branch_proj=10.0,
        dataset="refcoco_unc", train_split="train",
        test_split=["val", "testA", "testB"], dec_layers=6, aux_loss=True,
        img_size=640, max_img_size=640, epochs=40, lr_drop=30,
    ),
    # configs/refcoco+/RefTR_SEG_refcoco+.sh
    "refcoco_plus_seg": dict(
        num_feature_levels=1, num_queries_per_phrase=1, masks=True, lr=1e-5,
        lr_mask_branch_proj=10.0, dataset="refcoco+_unc", train_split="train",
        test_split=["testA", "testB"], dec_layers=6, aux_loss=True,
        img_size=640, max_img_size=640, epochs=40, lr_drop=30,
    ),
    # configs/refcocog/RefTR_refcocog.sh (umd split)
    "refcocog_det": dict(
        num_feature_levels=1, dataset="refcocog_umd", train_split="train",
        test_split=["val"], dec_layers=6, aux_loss=True, img_size=640,
        max_img_size=640, epochs=90, lr_drop=60,
    ),
    "refcocog_seg": dict(
        num_feature_levels=1, masks=True, lr=1e-5, lr_mask_branch_proj=10.0,
        dataset="refcocog_umd", train_split="train", test_split=["val"],
        dec_layers=6, aux_loss=True, img_size=640, max_img_size=640,
        epochs=40, lr_drop=30,
    ),
    # configs/flickr30k/RefTR_flickr.sh (multi-phrase)
    "flickr": dict(
        num_feature_levels=1, dataset="flickr30k", dec_layers=6,
        img_size=640, max_img_size=640, batch_size=16, epochs=60,
        warm_up_epoch=5, lr_schedule="CosineWarmupLR", aux_loss=True,
    ),
    # configs/flickr30k/RefTR_flickr_roberta.sh
    "flickr_roberta": dict(
        num_feature_levels=1, dataset="flickr30k", dec_layers=6,
        img_size=640, max_img_size=640, batch_size=16, epochs=60,
        warm_up_epoch=5, lr_schedule="CosineWarmupLR", aux_loss=True,
        bert_model="roberta-base",
    ),
    # configs/referit/RefTR_referit.sh
    "referit": dict(
        num_feature_levels=1, dataset="referit", train_split="trainval",
        test_split=["test"], dec_layers=6, aux_loss=True, img_size=640,
        max_img_size=640, epochs=90, lr_drop=60,
    ),
    # configs/flickr30k/Ref_flickr_pt.sh (VG pretraining)
    "vg_pretrain": dict(
        num_feature_levels=1, dataset="vg", train_split="all",
        test_split=["val"], dec_layers=6, aux_loss=True, img_size=640,
        max_img_size=640, epochs=6, lr_drop=4,
    ),
    # configs/refcoco+/RefTR_refcoco+.sh (REC detection)
    "refcoco_plus_det": dict(
        num_feature_levels=1, num_queries_per_phrase=1,
        dataset="refcoco+_unc", train_split="train",
        test_split=["val", "testA", "testB"], dec_layers=6, aux_loss=True,
        img_size=640, max_img_size=640, epochs=90, lr_drop=60,
    ),
    # configs/referit/RefTR_referit_PT.sh — fine-tune from a VG-pretrained
    # checkpoint; pass --resume <RefTR_VG_PT ckpt> (path is site-specific)
    "referit_pt": dict(
        num_feature_levels=1, num_queries_per_phrase=1, dataset="referit",
        train_split="trainval", test_split=["test"], dec_layers=6,
        aux_loss=True, img_size=640, max_img_size=640, epochs=90,
        lr_drop=60, ckpt_cycle=90, resume_model_only=True,
    ),
    # configs/flickr30k/Ref_flickr_pt.sh — flickr fine-tune from VG
    # pretraining; pass --resume <RefTR_VG_PT ckpt>
    "flickr_pt": dict(
        num_feature_levels=1, num_queries_per_phrase=1, dataset="flickr30k",
        dec_layers=6, aux_loss=True, img_size=640, max_img_size=640,
        epochs=40, lr_drop=30, resume_model_only=True,
    ),
}

# ResNet-101 variants (configs/**/*_101.sh differ only in --backbone)
for _name in ("refcoco_det", "refcoco_seg", "refcoco_plus_det",
              "refcoco_plus_seg", "refcocog_det", "refcocog_seg",
              "referit", "referit_pt", "flickr_pt"):
    PRESETS[f"{_name}_101"] = dict(PRESETS[_name], backbone="resnet101")

PRESETS.update({
    # smoke preset on the synthetic fixture (no data needed)
    "synthetic_smoke": dict(
        dataset="synthetic", train_split="train", test_split=["val"],
        img_size=64, max_img_size=64, batch_size=16, epochs=2,
        enc_layers=2, dec_layers=2, dim_feedforward=128, hidden_dim=64,
        nheads=4, lr=3e-4, lr_backbone=3e-4, lr_schedule="CosineWarmupLR",
        warm_up_epoch=1, aux_loss=True, dtype="float32", num_workers=4,
        bert_size="tiny", num_feature_levels=1,
    ),
})


def apply_preset(args, name: str, argv=None) -> None:
    """Apply preset values, but explicitly-passed CLI flags win (matching
    the reference's `config.sh ${PY_ARGS}` override order)."""
    import sys

    argv = argv if argv is not None else sys.argv[1:]
    explicit = {a.split("=")[0].lstrip("-") for a in argv
                if a.startswith("--")}
    for k, v in PRESETS[name].items():
        if k not in explicit:
            setattr(args, k, v)
