"""CLI surface: preset application/precedence and config assembly."""

import pytest

from reftr_tpu.cli.main import args_to_config, get_args_parser
from reftr_tpu.cli.presets import PRESETS, apply_preset


def parse(argv):
    args = get_args_parser().parse_args(argv)
    if args.preset:
        apply_preset(args, args.preset, argv)
    return args


def test_every_preset_key_is_an_argparse_dest():
    dests = {a.dest for a in get_args_parser()._actions}
    for name, p in PRESETS.items():
        assert set(p) <= dests, (name, set(p) - dests)


def test_all_reference_configs_have_presets():
    """One preset per reference configs/**/*.sh (18 of them) + smoke."""
    expected = {
        # configs/refcoco
        "refcoco_det", "refcoco_det_101",
        # configs/refcoco+
        "refcoco_plus_det", "refcoco_plus_det_101",
        "refcoco_plus_seg", "refcoco_plus_seg_101",
        # configs/refcocog
        "refcocog_det", "refcocog_det_101",
        "refcocog_seg", "refcocog_seg_101",
        # configs/referit
        "referit", "referit_101", "referit_pt", "referit_pt_101",
        # configs/flickr30k
        "flickr", "flickr_roberta", "flickr_pt", "flickr_pt_101",
    }
    assert expected <= set(PRESETS)


def test_preset_values_applied_and_explicit_flags_win():
    # preset value applied
    args = parse(["--preset", "refcoco_det"])
    assert args.dataset == "refcoco_unc"
    assert args.epochs == 90 and args.lr_drop == 60
    assert args.num_feature_levels == 1  # preset overrides the 4 default
    # explicit flag beats the preset (reference: config.sh ${PY_ARGS})
    args = parse(["--preset", "refcoco_det", "--epochs", "5"])
    assert args.epochs == 5
    assert args.lr_drop == 60


def test_r101_variants_differ_only_in_backbone():
    for name in PRESETS:
        if name.endswith("_101"):
            base = PRESETS[name[:-4]]
            assert PRESETS[name] == dict(base, backbone="resnet101"), name


def test_args_to_config_mapping():
    args = parse(["--preset", "refcoco_seg", "--dtype", "bfloat16",
                  "--space_to_depth_stem", "--fold_bn", "--fold_normalize",
                  "--backbone_pad_width", "128", "--backbone_remat",
                  "--lr_bert_names", "a", "b"])
    cfg = args_to_config(args)
    assert cfg.model.masks is True
    assert cfg.model.dtype == "bfloat16"
    assert cfg.model.space_to_depth_stem is True
    assert cfg.model.fold_bn is True
    assert cfg.model.fold_normalize is True
    assert cfg.model.backbone_pad_width == 128
    assert cfg.model.backbone_remat is True
    assert cfg.train.lr == pytest.approx(1e-5)
    assert cfg.train.lr_mask_branch_proj == pytest.approx(10.0)
    assert cfg.train.lr_bert_names == ("a", "b")
    assert cfg.data.dataset == "refcoco_unc"
    assert tuple(cfg.data.test_splits) == ("val", "testA", "testB")


def test_pt_presets_expect_resume():
    args = parse(["--preset", "flickr_pt"])
    assert args.resume_model_only is True
    assert args.epochs == 40 and args.lr_drop == 30
