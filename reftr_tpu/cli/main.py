"""CLI entry point.

Mirrors the reference's flag surface (/root/reference/main_vg.py:26-164) and
maps it onto RefTRConfig. Presets replicate configs/**/*.sh:

  python -m reftr_tpu.cli.main --dataset refcoco_unc --num_feature_levels 1 \
      --dec_layers 6 --aux_loss --img_size 640 --output_dir exps/refcoco
  python -m reftr_tpu.cli.main --preset refcoco_det ...

Unlike the reference there is no launcher script layer: multi-host runs
bootstrap via jax.distributed (env JAX_COORDINATOR_ADDRESS / Slurm vars).
"""

from __future__ import annotations

import argparse
import sys

from reftr_tpu.cli.presets import PRESETS, apply_preset
from reftr_tpu.core.config import RefTRConfig


def get_args_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("RefTR-TPU visual grounding", add_help=False)
    p.add_argument("--preset", default=None, choices=sorted(PRESETS),
                   help="named config mirroring the reference configs/*.sh")
    # optimization
    p.add_argument("--lr", default=1e-4, type=float)
    p.add_argument("--lr_backbone", default=1e-5, type=float)
    p.add_argument("--lr_bert", default=None, type=float,
                   help="defaults to --lr_backbone like the reference")
    p.add_argument("--lr_mask_branch_proj", default=1.0, type=float)
    p.add_argument("--lr_backbone_names", default=["img_backbone"],
                   type=str, nargs="+")
    p.add_argument("--lr_bert_names", default=["lang_backbone"],
                   type=str, nargs="+")
    p.add_argument("--lr_mask_branch_names",
                   default=["bbox_attention", "mask_head"],
                   type=str, nargs="+")
    p.add_argument("--batch_size", default=8, type=int)
    p.add_argument("--weight_decay", default=1e-4, type=float)
    p.add_argument("--epochs", default=60, type=int)
    p.add_argument("--lr_drop", default=40, type=int)
    p.add_argument("--lr_drop_epochs", default=None, type=int, nargs="+")
    p.add_argument("--warm_up_epoch", default=2, type=int)
    p.add_argument("--lr_decay", default=0.1, type=float)
    p.add_argument("--lr_schedule", default="StepLR", type=str)
    p.add_argument("--clip_max_norm", default=0.1, type=float)
    p.add_argument("--ckpt_cycle", default=20, type=int)
    p.add_argument("--sgd", action="store_true")
    # model
    p.add_argument("--reftr_type", default="transformer_single_phrase")
    p.add_argument("--pretrained_model", type=str, default=None)
    p.add_argument("--freeze_backbone", action="store_true")
    # FROM-SCRATCH deviation (no reference counterpart): train stem+layer1
    # at lr_backbone instead of the reference's unconditional freeze, which
    # assumes an ImageNet init (backbone.py:85-89). See core/config.py.
    p.add_argument("--train_stem", action="store_true")
    # FROM-SCRATCH deviation: live GroupNorm(32) instead of FrozenBN in the
    # backbone. FrozenBN with init-value stats normalizes nothing and the
    # residual stream overflows fp32 after enough from-scratch updates
    # (measured: NaN at epoch 9, PERFORMANCE.md round 5). Use with
    # --train_stem; incompatible with --fold_bn/--fold_normalize/
    # --quantize_int8 (nothing frozen to fold).
    p.add_argument("--backbone_norm", default="frozen",
                   choices=("frozen", "group"))
    # FROM-SCRATCH deviation: dense in-box BCE on the encoder's image
    # tokens (a linear probe head). Breaks the language-only basin that
    # from-scratch runs fall into (PERFORMANCE.md "Flagship-geometry
    # training"); REC only — the RES mask loss already supervises vision.
    p.add_argument("--vision_aux_loss", action="store_true")
    p.add_argument("--vision_aux_loss_coef", default=1.0, type=float)
    # FROM-SCRATCH deviation: sine position embedding added INTO the image
    # token stream (ViT convention) instead of q/k-only (DETR convention).
    # Without it the decoder's box readout needs the encoder to learn
    # position-into-content injection from scratch — see core/config.py.
    p.add_argument("--img_pos_in_stream", action="store_true")
    # FROM-SCRATCH deviation: decoder cross-attn values carry memory_pos
    # (positional readout of the attended region; see core/config.py).
    p.add_argument("--decoder_pos_in_value", action="store_true")
    # FROM-SCRATCH deviation: final box decoded from the vision_aux
    # heatmap (soft-argmax; requires --vision_aux_loss). See core/config.py.
    p.add_argument("--heatmap_box", action="store_true")
    p.add_argument("--ablation", type=str, default="none")
    p.add_argument("--backbone", default="resnet50", type=str)
    p.add_argument("--dilation", action="store_true")
    p.add_argument("--position_embedding", default="sine", type=str,
                   choices=("sine", "learned"))
    # default 4 matches the reference's argparse (main_vg.py:71); every
    # shipped preset/config overrides to 1, like the reference configs/*.sh
    p.add_argument("--num_feature_levels", default=4, type=int)
    p.add_argument("--enc_layers", default=6, type=int)
    p.add_argument("--dec_layers", default=6, type=int)
    p.add_argument("--no_decoder", action="store_true")
    p.add_argument("--dim_feedforward", default=2048, type=int)
    p.add_argument("--hidden_dim", default=256, type=int)
    p.add_argument("--dropout", default=0.1, type=float)
    p.add_argument("--nheads", default=8, type=int)
    p.add_argument("--masks", action="store_true")
    p.add_argument("--freeze_reftr", action="store_true")
    p.add_argument("--bert_model", default="bert-base-uncased", type=str)
    p.add_argument("--freeze_bert", action="store_true")
    p.add_argument("--max_lang_seq", default=128, type=int)
    p.add_argument("--num_queries_per_phrase", default=1, type=int)
    p.add_argument("--aux_loss", action="store_true")
    # pre-LN transformer blocks (transformer.py:24 normalize_before — the
    # reference supports it but never exposes a flag; DETR's --pre_norm).
    # Post-LN is the parity default; pre-LN is the from-scratch-trainable
    # variant (see PERFORMANCE.md flagship-training investigation).
    p.add_argument("--pre_norm", action="store_true")
    # losses
    p.add_argument("--mask_loss_coef", default=1.0, type=float)
    p.add_argument("--dice_loss_coef", default=1.0, type=float)
    p.add_argument("--bbox_loss_coef", default=1.0, type=float)
    p.add_argument("--giou_loss_coef", default=1.0, type=float)
    p.add_argument("--focal_alpha", default=0.25, type=float)
    p.add_argument("--set_cost_class", default=1.0, type=float)
    p.add_argument("--set_cost_bbox", default=5.0, type=float)
    p.add_argument("--set_cost_giou", default=2.0, type=float)
    # data
    p.add_argument("--dataset", default="flickr30k")
    p.add_argument("--train_split", default="trainval")
    p.add_argument("--test_split", default=["test"], type=str, nargs="+")
    p.add_argument("--img_size", default=640, type=int)
    p.add_argument("--max_img_size", default=640, type=int)
    p.add_argument("--data_root", default="./data", type=str)
    p.add_argument("--num_workers", default=2, type=int)
    p.add_argument("--cache_mode", action="store_true")
    p.add_argument("--synthetic_n", default=256, type=int,
                   help="synthetic-fixture train-set size (val stays 64); "
                        "items generate lazily, large n is free in RAM")
    p.add_argument("--synthetic_box_frac", default=[1 / 6, 1 / 3],
                   type=float, nargs=2,
                   help="synthetic-fixture box side range (fraction of"
                        " img_size); (0.25, 0.5) = the calibrated"
                        " learning-validation recipe")
    # run control
    p.add_argument("--output_dir", default="")
    p.add_argument("--seed", default=42, type=int)
    p.add_argument("--resume", default="")
    p.add_argument("--auto_resume", action="store_true")
    p.add_argument("--resume_model_only", action="store_true")
    p.add_argument("--start_epoch", default=0, type=int)
    p.add_argument("--run_epoch", default=500, type=int)
    p.add_argument("--eval", action="store_true")
    p.add_argument("--visualize", action="store_true",
                   help="dump qualitative JPEGs during --eval")
    # TPU-native knobs
    p.add_argument("--dtype", default="bfloat16",
                   choices=("float32", "bfloat16"))
    p.add_argument("--mesh_data", default=-1, type=int)
    p.add_argument("--mesh_model", default=1, type=int)
    p.add_argument("--mesh_model_spans_processes", action="store_true",
                   help="lay the mesh out model-major (cross-host tensor "
                        "parallelism); input loading follows the mesh")
    p.add_argument("--use_pallas_attention", default=None,
                   choices=("auto", "on", "off"),
                   help="fused attention kernel; default auto (on for long"
                        " sequences on TPU)")
    p.add_argument("--remat", action="store_true")
    p.add_argument("--space_to_depth_stem", action="store_true",
                   help="MXU-friendly stem: 2x2 space-to-depth + 4x4/s1 conv"
                        " (exact fold of the 7x7/s2 stem)")
    p.add_argument("--fold_bn", action="store_true",
                   help="fold FrozenBN scales into conv kernels at load")
    p.add_argument("--fold_normalize", action="store_true",
                   help="fold /255 + ImageNet normalize into the stem conv"
                        " (uint8 input path; requires --fold_bn)")
    p.add_argument("--block_layer1", action="store_true",
                   help="run layer1 on the 2x2 space-to-depth grid (exact"
                        " reparameterization; fills MXU lanes at the"
                        " spatial-heaviest stage)")
    p.add_argument("--backbone_pad_width", default=0, type=int,
                   help="zero-pad bottleneck inner widths below this to it"
                        " (exact; fills MXU lanes at layer1)")
    p.add_argument("--quantize_int8", action="store_true",
                   help="int8 PTQ of the backbone bottleneck convs and the"
                        " BERT/VL-transformer projections+FFNs for"
                        " --eval/serving (2x MXU peak; requires --fold_bn;"
                        " calibrates input scales on the first eval batches)")
    p.add_argument("--quantize_train_prefix", action="store_true",
                   help="TRAINING-time int8 for the frozen stem+layer1"
                        " prefix (f32-stored grad-safe kernels; calibrates"
                        " on the first train batches). Requires --fold_bn;"
                        " excludes --train_stem/--quantize_int8")
    p.add_argument("--quant_calib_batches", default=4, type=int,
                   help="eval batches used to calibrate int8 input scales")
    p.add_argument("--quantize_scope", default=["backbone", "bert", "vl"],
                   nargs="+", choices=["backbone", "bert", "vl"],
                   help="which components --quantize_int8 lowers to int8"
                        " (vl = VL encoder/decoder projections+FFNs)")
    p.add_argument("--backbone_remat", action="store_true",
                   help="jax.checkpoint each backbone bottleneck (trade"
                        " recompute FLOPs for HBM activation traffic)")
    p.add_argument("--backbone_remat_stages", default=[], type=int,
                   nargs="*", help="remat only these backbone stages (1-4)")
    p.add_argument("--profile_dir", default="", type=str,
                   help="capture a jax.profiler trace of early steps")
    p.add_argument("--debug_nans", action="store_true",
                   help="enable jax_debug_nans (fail at the op producing "
                        "the first NaN instead of at the loss tripwire)")
    p.add_argument("--no_donate_state", action="store_true",
                   help="disable train-state buffer donation (debugging "
                        "aid; donation halves peak state memory)")
    p.add_argument("--bert_size", default="base", choices=("base", "tiny"),
                   help="tiny uses a small random-init language encoder "
                        "(smoke tests; no reference equivalent)")
    return p


def args_to_config(args: argparse.Namespace) -> RefTRConfig:
    cfg = RefTRConfig()
    m, t, d, l, mesh = cfg.model, cfg.train, cfg.data, cfg.loss, cfg.mesh
    # model
    m.reftr_type = args.reftr_type
    m.backbone = args.backbone
    m.dilation = args.dilation
    m.position_embedding = args.position_embedding
    m.num_feature_levels = args.num_feature_levels
    m.enc_layers = args.enc_layers
    m.dec_layers = args.dec_layers
    m.no_decoder = args.no_decoder
    m.dim_feedforward = args.dim_feedforward
    m.hidden_dim = args.hidden_dim
    m.dropout = args.dropout
    m.nheads = args.nheads
    m.masks = args.masks
    m.freeze_reftr = args.freeze_reftr
    # lr_backbone <= 0 freezes layer2-4 too (backbone.py:85-89); telling the
    # model lets it prune the whole backbone backward with stop_gradient
    m.freeze_backbone = args.freeze_backbone or args.lr_backbone <= 0
    m.train_stem = args.train_stem and not m.freeze_backbone
    m.backbone_norm = args.backbone_norm
    m.freeze_bert = args.freeze_bert
    m.bert_model = args.bert_model
    from reftr_tpu.core.config import BertConfig

    if args.bert_size == "tiny":
        m.bert = BertConfig.tiny()
    elif args.bert_model.split("-")[0] == "roberta":
        m.bert = BertConfig.roberta_base()
    m.bert.is_roberta = args.bert_model.split("-")[0] == "roberta"
    m.max_lang_seq = args.max_lang_seq
    m.num_queries_per_phrase = args.num_queries_per_phrase
    m.aux_loss = args.aux_loss
    m.normalize_before = args.pre_norm
    m.ablation = args.ablation
    m.dtype = args.dtype
    m.use_pallas_attention = {None: None, "auto": None, "on": True,
                              "off": False}[args.use_pallas_attention]
    m.remat = args.remat
    m.space_to_depth_stem = args.space_to_depth_stem
    m.fold_bn = args.fold_bn
    m.fold_normalize = args.fold_normalize
    m.backbone_pad_width = args.backbone_pad_width
    m.block_layer1 = args.block_layer1
    m.backbone_remat = args.backbone_remat
    m.backbone_remat_stages = tuple(args.backbone_remat_stages)
    m.quantize_int8 = args.quantize_int8
    m.quantize_scope = tuple(args.quantize_scope)
    m.quantize_train_prefix = args.quantize_train_prefix
    m.vision_aux = args.vision_aux_loss and not args.masks
    m.img_pos_in_stream = args.img_pos_in_stream
    m.decoder_pos_in_value = args.decoder_pos_in_value
    m.heatmap_box = args.heatmap_box
    # loss
    l.vision_aux_coef = args.vision_aux_loss_coef
    l.bbox_loss_coef = args.bbox_loss_coef
    l.giou_loss_coef = args.giou_loss_coef
    l.mask_loss_coef = args.mask_loss_coef
    l.dice_loss_coef = args.dice_loss_coef
    l.focal_alpha = args.focal_alpha
    l.set_cost_class = args.set_cost_class
    l.set_cost_bbox = args.set_cost_bbox
    l.set_cost_giou = args.set_cost_giou
    # data
    d.dataset = args.dataset
    d.train_split = args.train_split
    d.test_splits = tuple(args.test_split)
    d.img_size = args.img_size
    d.max_img_size = args.max_img_size
    d.data_root = args.data_root
    d.batch_size = args.batch_size
    d.num_workers = args.num_workers
    d.cache_mode = args.cache_mode
    d.synthetic_box_frac = tuple(args.synthetic_box_frac)
    d.synthetic_n = args.synthetic_n
    d.multi_phrase = args.dataset == "flickr30k"
    # train
    t.lr = args.lr
    t.lr_backbone = args.lr_backbone
    t.lr_bert = args.lr_bert if args.lr_bert is not None else args.lr_backbone
    t.lr_mask_branch_proj = args.lr_mask_branch_proj
    t.lr_backbone_names = tuple(args.lr_backbone_names)
    t.lr_bert_names = tuple(args.lr_bert_names)
    t.lr_mask_branch_names = tuple(args.lr_mask_branch_names)
    t.sgd = args.sgd
    t.weight_decay = args.weight_decay
    t.clip_max_norm = args.clip_max_norm
    t.epochs = args.epochs
    t.lr_drop = args.lr_drop
    t.lr_drop_epochs = tuple(args.lr_drop_epochs) if args.lr_drop_epochs else None
    t.warm_up_epoch = args.warm_up_epoch
    t.lr_decay = args.lr_decay
    t.lr_schedule = args.lr_schedule
    t.ckpt_cycle = args.ckpt_cycle
    t.seed = args.seed
    t.output_dir = args.output_dir
    t.resume = args.resume
    t.auto_resume = args.auto_resume
    t.resume_model_only = args.resume_model_only
    t.start_epoch = args.start_epoch
    t.run_epoch = args.run_epoch
    t.eval_only = args.eval
    t.pretrained_model = args.pretrained_model
    t.profile_dir = args.profile_dir
    t.donate_state = not args.no_donate_state
    t.visualize = args.visualize
    t.quant_calib_batches = args.quant_calib_batches
    # mesh
    mesh.data = args.mesh_data
    mesh.model = args.mesh_model
    mesh.model_spans_processes = args.mesh_model_spans_processes
    return cfg


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        "RefTR-TPU training and evaluation", parents=[get_args_parser()])
    args = parser.parse_args(argv)
    if args.preset:
        apply_preset(args, args.preset, argv)
    if args.debug_nans:
        import jax

        jax.config.update("jax_debug_nans", True)
    cfg = args_to_config(args)
    from reftr_tpu.train.loop import run_training

    result = run_training(cfg)
    if "best_val_acc" in result:
        print(f"best accuracy_iou0.5: {result['best_val_acc']:.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
