#!/bin/bash
# From-scratch FLAGSHIP run (VERDICT r4 #1): 640px, d=256, 6+6 layers,
# bert-tiny, bf16 — the round-5 recipe (--backbone_norm group --train_stem
# --pre_norm, lr 3e-3 cosine) that fixes the FrozenBN fp32 overflow
# (PERFORMANCE.md "From-scratch NaN root cause"). Target:
# accuracy_iou0.5 >= 0.9 on the synthetic 640px fixture (the
# tests/test_learning.py bar at flagship geometry).
#
# box_frac 0.25-0.5 (160-320px boxes at stride 32) and bbox_loss_coef 5
# follow the calibrated test_learning recipe: IoU@0.5 tests localization,
# not sub-stride regression precision. Per-epoch checkpoints via
# --output_dir so NaN investigations resume from the last good state
# (CLAUDE.md).
cd /root/repo
exec python -u -m reftr_tpu.cli.main \
  --num_feature_levels 1 \
  --dataset synthetic --train_split train --test_split val \
  --img_size 640 --max_img_size 640 \
  --synthetic_n 256 --synthetic_box_frac 0.25 0.5 \
  --bert_size tiny \
  --backbone_norm group --train_stem --pre_norm --space_to_depth_stem \
  --aux_loss --bbox_loss_coef 5 \
  --lr 3e-3 --lr_backbone 3e-3 --lr_schedule CosineWarmupLR \
  --warm_up_epoch 5 --clip_max_norm 1.0 \
  --epochs 120 --batch_size 16 --num_workers 2 \
  --ckpt_cycle 20 --auto_resume --seed 0 \
  --output_dir exps/run_gn_flagship "$@"
