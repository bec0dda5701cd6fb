#!/bin/bash
# From-scratch FLAGSHIP run, attempt 5 (round 5). Attempt 3: vision_aux
# probe solved (encoder carries the box) but box regression stayed at the
# phrase-conditional mean — no positional readout in cross-attn values.
# Attempt 4: pos added to the ENCODER stream drowned content learning
# (probe stuck at base rate). Attempt 5 is the surgical fix: pos enters
# ONLY the decoder cross-attention values (--decoder_pos_in_value), so
# encoder dynamics match attempt 3 while sum(w*(v+p)) hands bbox_embed
# the attended region center+extent. Target: acc_iou0.5 >= 0.9.
cd /root/repo
exec python -u -m reftr_tpu.cli.main \
  --num_feature_levels 1 \
  --dataset synthetic --train_split train --test_split val \
  --img_size 640 --max_img_size 640 \
  --synthetic_n 256 --synthetic_box_frac 0.25 0.5 \
  --bert_size tiny \
  --backbone_norm group --train_stem --pre_norm --space_to_depth_stem \
  --aux_loss --bbox_loss_coef 5 \
  --vision_aux_loss --vision_aux_loss_coef 2 --decoder_pos_in_value \
  --lr 3e-3 --lr_backbone 3e-3 --lr_schedule CosineWarmupLR \
  --warm_up_epoch 5 --clip_max_norm 1.0 \
  --epochs 120 --batch_size 16 --num_workers 2 \
  --ckpt_cycle 20 --auto_resume --seed 0 \
  --output_dir exps/run_gn_flagship5 "$@"
