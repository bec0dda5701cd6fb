#!/bin/bash
# From-scratch FLAGSHIP run, attempt 4 (round 5). Attempt 3 proved the
# encoder carries the box location (vision_aux probe BCE -> 0.03) while
# box regression stayed at the phrase-conditional mean: position never
# enters the value pathway (DETR q/k-only convention), so the decoder
# has no positional readout of the attended tokens. Attempt 4 adds
# --img_pos_in_stream (ViT convention). Target: accuracy_iou0.5 >= 0.9
# on the synthetic 640px fixture.
cd /root/repo
exec python -u -m reftr_tpu.cli.main \
  --num_feature_levels 1 \
  --dataset synthetic --train_split train --test_split val \
  --img_size 640 --max_img_size 640 \
  --synthetic_n 256 --synthetic_box_frac 0.25 0.5 \
  --bert_size tiny \
  --backbone_norm group --train_stem --pre_norm --space_to_depth_stem \
  --aux_loss --bbox_loss_coef 5 \
  --vision_aux_loss --vision_aux_loss_coef 2 --img_pos_in_stream \
  --lr 3e-3 --lr_backbone 3e-3 --lr_schedule CosineWarmupLR \
  --warm_up_epoch 5 --clip_max_norm 1.0 \
  --epochs 120 --batch_size 16 --num_workers 2 \
  --ckpt_cycle 20 --auto_resume --seed 0 \
  --output_dir exps/run_gn_flagship4 "$@"
