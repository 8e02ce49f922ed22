#!/bin/bash
# ADE20K segmentation recipe (reference seg_train.sh + our_vit.py config).
DATA=${1:-/data/ADEChallengeData2016}
CKPT=${2:-/ckpts/VIT_BASE_IN21K.pth}
python seg_train.py --dataset ade20k --data_path "$DATA" --finetune "$CKPT" \
  --batch_size 2 --lr 1e-3 --weight_decay 0.05 --drop_path 0.1 \
  --total_iters 160000 --eval_interval 16000 --output_dir ./output_dir/ade20k
