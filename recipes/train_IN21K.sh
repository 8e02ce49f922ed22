#!/bin/bash
# Full-dataset image recipe (reference train_IN21K.sh): batch 128/process,
# blr 1e-3 (lr = blr*eff_batch/256), wd 0.01, 100 epochs, warmup 20,
# token keep target 0.5.  SPMD over all local TPU chips - no launcher needed.
DATASET=${1:-cifar100}
DATA=${2:-/data}
CKPT=${3:-/ckpts/VIT_BASE_IN21K.pth}
python main_image.py \
  --dataset "$DATASET" --data_path "$DATA" --finetune "$CKPT" \
  --batch_size 128 --blr 1e-3 --weight_decay 0.01 \
  --epochs 100 --warmup_epochs 20 \
  --ffn_num 64 --token_target_ratio 0.5 \
  --output_dir "./output_dir/${DATASET}"
