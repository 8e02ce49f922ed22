#!/bin/bash
# Video recipe (reference train_video.sh): batch 16/process, blr 1e-3,
# K400 12 epochs / SSv2 50 epochs, warmup 2, 8 frames.
DATASET=${1:-k400}
DATA=${2:-/data/k400}
CKPT=${3:-/ckpts/VIT_BASE_IN21K.pth}
EPOCHS=12; [ "$DATASET" = "ssv2" ] && EPOCHS=50
python main_video.py --dataset "$DATASET" --data_path "$DATA" \
  --finetune "$CKPT" --batch_size 16 --blr 1e-3 --epochs "$EPOCHS" \
  --warmup_epochs 2 --num_frames 8 --output_dir "./output_dir/${DATASET}"
