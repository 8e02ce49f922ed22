#!/bin/bash
# VTAB-1K recipe (reference train_vtab.sh): lr 1e-3, wd 1e-4, 100 epochs,
# warmup 10, ffn_num 16, adapter scale 1.0, batch 64, no augmentation.
TASK=${1:-all}
DATA=${2:-/data/vtab-1k}
CKPT=${3:-/ckpts/VIT_BASE_IN21K.pth}
python main_vtab.py --task "$TASK" --data_path "$DATA" --finetune "$CKPT" \
  --output_dir ./output_dir/vtab
