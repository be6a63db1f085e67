#!/bin/bash
# Reference Run_seg_coco.sh equivalent (COCO object / stuff).
set -e
DATA_TYPE=${1:-coco_object}
HOME_DIR=${2:?home_dir required}
SAVE_PATH=${3:?save_path required}
CKPT=${4:+--checkpoint $4}
VOCAB=${5:+--vocab $5}
python -m pnp_ovss_tpu.cli.segment \
  --data_type "$DATA_TYPE" --home_dir "$HOME_DIR" --save_path "$SAVE_PATH" \
  --img_size 336 --batch_size 35 \
  --max_att_block_num 8 --prune_att_head 9 \
  --drop_iter 4 --threshold 0.15 --postprocess blur+crf $CKPT $VOCAB
