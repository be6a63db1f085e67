#!/usr/bin/env bash
# Real-weights / real-data mIoU gate (ready to run once assets exist; this
# build environment has neither — NOTES.md "accuracy axis" section).
#
# Assets needed (reference README.md:28-89):
#   $CKPT  = model_large_retrieval_flickr.pth  (BLIP-ITM-Large, LAVIS)
#   $VOCAB = bert-base-uncased vocab.txt
#   $DATA  = dataset root: VOCdevkit/VOC2012/... + GPT4o_classification/
#            (the GPT caches ship with the reference repo)
set -euo pipefail
CKPT=${CKPT:?set CKPT=/path/model_large_retrieval_flickr.pth}
VOCAB=${VOCAB:?set VOCAB=/path/vocab.txt}
DATA=${DATA:?set DATA=/path/data_root}
OUT=${OUT:-/tmp/pnp_gate}

# Full-scale torch-oracle parity against the real checkpoint first.
RUN_SLOW_TESTS=1 python -m pytest tests/test_torch_oracle_full.py -q

python scripts/accuracy_gate.py \
  --checkpoint "$CKPT" --vocab "$VOCAB" --home_dir "$DATA" \
  --save_path "$OUT" --data_type voc "$@"
