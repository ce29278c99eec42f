#!/usr/bin/env bash
# YTVI training recipe (counterpart of the reference ``scripts/train_youtube.sh:3-19``):
# batch 4 x 3 inpainting streams, clip 3, 5 epochs, SGD all lrs 1e-2,
# weight decay 1e-4, gradient accumulation 8.
set -euo pipefail
cd "$(dirname "$0")/.."

YTVI_ROOT=${YTVI_ROOT:-/data/YTVI}

python train.py \
  -model_name mumpy_youtube \
  -dataset youtubevos \
  -batch_size 4 \
  -length_clip 3 \
  -max_epoch 5 \
  -optim sgd -optim_cnn sgd \
  -lr 1e-2 -lr_cnn 1e-2 -lr_cva 1e-2 \
  -weight_decay 1e-4 -weight_decay_cnn 1e-4 \
  -accumulation_steps 8 \
  -seq_dir "${YTVI_ROOT}/JPEGImages_ff" \
  -seq_dir2 "${YTVI_ROOT}/JPEGImages_eg2" \
  -seq_dir3 "${YTVI_ROOT}/JPEGImages_isvi" \
  -annot_dir "${YTVI_ROOT}/Annotations" \
  "$@"
