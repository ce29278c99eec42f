#!/usr/bin/env bash
# DVI training recipe (counterpart of the reference ``scripts/train_davis.sh:3-20``):
# batch 6 x 2 inpainting streams, clip 3, 50 epochs, SGD, lr_cnn 1e-3,
# lr/lr_cva 1e-2, weight decay 1e-4, no accumulation.
set -euo pipefail
cd "$(dirname "$0")/.."

DAVIS_ROOT=${DAVIS_ROOT:-/data/DVI}

python train.py \
  -model_name mumpy_davis \
  -dataset davis \
  -batch_size 6 \
  -length_clip 3 \
  -max_epoch 50 \
  -optim sgd -optim_cnn sgd \
  -lr 1e-2 -lr_cnn 1e-3 -lr_cva 1e-2 \
  -weight_decay 1e-4 -weight_decay_cnn 1e-4 \
  -accumulation_steps 1 \
  -seq_dir "${DAVIS_ROOT}/JPEGImages_vi" \
  -seq_dir2 "${DAVIS_ROOT}/JPEGImages_cp" \
  -annot_dir "${DAVIS_ROOT}/Annotations" \
  "$@"
