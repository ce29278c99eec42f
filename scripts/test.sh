#!/usr/bin/env bash
# Mask generation (counterpart of the reference ``scripts/test.sh:4``).
set -euo pipefail
cd "$(dirname "$0")/.."

DAVIS_ROOT=${DAVIS_ROOT:-/data/DVI}

python test.py \
  -model_name mumpy_davis \
  -dataset davis \
  -test_epoch "${TEST_EPOCH:--1}" \
  -eval_split test \
  -seq_dir "${DAVIS_ROOT}/JPEGImages_vi" \
  -annot_dir "${DAVIS_ROOT}/Annotations" \
  "$@"
