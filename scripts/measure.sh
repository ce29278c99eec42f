#!/usr/bin/env bash
# F1/IoU scoring of saved masks (counterpart of the reference ``scripts/measure.sh:3``).
set -euo pipefail
cd "$(dirname "$0")/.."

python measure.py \
  --input "${1:-results/mumpy_davis/masks_davis}" \
  --mask_dir "${2:-/data/DVI/Annotations}"
