#!/usr/bin/env python
"""Scoring entry point (counterpart of the reference's ``measure.py``).

Model-free: pairs predicted masks ``<input>/<seq>/<frame>_*.png`` with GT
``<mask_dir>/<seq>/{frame:05d}.png``, resizes both to 224x224, binarizes at 0.5 and
prints per-image + average F1/IoU (``measure.py:94-130``).
"""

import argparse

from mumpy_tpu.utils.metrics import evaluate_dirs


def main():
    p = argparse.ArgumentParser(description="Evaluate segmentation results.")
    p.add_argument("--input", "-i", required=True, help="Directory of predicted masks.")
    p.add_argument("--mask_dir", "-d", required=True, help="Directory of GT masks.")
    p.add_argument("--im_dir", "-l", required=False, help="(unused, reference parity)")
    p.add_argument("--quiet", action="store_true")
    args = p.parse_args()

    f1, iou, n = evaluate_dirs(args.input, args.mask_dir, verbose=not args.quiet)
    print("\nEvaluation Complete")
    print(f"Scored {n} images")
    print(f"Average F1: {f1:.4f}")
    print(f"Average IoU: {iou:.4f}")


if __name__ == "__main__":
    main()
