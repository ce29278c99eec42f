"""F1/IoU scoring oracle — numpy port of the reference's ``measure.py``.

This is the parity oracle for the whole rebuild: predictions and ground truth are
resized to 224x224, binarized at 0.5, and scored with per-image F1
(``measure.py:65-91``) and smoothed IoU (``measure.py:46-62``).
"""

from __future__ import annotations

import glob
import os
from typing import Iterable, Optional, Tuple

import numpy as np

__all__ = ["iou_score", "f1_iou", "evaluate_image_pair", "evaluate_dirs"]


def iou_score(output: np.ndarray, target: np.ndarray, smooth: float = 1e-5) -> float:
    """(intersection + s) / (union + s) at threshold 0.5 (``measure.py:46-62``)."""
    o = output > 0.5
    t = target > 0.5
    inter = (o & t).sum()
    union = (o | t).sum()
    return float((inter + smooth) / (union + smooth))


def f1_iou(pred: np.ndarray, gt: np.ndarray) -> Tuple[float, float]:
    """Per-image F1 and IoU with the reference's exact smoothing
    (``measure.py:85-89``).  ``pred`` in [0, 1]; ``gt`` boolean or {0, 1}."""
    gt_mask = gt > 0
    pred_bin = pred > 0.5
    recall = np.sum(gt_mask & pred_bin) / np.sum(gt_mask + 1e-6)
    precision = np.sum(gt_mask & pred_bin) / (np.sum(pred_bin) + 1e-6)
    f1 = 2 * (precision * recall) / (precision + recall + 1e-6)
    return float(f1), iou_score(pred, gt_mask)


def _load_gray(path: str, size: Tuple[int, int], normalize: bool) -> Optional[np.ndarray]:
    from PIL import Image

    try:
        img = Image.open(path).convert("L").resize(size, Image.BILINEAR)
        arr = np.asarray(img)
        return arr / 255.0 if normalize else arr
    except Exception:
        return None


def evaluate_image_pair(pred_path: str, gt_path: str, size=(224, 224)):
    """Score one predicted mask file against its GT file (``measure.py:65-91``)."""
    gt = _load_gray(gt_path, size, normalize=False)
    pred = _load_gray(pred_path, size, normalize=True)
    if gt is None or pred is None:
        return None, None
    return f1_iou(pred, gt > 0)


def evaluate_dirs(pred_dir: str, gt_dir: str, size=(224, 224), verbose: bool = False):
    """Directory-level scoring with the reference's file pairing
    (``measure.py:94-130``): predictions ``<pred>/<seq>/<frame>_*.png`` matched with
    ``<gt>/<seq>/{frame:05d}.png``.  Returns (mean_f1, mean_iou, n)."""
    preds: Iterable[str] = sorted(
        glob.glob(os.path.join(pred_dir, "*/*.png"))
        or glob.glob(os.path.join(pred_dir, "*/*.jpg"))
    )
    f1s, ious = [], []
    for p in preds:
        frame = "{:05d}".format(int(os.path.splitext(os.path.basename(p))[0].split("_")[0]))
        gt_path = os.path.join(gt_dir, os.path.basename(os.path.dirname(p)), frame + ".png")
        if not os.path.exists(gt_path):
            continue
        f1, iou = evaluate_image_pair(p, gt_path, size)
        if f1 is not None and f1 <= 1 and iou <= 1:
            f1s.append(f1)
            ious.append(iou)
            if verbose:
                print(f"{p}: IoU {iou:.4f} F1 {f1:.4f}")
    n = len(f1s)
    return (float(np.mean(f1s)) if n else 0.0, float(np.mean(ious)) if n else 0.0, n)
