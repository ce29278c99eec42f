"""Training losses: soft-IoU + weighted focal (``utils/loss.py``).

Device-agnostic jnp ports (the reference hardcodes ``.cuda()`` in the focal loss,
``loss.py:12``).  Both take targets/logits flattened per sample to match the
reference's call shapes (``train.py:107-113``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["soft_iou_loss", "focal_loss", "total_loss"]


def soft_iou_loss(targets: jnp.ndarray, logits: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """1 - softIoU on sigmoided logits, averaged over the batch (``loss.py:28-55``).

    targets/logits: (B, N) with targets in {0, 1}.
    """
    out = jax.nn.sigmoid(logits)
    num = jnp.sum(out * targets, axis=-1)
    den = jnp.sum(out + targets - out * targets, axis=-1) + eps
    return jnp.mean(1.0 - num / den)


def focal_loss(targets: jnp.ndarray, logits: jnp.ndarray, gamma: float = 2.0) -> jnp.ndarray:
    """Focal-modulated BCE-with-logits (``loss.py:6-25``).

    The reference's per-class alpha is [1, 1] (``loss.py:12``), i.e. no class
    weighting — kept as such.
    """
    bce = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    pt = jnp.exp(-bce)
    return jnp.mean((1.0 - pt) ** gamma * bce)


def total_loss(targets: jnp.ndarray, logits: jnp.ndarray):
    """The reference's training objective: mean softIoU + mean focal
    (``train.py:107-113``).  Returns (loss, (iou_term, focal_term))."""
    iou = soft_iou_loss(targets, logits)
    foc = focal_loss(targets, logits)
    return iou + foc, (iou, foc)
