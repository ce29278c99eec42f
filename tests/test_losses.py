"""Loss parity vs torch implementations of the reference's objectives."""

import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from mumpy_tpu.train.losses import focal_loss, soft_iou_loss, total_loss

RNG = np.random.default_rng(1)


def _torch_soft_iou(target, logits, e=1e-6):
    # utils/loss.py:28-55 semantics
    out = torch.sigmoid(logits)
    num = (out * target).sum(-1)
    den = (out + target - out * target).sum(-1) + e
    return (1 - num / den).mean()


def _torch_focal(target, logits, gamma=2.0):
    # utils/loss.py:6-25 with alpha=[1,1]
    bce = F.binary_cross_entropy_with_logits(logits, target, reduction="none")
    pt = torch.exp(-bce)
    return ((1 - pt) ** gamma * bce).mean()


def test_losses_match_torch():
    b, n = 4, 64
    logits = RNG.standard_normal((b, n)).astype(np.float32) * 3
    target = (RNG.uniform(size=(b, n)) > 0.7).astype(np.float32)
    lt, tt = torch.from_numpy(logits), torch.from_numpy(target)

    np.testing.assert_allclose(
        float(soft_iou_loss(jnp.asarray(target), jnp.asarray(logits))),
        float(_torch_soft_iou(tt, lt)), rtol=1e-5,
    )
    np.testing.assert_allclose(
        float(focal_loss(jnp.asarray(target), jnp.asarray(logits))),
        float(_torch_focal(tt, lt)), rtol=1e-5,
    )
    loss, (iou, foc) = total_loss(jnp.asarray(target), jnp.asarray(logits))
    np.testing.assert_allclose(float(loss), float(iou) + float(foc), rtol=1e-6)


def test_metrics_oracle():
    from mumpy_tpu.utils.metrics import f1_iou, iou_score

    pred = np.zeros((8, 8))
    gt = np.zeros((8, 8))
    pred[:4, :4] = 1.0
    gt[:4] = 1.0  # half overlap
    f1, iou = f1_iou(pred, gt)
    # intersection 16, pred 16, gt 32 -> p=1, r=0.5, f1≈2/3; iou=16/32=0.5
    assert abs(f1 - 2 / 3) < 1e-3
    assert abs(iou - 0.5) < 1e-3
    assert abs(iou_score(pred, gt) - 0.5) < 1e-4

    # empty/empty: smoothed iou -> 1, f1 -> 0 (reference semantics)
    z = np.zeros((8, 8))
    f1z, iouz = f1_iou(z, z)
    assert iouz == 1.0 and f1z == 0.0


def test_polynomial_schedule_matches_reference():
    # utils/optimizer/scheduler.py:24-31 with no warmup
    from mumpy_tpu.train.optim import polynomial_schedule

    base, min_lr, power, iter_max = 1e-2, 1e-5, 0.9, 100
    sched = polynomial_schedule(base, min_lr, power, iter_max)
    for it in [0, 1, 50, 99, 100]:
        ref = (base - min_lr) * (1 - it / iter_max) ** power + min_lr
        np.testing.assert_allclose(float(sched(it)), ref, rtol=1e-6)
    # past iter_max clamps at min_lr instead of going complex
    np.testing.assert_allclose(float(sched(150)), min_lr, rtol=1e-6)
