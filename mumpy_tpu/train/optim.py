"""Optimizers + LR schedules mirroring the reference's three-group setup.

The reference partitions parameters into encoder / decoder / CVA groups by name
("cva" substring, ``train.py:204-213``), builds one optimizer per group
(``utils/utils.py:252-261``: sgd w/ momentum 0.9, adam -> AdamW, rmsprop) and one
per-iteration polynomial LR scheduler per group (power 0.9, min_lr 1e-5, no warmup —
``utils/optimizer/scheduler.py:6-43``, ``train.py:222-280``).

Here it is one ``optax.multi_transform`` over the joint (encoder+decoder) pytree with
labels derived from parameter paths, which keeps a single TrainState that pjit can
shard.  Gradient accumulation uses ``optax.MultiSteps`` (``train.py:115-130``).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import optax
from flax import traverse_util


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    optim: str = "sgd"  # decoder group (``args.py`` -optim)
    optim_cnn: str = "sgd"  # encoder + cva groups (-optim_cnn)
    lr: float = 1e-2  # decoder lr
    lr_cnn: float = 1e-3  # encoder lr
    lr_cva: float = 1e-2  # cva lr
    weight_decay: float = 1e-4
    weight_decay_cnn: float = 1e-4
    momentum: float = 0.9
    min_lr: float = 1e-5
    poly_power: float = 0.9
    accumulation_steps: int = 1


def polynomial_schedule(base_lr: float, min_lr: float, power: float, iter_max: int):
    """(base - min) * (1 - i/iter_max)^power + min (``scheduler.py:24-31``)."""

    def schedule(count):
        import jax.numpy as jnp

        frac = jnp.clip(1.0 - count / iter_max, 0.0, 1.0)
        return (base_lr - min_lr) * frac**power + min_lr

    return schedule


def _group_tx(name: str, lr: float, cfg: OptimConfig, iter_max: int) -> optax.GradientTransformation:
    sched = polynomial_schedule(lr, cfg.min_lr, cfg.poly_power, iter_max)
    # reference decay assignment (``train.py:211-213``): only the encoder group
    # uses weight_decay_cnn; decoder AND cva use weight_decay
    wd = cfg.weight_decay_cnn if name == "enc" else cfg.weight_decay
    kind = cfg.optim if name == "dec" else cfg.optim_cnn
    if kind == "sgd":
        # torch SGD(weight_decay) == L2 added to grad before momentum
        return optax.chain(
            optax.add_decayed_weights(wd),
            optax.sgd(learning_rate=sched, momentum=cfg.momentum),
        )
    if kind == "adam":
        return optax.adamw(learning_rate=sched, weight_decay=wd)
    if kind == "rmsprop":
        return optax.chain(
            optax.add_decayed_weights(wd),
            # torch RMSprop defaults: alpha=0.99, eps=1e-8
            optax.rmsprop(learning_rate=sched, decay=0.99, eps=1e-8),
        )
    raise ValueError(f"unknown optimizer {kind}")


def label_params(params: Any) -> Any:
    """enc / dec / cva labels from parameter paths (``train.py:204-209``)."""
    flat = traverse_util.flatten_dict(params)
    labels = {}
    for k in flat:
        if any("cva" in part for part in k):
            labels[k] = "cva"
        elif k and k[0] == "decoder":
            labels[k] = "dec"
        else:
            labels[k] = "enc"
    return traverse_util.unflatten_dict(labels)


def build_optimizer(params: Any, cfg: OptimConfig, iter_max: int) -> optax.GradientTransformation:
    """Three-group transform with per-group schedule and optimizer kind.

    ``iter_max`` = train_batches_per_epoch * epochs / accumulation_steps
    (``train.py:234``).
    """
    tx = optax.multi_transform(
        {
            "enc": _group_tx("enc", cfg.lr_cnn, cfg, iter_max),
            "dec": _group_tx("dec", cfg.lr, cfg, iter_max),
            "cva": _group_tx("cva", cfg.lr_cva, cfg, iter_max),
        },
        label_params(params),
    )
    if cfg.accumulation_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.accumulation_steps)
    return tx


def current_lrs(step: int, cfg: OptimConfig, iter_max: int) -> dict:
    """LR telemetry matching the reference's TensorBoard curves (``train.py:383-385``)."""
    out = {}
    for name, lr in (("enc", cfg.lr_cnn), ("dec", cfg.lr), ("cva", cfg.lr_cva)):
        out[name] = float(
            jax.tree_util.tree_leaves(
                polynomial_schedule(lr, cfg.min_lr, cfg.poly_power, iter_max)(step)
            )[0]
        )
    return out
