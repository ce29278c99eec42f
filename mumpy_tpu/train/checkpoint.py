"""Orbax checkpointing with the reference's epoch-tagged layout.

The reference saves ``encoder_{e}.pt`` / ``decoder_{e}.pt`` / optimizer dicts +
pickled args per epoch (``utils/utils.py:264-276,301-321``).  Here a single orbax
checkpoint per epoch holds the joint train state (params + optimizer) plus a JSON
metadata record; ``load_latest`` / ``load_epoch`` mirror the epoch selector of
``load_checkpoint`` (``utils/utils.py:301-321``).
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

__all__ = ["save", "load_epoch", "load_latest", "available_epochs"]


def _ckpt_dir(model_dir: str, epoch: int) -> str:
    return os.path.join(os.path.abspath(model_dir), f"ckpt_{epoch}")


def save(model_dir: str, state: Any, epoch: int, extra: Optional[dict] = None) -> None:
    path = _ckpt_dir(model_dir, epoch)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    meta = {"epoch": epoch, **(extra or {})}
    with open(os.path.join(model_dir, f"meta_{epoch}.json"), "w") as f:
        json.dump(meta, f)


def available_epochs(model_dir: str):
    if not os.path.isdir(model_dir):
        return []
    eps = []
    for name in os.listdir(model_dir):
        m = re.fullmatch(r"ckpt_(\d+)", name)
        if m:
            eps.append(int(m.group(1)))
    return sorted(eps)


def load_epoch(model_dir: str, target: Any, epoch: int) -> Any:
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(_ckpt_dir(model_dir, epoch), target=target)


def load_latest(model_dir: str, target: Any) -> Optional[Any]:
    eps = available_epochs(model_dir)
    if not eps:
        return None
    return load_epoch(model_dir, target, eps[-1])
