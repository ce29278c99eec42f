"""Device mesh + sharding helpers.

The reference's only parallelism is single-process ``nn.DataParallel``
(``train.py:290-292``).  The TPU-native equivalent is a 1-axis ``jax.sharding.Mesh``
over ICI with the (stream-concatenated) batch sharded on the ``data`` axis; gradient
all-reduce is inserted by XLA under ``jit``.  The helpers below keep the train step
agnostic to chip count — a 1-device mesh degenerates to single-chip execution.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "batch_sharding", "replicated_sharding", "shard_batch"]

DATA_AXIS = "data"


def make_mesh(devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis sharded over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Device-put a host batch with its leading axis split across the mesh."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
