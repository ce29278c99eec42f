"""Serving-optimized inference: capture kernel-ready block operands once.

The fused Swin-block kernel needs per-head weight splits and a padded/tiled
mask+bias term.  Computing those on-device costs ~10 launches per block per
forward; this module captures them once into the "prepared" flax collection by
running a single forward with ``mutable=["prepared"]``, after which

    model.apply({"params": params, "prepared": prepared}, clip)

dispatches every fused block with zero per-block preparation work.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

__all__ = ["prepare_for_inference", "make_serving_forward"]


def make_serving_forward(model, variables, mesh=None, example_clip=None):
    """Jitted sigmoid-forward for serving, data-parallel over ``mesh``.

    The reference serves on at most one GPU (``test.py:56-58`` wraps the model
    in DataParallel but iterates batch-1); here the clip batch is sharded on
    the mesh's data axis via ``shard_map`` — every device runs the complete
    per-shard program locally, so the pallas custom calls never need a GSPMD
    partitioning rule and no collectives are inserted (the model is
    batch-elementwise).  The "prepared" fused-kernel operands depend on the
    per-device window count, so they are re-captured at the per-device batch
    (``example_clip`` must be a full global batch when a mesh is given).
    With ``mesh=None`` or a single device this degenerates to a plain jit.

    Returns ``(forward, put)`` where ``put(clip)`` device-puts a host batch
    with the right sharding (batch size must divide by the mesh size).
    """
    import jax
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import DATA_AXIS, batch_sharding, replicated_sharding

    if mesh is None or mesh.size == 1:
        # variables must be a jit ARGUMENT, not a closure capture: a closed-
        # over param tree is inlined into the HLO as constants — a multi-GB
        # compile payload at flagship scale (on the dev tunnel the remote-
        # compile relay rejects it outright: "HTTP 413: length limit
        # exceeded"; this is what blocked flagship test.py in round 3).
        fwd_fn = jax.jit(
            lambda v, clip: jax.nn.sigmoid(
                model.apply(v, clip, deterministic=True)
            )
        )
        v_dev = jax.device_put(variables)
        return (lambda clip: fwd_fn(v_dev, clip)), jax.device_put

    if example_clip is not None:
        per_dev = example_clip[: example_clip.shape[0] // mesh.size]
        variables = prepare_for_inference(
            model, {"params": variables["params"]}, per_dev
        )
    elif "prepared" in variables:
        # A caller-supplied "prepared" collection was captured at the GLOBAL
        # batch; inside the per-device shard the window count differs, so the
        # batch-tiled shifted-window masks would trip the mbw % tile check at
        # trace time.  Strip it — the fused blocks then compute their operands
        # inline (correct, slower); pass example_clip to re-capture per-device.
        variables = {k: v for k, v in variables.items() if k != "prepared"}

    bsh = batch_sharding(mesh)
    rsh = replicated_sharding(mesh)
    variables = jax.device_put(variables, rsh)

    def per_shard(v, clip):
        return jax.nn.sigmoid(model.apply(v, clip, deterministic=True))

    smapped = jax.shard_map(
        per_shard, mesh=mesh, in_specs=(P(), P(DATA_AXIS)), out_specs=P(DATA_AXIS),
        # pallas_call does not annotate varying-mesh-axes metadata on its
        # outputs; without this the fused kernels fail inside shard_map
        # ("vma on jax.ShapeDtypeStruct must not be None")
        check_vma=False,
    )
    # variables as an argument (see the single-device comment above)
    fwd_fn = jax.jit(smapped)
    return (lambda clip: fwd_fn(variables, clip)), (
        lambda clip: jax.device_put(clip, bsh))


def prepare_for_inference(
    model, variables: Dict[str, Any], example_clip: jnp.ndarray,
) -> Dict[str, Any]:
    """Run one capture forward and return variables with a "prepared" collection.

    ``example_clip`` must have the SERVING batch shape — the tiled shifted-window
    masks depend on the window count per batch.  Returns the full variables dict
    ``{"params": ..., "prepared": ...}`` ready for fast ``model.apply``.
    """
    from ..ops.pallas import swin_block as psb

    if psb.attention_mode() == "off":
        return dict(variables)  # nothing to prepare on the XLA path

    @jax.jit
    def capture(v, clip):
        _, muts = model.apply(v, clip, deterministic=True, mutable=["prepared"])
        return muts

    muts = capture(variables, example_clip)
    out = dict(variables)
    out["prepared"] = muts["prepared"]
    return out
