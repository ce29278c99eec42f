#!/usr/bin/env python
"""Benchmark: localization frames/sec on one TPU chip (flagship 224^2 model).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline note: the reference repo publishes no throughput numbers (BASELINE.md).
``vs_baseline`` therefore compares against an analytic estimate of the PyTorch
reference on its published rig (RTX 3090 Ti): forward FLOPs are taken from XLA's
cost analysis of our (architecture-identical) forward, and the 3090 Ti is credited
35.6 TFLOP/s fp32 peak at 40% sustained utilization — generous for research-grade
eager PyTorch.  The BASELINE.json north-star target is vs_baseline > 10.
"""

import argparse
import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    args = p.parse_args()

    from mumpy_tpu.configs.model_config import multiswin_config
    from mumpy_tpu.models.mumpy import Mumpy

    cfg = multiswin_config()
    model = Mumpy(cfg)
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32

    rng = np.random.default_rng(0)
    clip = jnp.asarray(
        rng.standard_normal((args.batch, 3, cfg.image_size, cfg.image_size, 3)),
        dtype=jnp.float32,
    )
    params = model.init(jax.random.PRNGKey(0), clip[:1])

    if dtype == jnp.bfloat16:
        params = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, params
        )

    @jax.jit
    def forward(params, clip):
        out = model.apply(params, clip.astype(dtype), deterministic=True)
        return jax.nn.sigmoid(out.astype(jnp.float32))

    # compile + flops estimate
    lowered = forward.lower(params, clip)
    compiled = lowered.compile()
    cost = compiled.cost_analysis() or {}
    flops = float(cost.get("flops", 0.0))

    out = forward(params, clip)
    jax.block_until_ready(out)
    for _ in range(args.warmup):
        jax.block_until_ready(forward(params, clip))

    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = forward(params, clip)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    frames = args.batch * args.iters  # one localized center-frame per clip
    fps = frames / dt

    # analytic reference estimate (see module docstring)
    flops_per_clip = flops / args.batch if flops else 0.0
    ref_fps = (35.6e12 * 0.40 / flops_per_clip) if flops_per_clip else 30.0
    print(json.dumps({
        "metric": "localization_frames_per_sec_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / ref_fps, 2),
    }))


if __name__ == "__main__":
    main()
