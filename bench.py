#!/usr/bin/env python
"""Benchmark: localization frames/sec on one TPU chip (flagship 224^2 model).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Methodology: a scalar data dependency is chained through the iterations (each
step's input is perturbed by the previous step's output) and the final carry is
FETCHED to the host, which forces the entire chain to execute.  Weaker syncs
report fantasy numbers through the remote-TPU tunnel: `block_until_ready` on an
un-fetched buffer resolves without proving execution (a known-size 8192^3 matmul
"ran" at 130x chip peak under it; with the fetch it lands at 189 TFLOP/s, i.e.
~96% of v5e bf16 peak, validating this harness).  Throughput is taken as the
slope between a short and a long chain so the one-time round-trip cancels.

Baseline note: the reference repo publishes no throughput numbers (BASELINE.md).
``vs_baseline`` therefore compares against ONE documented analytic estimate of
the PyTorch reference on its published rig (RTX 3090 Ti), fixed in
``REF_FPS`` below and derived in BASELINE.md ("Reference throughput estimate"):
174.3 GFLOP/clip (XLA post-optimization cost analysis of the architecture-
identical forward, batch-1 f32; FMA = 2 flops) against 35.6 TFLOP/s fp32 peak
at 40% sustained utilization — generous for research-grade eager PyTorch.
PERF.md round-1 quoted ~163 f/s for the same rig; that number treated the
cost-analysis flops as MACs (a 2x convention slip) and is superseded.
"""

import argparse
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

# The one documented reference-throughput estimate (see module docstring and
# BASELINE.md).  174.3 GFLOP/clip measured once via
#   jax.jit(forward).lower(...).compile().cost_analysis()["flops"]
# on the flagship 224^2 model, batch 1, f32, pure-XLA path (pallas custom calls
# hide flops from the cost analysis, so the XLA lowering is the honest count).
REF_CLIP_FLOPS = 174.3e9
REF_GPU_SUSTAINED_FLOPS = 35.6e12 * 0.40  # RTX 3090 Ti fp32 peak x 40% util
REF_FPS = REF_GPU_SUSTAINED_FLOPS / REF_CLIP_FLOPS  # ~81.7 frames/s


def main():
    p = argparse.ArgumentParser()
    # serving batch 32 measured best on v5e with the full-width kernels
    # (scripts/batch_scaling.py: 8/16/32 -> 247/252/259 frames/s)
    p.add_argument("--batch", type=int, default=32)
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
    params = jax.jit(model.init)(jax.random.PRNGKey(0), clip[:1])

    if dtype == jnp.bfloat16:
        params = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, params
        )

    # serving mode: capture kernel-ready fused-block operands once
    from mumpy_tpu.utils.serving import prepare_for_inference

    params = prepare_for_inference(model, params, clip.astype(dtype))

    @jax.jit
    def step(params, clip, carry):
        """One forward whose input depends on the previous step's output."""
        out = model.apply(
            params, (clip * (1.0 + carry)).astype(dtype), deterministic=True
        )
        probs = jax.nn.sigmoid(out.astype(jnp.float32))
        return jnp.mean(probs) * 1e-6  # scalar carry -> serial dependency

    # compile
    carry = jnp.float32(0.0)
    step.lower(params, clip, carry).compile()

    def run_chain(n):
        c = jnp.float32(0.0)
        c = step(params, clip, c)
        float(c)  # warm fetch
        t0 = time.perf_counter()
        for _ in range(n):
            c = step(params, clip, c)
        v = float(c)  # force the whole chain to execute
        assert np.isfinite(v)
        return time.perf_counter() - t0

    run_chain(args.warmup)
    n_short = max(2, args.iters // 4)
    t_short = run_chain(n_short)
    t_long = run_chain(args.iters)
    dt_per_iter = (t_long - t_short) / (args.iters - n_short)

    fps = args.batch / dt_per_iter  # one localized center-frame per clip

    print(json.dumps({
        "metric": "localization_frames_per_sec_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / REF_FPS, 2),
    }))


if __name__ == "__main__":
    main()
