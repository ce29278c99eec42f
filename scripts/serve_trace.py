#!/usr/bin/env python
"""Capture a device trace of the flagship serving forward (bench.py config).

Usage:
  PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
    python scripts/serve_trace.py [--logdir /tmp/strace] [--batch 32]
  PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
    python scripts/trace_report.py /tmp/strace
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--logdir", default="/tmp/strace")
    p.add_argument("--steps", type=int, default=4)
    args = p.parse_args()

    from mumpy_tpu.configs.model_config import multiswin_config
    from mumpy_tpu.models.mumpy import Mumpy
    from mumpy_tpu.utils.serving import prepare_for_inference

    cfg = multiswin_config()
    model = Mumpy(cfg)
    rng = np.random.default_rng(0)
    clip = jnp.asarray(
        rng.standard_normal((args.batch, 3, cfg.image_size, cfg.image_size, 3)),
        jnp.float32,
    )
    params = jax.jit(model.init)(jax.random.PRNGKey(0), clip[:1])
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params)
    params = prepare_for_inference(model, params, clip.astype(jnp.bfloat16))

    @jax.jit
    def step(params, clip, carry):
        out = model.apply(
            params, (clip * (1.0 + carry)).astype(jnp.bfloat16),
            deterministic=True)
        return jnp.mean(jax.nn.sigmoid(out.astype(jnp.float32))) * 1e-6

    t0 = time.time()
    carry = jnp.float32(0.0)
    carry = step(params, clip, carry)
    print(f"[compile+warm] {time.time()-t0:.0f}s carry={float(carry):.3g}",
          flush=True)

    with jax.profiler.trace(args.logdir):
        for _ in range(args.steps):
            carry = step(params, clip, carry)
        float(carry)
    print(f"trace written to {args.logdir}", flush=True)


if __name__ == "__main__":
    main()
