#!/usr/bin/env python
"""Capture a device trace of the flagship DVI-recipe train step.

Usage:
  PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
    python scripts/train_trace.py [--logdir /tmp/ttrace] [--batch 12]
  PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
    python scripts/trace_report.py /tmp/ttrace

The report attributes device time to jax name scopes, splitting forward
(scope as-is) from backward (XLA tags bwd HLOs with transpose/grad module
scopes), which is how PERF.md's training breakdown was produced.
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
    p.add_argument("--batch", type=int, default=12)
    p.add_argument("--logdir", default="/tmp/ttrace")
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--remat", default="full",
                   help="full|dots|none (none+MUMPY_FUSED_TRAIN=compiled is "
                        "the measured-best DVI config, see PERF.md)")
    args = p.parse_args()

    from mumpy_tpu.configs.model_config import multiswin_config
    from mumpy_tpu.train.optim import OptimConfig
    from mumpy_tpu.train.trainer import create_train_state, make_jitted_steps

    rng = np.random.default_rng(0)
    batch = {
        "image": rng.standard_normal(
            (args.batch, 3, 224, 224, 3)).astype(np.float32),
        "mask": (rng.uniform(size=(args.batch, 224 * 224)) > 0.9).astype(
            np.float32),
    }
    batch = jax.tree_util.tree_map(jnp.asarray, batch)

    import dataclasses
    cfg = multiswin_config()
    if args.remat == "none":
        cfg = dataclasses.replace(cfg, remat=False)
    else:
        cfg = dataclasses.replace(cfg, remat_policy=args.remat)
    state = create_train_state(
        cfg, OptimConfig(), iter_max=1000, rng=jax.random.PRNGKey(0))
    _, jtrain, _ = make_jitted_steps(mesh=None, compute_dtype=jnp.bfloat16)

    key = jax.random.PRNGKey(1)
    t0 = time.time()
    for i in range(2):  # compile + warm
        state, m = jtrain(state, batch, jax.random.fold_in(key, i))
    print(f"[compile+warm] {time.time()-t0:.0f}s total={float(m['total']):.4f}",
          flush=True)

    with jax.profiler.trace(args.logdir):
        for i in range(args.steps):
            state, m = jtrain(state, batch, jax.random.fold_in(key, 100 + i))
        float(m["total"])  # host fetch inside the trace window
    print(f"trace written to {args.logdir}", flush=True)


if __name__ == "__main__":
    main()
