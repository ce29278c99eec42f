#!/usr/bin/env python
"""Interleaved serving-batch scaling measurement (frames/s vs batch)."""

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
    p.add_argument("--batches", default="4,8,16,32")
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--rounds", type=int, default=4)
    args = p.parse_args()

    from mumpy_tpu.configs.model_config import multiswin_config
    from mumpy_tpu.models.mumpy import Mumpy
    from mumpy_tpu.utils.serving import prepare_for_inference

    cfg = multiswin_config()
    model = Mumpy(cfg)
    rng = np.random.default_rng(0)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 3, cfg.image_size, cfg.image_size, 3), jnp.float32),
    )
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, params
    )

    progs = {}
    for b in [int(x) for x in args.batches.split(",")]:
        clip = jnp.asarray(
            rng.standard_normal((b, 3, cfg.image_size, cfg.image_size, 3)),
            jnp.float32,
        )
        v = prepare_for_inference(model, params, clip.astype(jnp.bfloat16))

        def step(v, clip, carry):
            out = model.apply(v, (clip * (1.0 + carry)).astype(jnp.bfloat16),
                              deterministic=True)
            return jnp.mean(out.astype(jnp.float32)) * 1e-6

        jitted = jax.jit(step)
        t0 = time.time()
        jitted(v, clip, jnp.float32(0.0)).block_until_ready()
        print(f"[compile] batch {b}: {time.time()-t0:.0f}s", flush=True)
        progs[b] = (jitted, v, clip)

    def run_chain(b, n):
        jitted, v, clip = progs[b]
        c = jnp.float32(0.0)
        c = jitted(v, clip, c)
        float(c)
        t0 = time.perf_counter()
        for _ in range(n):
            c = jitted(v, clip, c)
        assert np.isfinite(float(c))
        return time.perf_counter() - t0

    bs = list(progs)
    for b in bs:
        run_chain(b, 2)
    times = {b: [] for b in bs}
    for _ in range(args.rounds):
        for b in bs:
            times[b].append(run_chain(b, args.iters) / args.iters)
    print("\nbatch scaling:")
    for b in bs:
        ts = np.array(times[b])
        fps = b / ts
        print(f"  batch {b:3d}: {np.median(ts)*1e3:7.2f} ms/step"
              f"  -> {np.median(fps):7.1f} frames/s")


if __name__ == "__main__":
    main()
