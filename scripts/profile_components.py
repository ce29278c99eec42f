#!/usr/bin/env python
"""Interleaved per-component timing of the flagship model on the real chip.

Compiles several jitted programs in ONE process and alternates timed chains
between them (see scripts/ab_bench.py for why: run-to-run drift through the
tunnel is ~±8%, interleaved within-run spread is ~±0.3%).  Components:

  full        encoder + decoder (serving defaults)
  encoder     encoder only
  stages-2    encoder with depths (2,2,2,2) — isolates the deep stage-2 stacks
  global-1    encoder with a 1-layer global ViT — isolates the temporal ViT
  cva-window  encoder with the window-CVA variant — isolates deformable CVA
"""

import argparse
import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--rounds", type=int, default=4)
    args = p.parse_args()

    from mumpy_tpu.configs.model_config import multiswin_config
    from mumpy_tpu.models.mumpy import Mumpy
    from mumpy_tpu.models.encoder import MumpyEncoder
    from mumpy_tpu.utils.serving import prepare_for_inference

    rng = np.random.default_rng(0)
    base = multiswin_config()
    clip = jnp.asarray(
        rng.standard_normal((args.batch, 3, base.image_size, base.image_size, 3)),
        jnp.float32,
    )

    def bf16(tree):
        return jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, tree
        )

    progs = {}

    def add_model(name, model, out_index=None):
        params = bf16(jax.jit(model.init)(jax.random.PRNGKey(0), clip[:1]))
        v = prepare_for_inference(model, params, clip.astype(jnp.bfloat16))

        def step(v, clip, carry):
            out = model.apply(v, (clip * (1.0 + carry)).astype(jnp.bfloat16),
                              deterministic=True)
            if out_index is not None:
                out = out[out_index]
            return jnp.mean(out.astype(jnp.float32)) * 1e-6

        jitted = jax.jit(step)
        t0 = time.time()
        jitted(v, clip, jnp.float32(0.0)).block_until_ready()
        print(f"[compile] {name}: {time.time()-t0:.0f}s", flush=True)
        progs[name] = (jitted, v)

    add_model("full", Mumpy(base))
    add_model("encoder", MumpyEncoder(base), out_index=0)
    views2 = tuple(dataclasses.replace(v, depths=(2, 2, 2, 2)) for v in base.views)
    add_model("stages-2", MumpyEncoder(dataclasses.replace(base, views=views2)),
              out_index=0)
    g1 = dataclasses.replace(base, global_encoder=dataclasses.replace(
        base.global_encoder, num_layers=1))
    add_model("global-1", MumpyEncoder(g1), out_index=0)
    add_model("cva-window", MumpyEncoder(dataclasses.replace(base, cva_kind="window")),
              out_index=0)

    def run_chain(name, n):
        jitted, v = progs[name]
        c = jnp.float32(0.0)
        c = jitted(v, clip, c)
        float(c)
        t0 = time.perf_counter()
        for _ in range(n):
            c = jitted(v, clip, c)
        assert np.isfinite(float(c))
        return time.perf_counter() - t0

    names = list(progs)
    for name in names:
        run_chain(name, 2)
    times = {n: [] for n in names}
    for _ in range(args.rounds):
        for name in names:
            times[name].append(run_chain(name, args.iters) / args.iters)
    print("\nper-step ms (per round):")
    meds = {}
    for name in names:
        ts = np.array(times[name]) * 1e3
        meds[name] = np.median(ts)
        print(f"  {name:10s}: {' '.join(f'{t:7.2f}' for t in ts)}  med {np.median(ts):7.2f}")
    print("\nderived (ms):")
    print(f"  decoder            : {meds['full'] - meds['encoder']:7.2f}")
    print(f"  deep plain stacks  : {meds['encoder'] - meds['stages-2']:7.2f}")
    print(f"  global ViT (11 lyr): {meds['encoder'] - meds['global-1']:7.2f}")
    print(f"  deformable-vs-win  : {meds['encoder'] - meds['cva-window']:7.2f}")


if __name__ == "__main__":
    main()
