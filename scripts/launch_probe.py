#!/usr/bin/env python
"""Measure the fixed per-launch cost of (a) an empty-ish pallas kernel and
(b) a trivial XLA elementwise op on this chip, under the fetch+slope harness
(PERF.md "Measurement methodology").

Answers PERF.md's open question: is the ~30 us/launch figure (inferred from the
per-block ablation: ~0.37 ms / ~13 kernels on ~1MB tensors) an axon-tunnel
artifact or the chip's real dispatch floor?  Production v5e launches are
quoted at 2-5 us; if the probe lands near that, the launch-bound conclusions
in PERF.md overstate the fixed cost and fusion work should target HBM traffic
instead.

Method: chain ``x = f(x)`` N times inside ONE jitted program via lax.scan
(device-side launches, no host round-trips), fetch the final scalar, and take
the slope between a short and a long chain.  The scan carries a data dependency
through every iteration so nothing can be elided.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _copy_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...] + 1.0


def make_pallas_step(shape):
    def step(x):
        return pl.pallas_call(
            _copy_kernel,
            out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
        )(x)

    return step


def make_xla_step(shape):
    def step(x):
        # elementwise add: one fusion, ~zero FLOPs at small shapes
        return x + 1.0

    return step


def timed_chain(step, shape, n):
    @jax.jit
    def run(x):
        def body(c, _):
            return step(c), None

        c, _ = jax.lax.scan(body, x, None, length=n)
        return jnp.sum(c)

    x = jnp.zeros(shape, jnp.float32)
    v = float(run(x))  # compile + warm
    assert np.isfinite(v)
    t0 = time.perf_counter()
    v = float(run(x))
    dt = time.perf_counter() - t0
    return dt


def per_launch_us(step, shape, n_short=1000, n_long=21000, reps=3):
    outs = []
    for _ in range(reps):
        ts = timed_chain(step, shape, n_short)
        tl = timed_chain(step, shape, n_long)
        outs.append((tl - ts) / (n_long - n_short) * 1e6)
    return outs


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--rows", type=int, default=8)
    args = p.parse_args()
    print(f"devices: {jax.devices()}")
    for name, mk in (("pallas_copy", make_pallas_step), ("xla_add", make_xla_step)):
        for shape in ((args.rows, 128), (256, 512)):
            us = per_launch_us(mk(shape), shape)
            print(f"{name:12s} shape={shape}: "
                  f"{' '.join(f'{u:7.2f}' for u in us)} us/launch "
                  f"(med {np.median(us):.2f})", flush=True)


if __name__ == "__main__":
    main()
