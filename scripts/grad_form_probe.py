#!/usr/bin/env python
"""Probe the backward cost of gather-style ops: scatter-VJP vs exact rewrites.

Two training-path sites whose VJP is a TPU scatter in the naive form:
  perm    shifted-window layout move ``jnp.take(x, perm, axis=1)`` — backward
          is a scatter of the full activation tensor.  Rewrite: custom-VJP
          gather with the inverse permutation (ops/window.py:permutation_take).
  relpos  rel-pos bias ``table[idx]`` (2401 rows -> 169 with collisions) —
          backward is a colliding scatter-add.  Rewrite: constant one-hot
          matmul (models/swin.py:rel_pos_bias).

All variants compile in ONE process and run interleaved (PERF.md methodology:
fetch a data-dependent scalar, slope between short/long chains is implicit in
per-iter medians here since shapes are small).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from mumpy_tpu.ops.window import img_to_window_perm, permutation_take
from mumpy_tpu.models.swin import rel_pos_bias


def timed(fn, args, iters=30, rounds=3):
    # chain a scalar through iterations and fetch it (tunnel-safe timing)
    best = []
    for _ in range(rounds):
        c = jnp.float32(0.0)
        t0 = time.perf_counter()
        for _ in range(iters):
            c = fn(*args) + c * 0
        float(c)
        best.append((time.perf_counter() - t0) / iters)
    return np.median(best) * 1e6  # us


def main():
    rng = np.random.default_rng(0)
    results = {}

    # --- perm-take at the stage-0 view3 shifted-block shape (biggest site):
    # grid (3*56, 56), window 7, c=192; batch 12 (DVI recipe, view3 stream)
    for tag, (gh, gw, c, b) in {
        "stage0v3": (168, 56, 192, 12),
        "stage2v3": (42, 14, 512, 12),
    }.items():
        perm = img_to_window_perm(gh, gw, 7, 3)
        x = jnp.asarray(rng.standard_normal((b, gh * gw, c)), jnp.bfloat16)
        g = jnp.asarray(rng.standard_normal((b, gh * gw, c)), jnp.bfloat16)

        def mk(form):
            if form == "scatter":
                f = lambda x: jnp.sum((jnp.take(x, jnp.asarray(perm), axis=1)
                                       * g).astype(jnp.float32))
            else:
                f = lambda x: jnp.sum((permutation_take(x, perm)
                                       * g).astype(jnp.float32))
            return jax.jit(lambda x: jax.grad(f)(x).astype(jnp.float32).sum())

        fns = {form: mk(form) for form in ("scatter", "invperm")}
        for form, f in fns.items():
            f(x)  # compile
        for form, f in fns.items():
            results[f"perm_{tag}_{form}"] = timed(f, (x,))

    # --- rel-pos bias at window 7, heads 16 (stage-2) — fwd+bwd wrt table
    table = jnp.asarray(rng.standard_normal((169, 16)), jnp.bfloat16)
    gb = jnp.asarray(rng.standard_normal((16, 49, 49)), jnp.bfloat16)

    def mk_bias(form):
        os.environ["MUMPY_RELPOS"] = "gather" if form == "gather" else ""
        f = lambda t: jnp.sum((rel_pos_bias(t, 7, 7) * gb).astype(jnp.float32))
        jitted = jax.jit(lambda t: jax.grad(f)(t).astype(jnp.float32).sum())
        jitted(table)  # trace+compile under this env
        os.environ["MUMPY_RELPOS"] = ""
        return jitted

    bias_fns = {form: mk_bias(form) for form in ("gather", "onehot")}
    for form, f in bias_fns.items():
        results[f"relpos_{form}"] = timed(f, (table,))

    print("\nper-call fwd+bwd us (interleaved medians):")
    for k, v in results.items():
        print(f"  {k:28s} {v:9.1f}")


if __name__ == "__main__":
    main()
