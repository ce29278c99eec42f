#!/usr/bin/env python
"""Decompose the training-backward cost of the fused whole-block kernel at the
DVI-recipe shapes: fwd kernel alone, full VJP (bwd kernel + XLA dW tail), and
VJP with the dW tail gated off (MUMPY_BWD_NO_DW — timing-only, wrong grads).

All variants trace in ONE process and run interleaved, every chain carries a
scalar data dependency and the final carry is fetched (PERF.md methodology).
Every grad variant reduces dx AND all dW leaves into the carry so XLA cannot
DCE the weight-grad GEMMs.

Dominant train shapes at DVI batch 12 (stream-clips), window 7:
  stage2v3:  r=12*3*4=144, n=49, c=512, heads=16, mlp 4x (16 plain blocks/scan)
  stage2v12: r=12*4=48,    n=49, c=384, heads=12 (views 1+2)
  stage3v3:  r=12*3=36,    n=49, c=1024, heads=32
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

SHAPES = {
    "stage2v3": dict(r=144, n=49, c=512, heads=16, p_w=4),
    "stage2v12": dict(r=48, n=49, c=384, heads=12, p_w=4),
    "stage3v3": dict(r=36, n=49, c=1024, heads=32, p_w=1),
}


def build(shape, dtype=jnp.bfloat16):
    from mumpy_tpu.ops.pallas import swin_block_vjp as sbv

    r, n, c, heads, p_w = (shape[k] for k in ("r", "n", "c", "heads", "p_w"))
    m = 4 * c
    rng = np.random.default_rng(0)
    f = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.05, dtype)
    weights = {
        "ln1s": f(1, c) + 1, "ln1b": f(1, c),
        "wqkv": f(c, 3 * c), "bqkv": f(1, 3 * c),
        "wproj": f(c, c), "bproj": f(1, c),
        "ln2s": f(1, c) + 1, "ln2b": f(1, c),
        "wfc1": f(c, m), "bfc1": f(1, m),
        "wfc2": f(m, c), "bfc2": f(1, c),
    }
    x = f(r, n, c)
    mb = f(p_w, heads, n, n)
    ones = jnp.ones((r, 1), jnp.float32)

    def fwd_loss(x, w):
        y = sbv.fused_block_train(x, mb, w, ones, ones, heads, n, p_w)
        return jnp.sum(y.astype(jnp.float32))

    def jfwd(iters):
        def body(c, _):
            return fwd_loss(x + c * 0, weights) * 1e-6, None

        return jax.jit(lambda: jax.lax.scan(
            body, jnp.float32(0.0), None, length=iters)[0])

    def jgrad(iters):
        g = jax.grad(fwd_loss, argnums=(0, 1))

        def body(c, _):
            dx, dw = g(x + c * 0, weights)
            s = jnp.sum(dx.astype(jnp.float32))
            for v in dw.values():
                s = s + jnp.sum(v.astype(jnp.float32))
            return s * 1e-6, None

        return jax.jit(lambda: jax.lax.scan(
            body, jnp.float32(0.0), None, length=iters)[0])

    return x, weights, jfwd, jgrad


def slope(mk, n_short, n_long, rounds):
    """Device-side chains (data-dependent scan), fetch-once, short/long slope
    so host dispatch and the tunnel round-trip cancel (PERF.md methodology)."""
    fs, fl = mk(n_short), mk(n_long)
    outs = []
    for f in (fs, fl):
        assert np.isfinite(float(f()))  # compile + warm
    for _ in range(rounds):
        t0 = time.perf_counter()
        v = float(fs())
        ts = time.perf_counter() - t0
        t0 = time.perf_counter()
        v = float(fl())
        tl = time.perf_counter() - t0
        assert np.isfinite(v)
        outs.append((tl - ts) / (n_long - n_short))
    return np.median(outs)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--rounds", type=int, default=4)
    p.add_argument("--shapes", default="stage2v3,stage2v12,stage3v3")
    args = p.parse_args()

    ns, nl = 3, 3 + args.iters
    for name in args.shapes.split(","):
        shape = SHAPES[name]
        x, w, jfwd, jgrad = build(shape)
        med = {}
        med["fwd"] = slope(jfwd, ns, nl, args.rounds) * 1e6
        os.environ["MUMPY_BWD_DW"] = "spill"
        med["vjp_spill"] = slope(jgrad, ns, nl, args.rounds) * 1e6
        os.environ["MUMPY_BWD_NO_DW"] = "1"
        med["vjp_nodw"] = slope(jgrad, ns, nl, args.rounds) * 1e6
        os.environ.pop("MUMPY_BWD_NO_DW", None)
        os.environ["MUMPY_BWD_DW"] = "kernel"
        med["vjp_dwk"] = slope(jgrad, ns, nl, args.rounds) * 1e6
        os.environ.pop("MUMPY_BWD_DW", None)
        print(f"{name}: fwd {med['fwd']:7.1f} us | spill {med['vjp_spill']:7.1f} "
              f"({med['vjp_spill']/med['fwd']:.2f}x) | no-dW {med['vjp_nodw']:7.1f}"
              f" (tail {med['vjp_spill']-med['vjp_nodw']:6.1f}) | dw-kernel "
              f"{med['vjp_dwk']:7.1f} ({med['vjp_dwk']/med['fwd']:.2f}x)",
              flush=True)


if __name__ == "__main__":
    main()
