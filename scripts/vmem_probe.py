#!/usr/bin/env python
"""Empirically find the real per-core VMEM capacity on this chip.

The Mosaic default scoped-VMEM limit is 16MB (xla_tpu_scoped_vmem_limit_kib),
and round-1/2 kernel tiles were budgeted against it.  But v5e hardware carries
128MB of VMEM per core — if `pltpu.CompilerParams(vmem_limit_bytes=...)` can
raise the scoped limit, every fused kernel can use far bigger tiles and keep
C=768 weight sets resident.  This probe compiles a kernel holding an N-MB VMEM
scratch at increasing N and reports the largest that compiles AND runs.
"""

import argparse
import functools
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def build(scratch_mb: int, limit_mb: int):
    rows = scratch_mb * 1024 * 1024 // (4 * 256)  # f32 (rows, 256) scratch

    def kernel(x_ref, o_ref, scr):
        scr[0:8] = x_ref[:] * 2.0
        scr[rows - 8:rows] = x_ref[:] + 2.0
        o_ref[:] = scr[0:8] + scr[rows - 8:rows]

    try:
        params = pltpu.CompilerParams(vmem_limit_bytes=limit_mb * 1024 * 1024)
    except TypeError:
        params = pltpu.TPUCompilerParams(vmem_limit_bytes=limit_mb * 1024 * 1024)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 256), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((rows, 256), jnp.float32)],
        compiler_params=params,
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--sizes", default="14,20,32,48,64,96,110,120")
    args = p.parse_args()
    x = jnp.ones((8, 256), jnp.float32)
    ok = []
    for mb in [int(s) for s in args.sizes.split(",")]:
        try:
            fn = build(mb, mb + 8)
            y = np.asarray(jax.jit(fn)(x))
            assert np.allclose(y, 5.0), y.ravel()[:4]
            ok.append(mb)
            print(f"scratch {mb} MB: OK", flush=True)
        except Exception as e:
            msg = str(e).split("\n")[0][:160]
            print(f"scratch {mb} MB: FAIL ({type(e).__name__}: {msg})", flush=True)
    print(f"largest working scratch: {max(ok) if ok else 0} MB")


if __name__ == "__main__":
    main()
