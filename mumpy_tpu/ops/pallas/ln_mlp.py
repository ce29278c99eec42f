"""Fused LayerNorm + MLP + residual Pallas kernel (TPU).

Computes ``x + fc2(gelu(fc1(LN(x))))`` — the tail of every transformer block —
in one launch over 2D rows.  Used where the whole-block kernel does not apply:
the CrossSwinBlock tail (its attention half is interleaved with cross-view
attention) and the global temporal ViT's MLP half (C=768: the full-block weight
set is HBM-bound per tile, but the MLP alone fits VMEM).

Same Mosaic constraints as :mod:`.swin_block`: polynomial erf for gelu, row
tiles multiple of 8, f32 intermediates chunk-bounded by the tile choice.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False

from .swin_block import _erf, _ln, attention_mode, kernel_compiler_params, vmem_limit_bytes  # shared helpers + switch


def supported(c: int, m: int, itemsize: int = 2) -> bool:
    """fc1+fc2 weights plus the f32 row-tile temporaries must fit VMEM."""
    if not _PALLAS_OK:
        return False
    weights = itemsize * 2 * c * m
    return weights < 0.45 * vmem_limit_bytes()


def _kernel(x_ref, lns_ref, lnb_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref):
    x = x_ref[:]
    dtype = x.dtype
    h = _ln(
        x.astype(jnp.float32), lns_ref[:].astype(jnp.float32),
        lnb_ref[:].astype(jnp.float32),
    ).astype(dtype)
    f1 = jax.lax.dot_general(
        h, w1_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) + b1_ref[:].astype(jnp.float32)
    g = (0.5 * f1 * (1.0 + _erf(f1 * 0.7071067811865476))).astype(dtype)
    f2 = jax.lax.dot_general(
        g, w2_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) + b2_ref[:].astype(jnp.float32)
    out_ref[:] = x + f2.astype(dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_ln_mlp(x, ln_scale, ln_bias, w1, b1, w2, b2, interpret: bool = False):
    """x: (..., C) -> x + fc2(gelu(fc1(LN(x)))), fused.

    Leading dims are flattened to rows; rows are padded to a tile multiple and
    the padding is sliced off (padded rows compute garbage that is discarded).
    """
    shape = x.shape
    c = shape[-1]
    m = w1.shape[1]
    rows = int(np.prod(shape[:-1]))
    x2 = x.reshape(rows, c)

    # row tile: bound the (tile, M) f32 gelu temporaries to ~2MB
    tile = max(8, min(512, (2_000_000 // (4 * m)) // 8 * 8))
    rpad = -(-rows // tile) * tile
    if rpad != rows:
        x2 = jnp.pad(x2, ((0, rpad - rows), (0, 0)))

    args = [ln_scale.reshape(1, c), ln_bias.reshape(1, c),
            w1, b1.reshape(1, m), w2, b2.reshape(1, c)]
    full = lambda a: pl.BlockSpec(
        a.shape, lambda i, nd=a.ndim: (0,) * nd, memory_space=pltpu.VMEM)

    cost = pl.CostEstimate(
        flops=4 * rows * c * m,
        bytes_accessed=2 * rows * c * x.dtype.itemsize
        + (rpad // tile) * 2 * c * m * w1.dtype.itemsize,
        transcendentals=rows * m,
    )
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((rpad, c), x.dtype),
        grid=(rpad // tile,),
        in_specs=[pl.BlockSpec((tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM)]
        + [full(a) for a in args],
        out_specs=pl.BlockSpec((tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        cost_estimate=cost,
        interpret=interpret,
        compiler_params=kernel_compiler_params(),
    )(x2, *args)
    return out[:rows].reshape(shape)
