"""Custom-VJP fused LayerNorm + MLP + residual kernel (TPU, training path).

Training counterpart of :mod:`.ln_mlp` for block tails whose attention half
cannot share a whole-block kernel — the CrossSwinBlock (cross-view attention
interleaves between the halves, reference ``multiTemporalViewEncoder.py:
142-291``) and the global temporal ViT MLP half.  The round-2 DVI train trace
showed the cross blocks' XLA fwd+bwd dominated by copy/fusion launches
(``scripts/trace_report.py``), the same launch-overhead wall the whole-block
train kernel already removed from the scanned plain stacks.

Forward (one launch over row tiles):

    out = x + keep * fc2(gelu(fc1(LN(x))))

with ``keep`` a per-row stochastic-depth factor (0 or 1/(1-p) — drop_path is
the only active stochastic regularizer in the flagship recipe; elementwise
dropout rates must be 0, see :func:`train_supported`).

Backward: ONE kernel recomputes the forward from ``x`` per tile (recompute-
from-input — memory behaves like full remat) and produces ``dx`` in-kernel
while spilling ``h`` (the post-LN rows) for the weight-gradient GEMMs, which
are large MXU-friendly XLA matmuls (same split as
:mod:`.swin_block_vjp`).

Rows are 2D ``(R, C)`` — the MLP is pointwise over tokens, so callers flatten
whatever token layout they hold; ``keep`` is ``(R, 1)`` f32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False

from .swin_block import _erf, kernel_compiler_params, vmem_limit_bytes
from .swin_block_vjp import _gelu_and_grad, _ln_bwd, _ln_stats

_SQRT1_2 = 0.7071067811865476


def train_supported(c: int, m: int, itemsize: int, drop: float) -> bool:
    """fc weights must fit VMEM; elementwise dropout must be inactive."""
    if not _PALLAS_OK or drop != 0.0:
        return False
    return itemsize * 2 * c * m < 0.40 * vmem_limit_bytes()


def _row_tile(rows: int, m: int, *, bwd: bool = False) -> int:
    """Largest 8-multiple tile dividing ``rows`` that bounds the (tile, M)
    f32 gelu/grad temporaries (~2MB fwd, ~1MB bwd — the bwd carries ~2x the
    live f32 temporaries)."""
    cap = (1_000_000 if bwd else 2_000_000) // (4 * m)
    tile = max(8, min(512, cap // 8 * 8))
    while rows % tile:
        tile -= 8
        if tile < 8:
            raise ValueError(f"rows {rows} not a multiple of 8")
    return tile


def _fwd_kernel(x_ref, k_ref, lns_ref, lnb_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                out_ref):
    x = x_ref[:]
    dtype = x.dtype
    xh, _ = _ln_stats(x.astype(jnp.float32))
    h = (xh * lns_ref[:].astype(jnp.float32)
         + lnb_ref[:].astype(jnp.float32)).astype(dtype)
    f1 = jax.lax.dot_general(
        h, w1_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) + b1_ref[:].astype(jnp.float32)
    g = (0.5 * f1 * (1.0 + _erf(f1 * _SQRT1_2))).astype(dtype)
    f2 = jax.lax.dot_general(
        g, w2_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) + b2_ref[:].astype(jnp.float32)
    out_ref[:] = x + (k_ref[:].astype(jnp.float32) * f2).astype(dtype)


def _bwd_kernel(x_ref, dy_ref, k_ref, lns_ref, lnb_ref, w1_ref, b1_ref,
                w2_ref, b2_ref, dx_ref, h_ref):
    """Recompute from x, produce dx; spill h for the XLA weight-grad GEMMs."""
    x = x_ref[:]
    dtype = x.dtype
    xh, rstd = _ln_stats(x.astype(jnp.float32))
    s = lns_ref[:].astype(jnp.float32)
    h = (xh * s + lnb_ref[:].astype(jnp.float32)).astype(dtype)
    h_ref[:] = h
    f1 = jax.lax.dot_general(
        h, w1_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) + b1_ref[:].astype(jnp.float32)
    _, dgelu = _gelu_and_grad(f1)
    df2 = (k_ref[:].astype(jnp.float32) * dy_ref[:].astype(jnp.float32)
           ).astype(dtype)
    dg = jax.lax.dot_general(
        df2, w2_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    df1 = (dg * dgelu).astype(dtype)
    dh = jax.lax.dot_general(
        df1, w1_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dx_ref[:] = (dy_ref[:].astype(jnp.float32)
                 + _ln_bwd(dh, xh, rstd, s)).astype(dtype)


_W_NAMES = ("lns", "lnb", "wfc1", "bfc1", "wfc2", "bfc2")


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_ln_mlp_train(x, weights, keep, interpret=False):
    """Differentiable ``x + keep * fc2(gelu(fc1(LN(x))))`` on 2D rows.

    x: (R, C) rows (R a multiple of 8); weights: dict with the 6 `_W_NAMES`
    entries (2D, biases (1, d)); keep: (R, 1) f32 stochastic-depth factors.
    """
    y, _ = _fwd(x, weights, keep, interpret)
    return y


def _call(kernel, x, keep, wl, outs, tile, interpret, extra=()):
    rows, c = x.shape
    m = wl[2].shape[1]
    full = lambda a: pl.BlockSpec(
        a.shape, lambda i, nd=a.ndim: (0,) * nd, memory_space=pltpu.VMEM)
    row2 = pl.BlockSpec((tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
    k_spec = pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    n_out = len(outs)
    cost = pl.CostEstimate(
        flops=(3 if n_out > 1 else 1) * 4 * rows * c * m,
        bytes_accessed=(2 + n_out) * rows * c * x.dtype.itemsize
        + (rows // tile) * 2 * c * m * wl[2].dtype.itemsize,
        transcendentals=(2 if n_out > 1 else 1) * rows * m,
    )
    in_specs = [row2] + [row2 for _ in extra] + [k_spec] + [full(a) for a in wl]
    res = pl.pallas_call(
        kernel,
        out_shape=tuple(jax.ShapeDtypeStruct((rows, c), x.dtype) for _ in outs),
        grid=(rows // tile,),
        in_specs=in_specs,
        out_specs=tuple(row2 for _ in outs),
        cost_estimate=cost,
        interpret=interpret,
        compiler_params=kernel_compiler_params(),
    )(x, *extra, keep, *wl)
    return res


def _pad_rows(a, pad):
    return jnp.pad(a, ((0, pad), (0, 0))) if pad else a


def _fwd(x, weights, keep, interpret):
    rows0, c = x.shape
    pad = (-rows0) % 8  # e.g. the ViT tail's B*49*3 rows are not 8-multiples
    rows = rows0 + pad
    m = weights["wfc1"].shape[1]
    tile = _row_tile(rows, m)
    wl = [weights[k] for k in _W_NAMES]
    (y,) = _call(_fwd_kernel, _pad_rows(x, pad), _pad_rows(keep, pad), wl,
                 ("y",), tile, interpret)
    return y[:rows0], (x, weights, keep)


def _bwd(interpret, res, dy):
    x, weights, keep = res
    rows0, c = x.shape
    pad = (-rows0) % 8
    rows = rows0 + pad
    m = weights["wfc1"].shape[1]
    tile = _row_tile(rows, m, bwd=True)
    wl = [weights[k] for k in _W_NAMES]
    dy = _pad_rows(dy, pad)
    keep = _pad_rows(keep, pad)
    dx, h = _call(_bwd_kernel, _pad_rows(x, pad), keep, wl, ("dx", "h"), tile,
                  interpret, extra=(dy,))

    # ---- weight grads: big MXU GEMMs in XLA over the spilled rows ----
    f32 = jnp.float32
    wdtype = weights["wfc1"].dtype
    hf = h.astype(f32)
    f1 = hf @ weights["wfc1"].astype(f32) + weights["bfc1"].astype(f32)
    g, dgelu = _gelu_and_grad(f1)
    df2 = keep.astype(f32) * dy.astype(f32)
    dg = df2 @ weights["wfc2"].astype(f32).T
    df1 = dg * dgelu
    mm = lambda a, b: jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=f32)
    dW = {
        "wfc1": mm(hf, df1).astype(wdtype),
        "bfc1": jnp.sum(df1, axis=0, keepdims=True).astype(wdtype),
        "wfc2": mm(g, df2).astype(wdtype),
        "bfc2": jnp.sum(df2, axis=0, keepdims=True).astype(wdtype),
    }
    s = weights["lns"].astype(f32)
    xh = (hf - weights["lnb"].astype(f32)) / s
    dh = df1 @ weights["wfc1"].astype(f32).T
    dW["lns"] = jnp.sum(dh * xh, axis=0, keepdims=True).astype(wdtype)
    dW["lnb"] = jnp.sum(dh, axis=0, keepdims=True).astype(wdtype)
    return (dx[:rows0], dW, jnp.zeros_like(res[2]))


fused_ln_mlp_train.defvjp(_fwd, _bwd)


def xla_ln_mlp_reference(x, weights, keep):
    """Pure-XLA forward with identical math, for parity tests."""
    f32 = jnp.float32
    xh, _ = _ln_stats(x.astype(f32))
    h = xh * weights["lns"].astype(f32) + weights["lnb"].astype(f32)
    f1 = h @ weights["wfc1"].astype(f32) + weights["bfc1"].astype(f32)
    g, _ = _gelu_and_grad(f1)
    f2 = g @ weights["wfc2"].astype(f32) + weights["bfc2"].astype(f32)
    return (x.astype(f32) + keep.astype(f32) * f2).astype(x.dtype)
