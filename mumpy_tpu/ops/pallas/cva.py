"""Fused deformable cross-view attention (CVA) kernel: sampling + attention.

TPU-native split of ``SwinDAttention`` (reference
``models/modules/deformableAttention.py:218-405``):

* The OFFSET branch (grouped depthwise 5x5 conv -> LN -> gelu -> 1x1 proj ->
  tanh bound, ``:331-345``) runs in XLA *outside* the kernel — it is
  conv-shaped work XLA compiles well.  An in-kernel tap-roll formulation was
  VPU-bound (25 rolls x 3 groups over every window = 4.2 ms for the stage-0
  instance alone in the device trace).
* The kernel consumes absolute per-group sample coordinates and executes, in
  one launch per window tile:

      sampled_g = bilinear(x2_g, coords_g)            # matmul-form sampling
      k, v      = proj_k(sampled), proj_v(sampled)    # full-width matmuls
      out       = proj(softmax(q k^T * scale) v)      # per-head via scratch

Mosaic-shaped decisions (see ops/pallas/swin_block.py for the full rationale):
channel splits (groups g, heads h) never slice lanes of values — q/k/v/proj run
FULL-WIDTH through VMEM scratch and per-group/per-head access is lane-sliced
ref loads.  Bilinear sampling builds (T, N, N) matrices from per-axis weights
via static one-hot expanders, keeping the gather on the MXU
(zero-padding semantics match ops/grid_sample.py).  The ``ratio`` query tiling
(``:330``) is index-map arithmetic (the copies are identical) and the output
fold (``:394-399``) accumulates in VMEM across the minor grid dim; only the
proj_out bias stays outside (the reference folds BEFORE the bias, so
sum-then-bias != bias-then-sum).
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

from .swin_block import _choose_tile, attention_mode, kernel_compiler_params, vmem_limit_bytes  # shared helpers


def supported(c: int, n: int, itemsize: int = 2) -> bool:
    """q/k/v/proj weights (4C^2) must fit VMEM next to the row tiles."""
    if not _PALLAS_OK:
        return False
    return itemsize * 4 * c * c < 0.45 * vmem_limit_bytes() and n <= 64


@functools.lru_cache(maxsize=None)
def _axis_expanders(ws: int, npad: int):
    """(Ey, Ex): (ws, npad) one-hots with Ey[j, q] = (q // ws == j),
    Ex[j, q] = (q %% ws == j) for q < ws*ws."""
    ey = np.zeros((ws, npad), np.float32)
    ex = np.zeros((ws, npad), np.float32)
    for q in range(ws * ws):
        ey[q // ws, q] = 1.0
        ex[q % ws, q] = 1.0
    return ey, ex


def _axis_weights(coord, ws: int):
    """(T, N) absolute coords -> (T, N, ws) bilinear weights, zero outside
    (torch ``padding_mode='zeros'``; matches ops/grid_sample.py)."""
    # Mosaic iota must be integer-typed
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, 1, ws), 2).astype(jnp.float32)
    i0 = jnp.floor(coord)
    frac = (coord - i0)[..., None]
    d0 = idx - i0[..., None]
    return jnp.where(d0 == 0, 1.0 - frac, jnp.where(d0 == 1, frac, 0.0))


def _cva_kernel(
    x1_ref, x2_ref, gy_ref, gx_ref,
    wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref, wproj_ref,
    ey_ref, ex_ref,
    out_ref, q_scr, s_scr, k_scr, v_scr, o_scr, sc_scr,
    *, groups, heads, n_valid, ws, scale, ratio,
):
    tile, npad, c = x1_ref.shape
    gc = c // groups
    hd = c // heads
    x1 = x1_ref[:]
    dtype = x1.dtype
    x1_2d = x1.reshape(tile * npad, c)

    # full-width q projection; 3D scratches make every per-head/per-group
    # access a pure lane-sliced REF load/store (see swin_block._block_kernel —
    # measured ~9% kernel win vs the 2D layout)
    q_scr[:] = (jax.lax.dot_general(
        x1_2d, wq_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bq_ref[:].astype(jnp.float32)).astype(dtype).reshape(tile, npad, c)

    # ---- per-group bilinear sampling of the partner at the given coords ----
    # x2 arrives FULL-WIDTH (tile, npad, c); each group is a lane-sliced REF
    # load (gc is a multiple of 32) — the caller-side (g, R, N, gc) transpose
    # this replaces was ~0.7 ms/step of the batch-32 trace at stage 0.
    for g in range(groups):
        wy = _axis_weights(gy_ref[g].astype(jnp.float32), ws)  # (tile, npad, ws)
        wx = _axis_weights(gx_ref[g].astype(jnp.float32), ws)
        wmat = jax.lax.dot_general(
            wy.astype(dtype), ey_ref[:].astype(dtype),
            (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        ) * jax.lax.dot_general(
            wx.astype(dtype), ex_ref[:].astype(dtype),
            (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )  # (tile, npad_q, npad_src)
        s_scr[:, :, g * gc:(g + 1) * gc] = jax.lax.dot_general(
            wmat.astype(dtype), x2_ref[:, :, g * gc:(g + 1) * gc],
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(dtype)

    # full-width k/v projections of the sampled partner
    s_2d = s_scr[:].reshape(tile * npad, c)
    k_scr[:] = (jax.lax.dot_general(
        s_2d, wk_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bk_ref[:].astype(jnp.float32)).astype(dtype).reshape(tile, npad, c)
    v_scr[:] = (jax.lax.dot_general(
        s_2d, wv_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bv_ref[:].astype(jnp.float32)).astype(dtype).reshape(tile, npad, c)

    # ---- per-head attention (hoisted all-head softmax — one masked softmax
    # over the (heads*tile, npad, npad) scores scratch; per-head softmaxes are
    # VPU-dispatch overhead, see swin_block._hoisted_scores: -22% kernel),
    # then one full-width output projection ----
    # key-pad masking folds into the score STORE (one fused add per head on a
    # (1, npad) row constant) instead of a separate full masked-where pass
    # over the (heads*tile, npad, npad) scratch (see swin_block
    # ._hoisted_scores for the measurement).
    kmask = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (1, npad), 1) < n_valid, 0.0, -1e30)
    for hh in range(heads):
        q3 = q_scr[:, :, hh * hd:(hh + 1) * hd]
        k3 = k_scr[:, :, hh * hd:(hh + 1) * hd]
        sc_scr[hh * tile:(hh + 1) * tile] = jax.lax.dot_general(
            q3, k3, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale + kmask[None]
    sall = sc_scr[:]
    m = jnp.max(sall, axis=-1, keepdims=True)
    e = jnp.exp(sall - m)
    sc_scr[:] = e / jnp.sum(e, axis=-1, keepdims=True)
    for hh in range(heads):
        v3 = v_scr[:, :, hh * hd:(hh + 1) * hd]
        p = sc_scr[hh * tile:(hh + 1) * tile].astype(dtype)
        o_scr[:, :, hh * hd:(hh + 1) * hd] = jax.lax.dot_general(
            p, v3, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(dtype)
    proj = jax.lax.dot_general(
        o_scr[:].reshape(tile * npad, c), wproj_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dtype).reshape(tile, npad, c)
    # proj_out BIAS is applied by the caller AFTER the ratio fold — the
    # reference projects the folded sum (``deformableAttention.py:394-399``),
    # and sum-then-bias != bias-then-sum when ratio > 1.
    # The RATIO FOLD itself happens HERE: the reference's ``(b t)`` rearrange
    # groups ``ratio`` CONSECUTIVE pre-fold rows (``:394-395`` — j-major, a
    # faithful quirk: j%b1-indexed queries make the groups mix queries), so
    # the fold is a leading-dim segmented sum within the tile and the out
    # block is ``tile//ratio`` rows — the ratio-times-larger pre-fold tensor
    # is never materialized in HBM.
    if ratio == 1:
        out_ref[:] = proj
    else:
        out_ref[:] = proj.reshape(tile // ratio, ratio, npad, c).sum(axis=1)


def prepare_cva_weights(weights, *, groups: int, heads: int, ws: int):
    """Kernel-ready operand dict from ``SwinDAttention`` flax params
    (proj_q/proj_k/proj_v/proj_out Dense kernels (C, C) + biases)."""
    wq = weights["proj_q_kernel"]
    c = wq.shape[0]
    npad = -(-ws * ws // 8) * 8
    wdtype = wq.dtype
    ey, ex = _axis_expanders(ws, npad)
    return {
        "wq": wq, "bq": weights["proj_q_bias"].reshape(1, c),
        "wk": weights["proj_k_kernel"], "bk": weights["proj_k_bias"].reshape(1, c),
        "wv": weights["proj_v_kernel"], "bv": weights["proj_v_bias"].reshape(1, c),
        "wproj": weights["proj_out_kernel"],
        "bproj": weights["proj_out_bias"].reshape(1, c),  # applied post-fold
        "ey": jnp.asarray(ey, wdtype), "ex": jnp.asarray(ex, wdtype),
    }


_WL_ORDER = ("wq", "bq", "wk", "bk", "wv", "bv", "wproj", "ey", "ex")


@functools.partial(jax.jit,
                   static_argnames=("groups", "heads", "ws", "ratio", "interpret"))
def fused_cva_prepared(x1, x2, gy, gx, prepared, *, groups: int, heads: int,
                       ws: int, ratio: int = 1, interpret: bool = False):
    """x1: (B1, N, C) UNTILED query windows; x2: (ratio*B1, N, C) full-width
    partner windows (row ``j`` pairs with query ``j % B1`` — ``jnp.tile``
    order, tiled here); gy/gx: (g, B1, N) absolute sample coordinates
    (pixels, can be fractional/out-of-range — zeros padding).  Returns the
    ratio-FOLDED attention output (B1, N, C) WITHOUT the output-projection
    bias.

    x2 arrives FULL-WIDTH (per-group access is a lane slice in the kernel —
    replaces a ~0.7 ms/step caller-side (g, R, N, gc) transpose), and the
    reference's j-major ``(b t)`` fold (``deformableAttention.py:394-395``:
    ``ratio`` CONSECUTIVE pre-fold rows sum into one output row) runs as a
    segmented sum INSIDE the tile, so the ratio-times-larger pre-fold tensor
    never exists in HBM.  The query/coord tiling itself stays outside (pad
    then ``jnp.tile`` — one fused XLA copy): a modulo block map can't express
    it because the j%B1 wrap is not tile-aligned when ratio ∤ B1."""
    b1, n, c = x1.shape
    r = ratio * b1
    hd = c // heads
    scale = hd**-0.5
    npad = -(-n // 8) * 8
    itemsize = prepared["wq"].dtype.itemsize
    # the in-kernel fold needs ratio | tile (whole groups per block); fall
    # back to the outside (XLA reshape-sum) fold when r has no such divisor
    # (tiny test shapes) — _choose_tile requires multiple_of | r.
    mult = 8 * ratio // int(np.gcd(8, ratio))
    fold_in_kernel = ratio == 1 or r % mult == 0
    tile, _, _ = _choose_tile(
        r, 1, npad, c, heads, itemsize, n_act_bufs=3,
        scratch_bytes_per_window=(npad * 5 * c * itemsize
                                  + heads * npad * npad * 4),
        multiple_of=mult if fold_in_kernel else 8,
    )

    x1p = jnp.pad(x1, ((0, 0), (0, npad - n), (0, 0)))
    gyp = jnp.pad(gy, ((0, 0), (0, 0), (0, npad - n)))
    gxp = jnp.pad(gx, ((0, 0), (0, 0), (0, npad - n)))
    if ratio > 1:  # pad-then-tile: XLA fuses both into one copy
        x1p = jnp.tile(x1p, (ratio, 1, 1))
        gyp = jnp.tile(gyp, (1, ratio, 1))
        gxp = jnp.tile(gxp, (1, ratio, 1))
    x2p = jnp.pad(x2, ((0, 0), (0, npad - n), (0, 0)))
    wl = [prepared[k] for k in _WL_ORDER]
    full = lambda a: pl.BlockSpec(
        a.shape, lambda i, nd=a.ndim: (0,) * nd, memory_space=pltpu.VMEM)

    out_rows = b1 if fold_in_kernel else r
    out_tile = tile // ratio if fold_in_kernel else tile
    flops = r * n * c * (8 * c + 6 * n)
    cost = pl.CostEstimate(
        flops=flops,
        bytes_accessed=(2 * r + out_rows) * npad * c * x1.dtype.itemsize,
        transcendentals=r * n * n,
    )
    coord_spec = pl.BlockSpec(
        (groups, tile, npad), lambda i: (0, i, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(
            _cva_kernel, groups=groups, heads=heads, n_valid=n, ws=ws,
            scale=scale, ratio=ratio if fold_in_kernel else 1,
        ),
        out_shape=jax.ShapeDtypeStruct((out_rows, npad, c), x1.dtype),
        grid=(r // tile,),
        in_specs=[
            pl.BlockSpec((tile, npad, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, npad, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            coord_spec, coord_spec,
        ] + [full(a) for a in wl],
        out_specs=pl.BlockSpec((out_tile, npad, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((tile, npad, c), x1.dtype) for _ in range(5)]
        + [pltpu.VMEM((heads * tile, npad, npad), jnp.float32)],
        cost_estimate=cost,
        interpret=interpret,
        compiler_params=kernel_compiler_params(),
    )(x1p, x2p, gyp, gxp, *wl)
    if not fold_in_kernel and ratio > 1:
        out = out.reshape(b1, ratio, npad, c).sum(axis=1)
    return out[:, :n, :]
