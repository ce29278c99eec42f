"""Fused deformable cross-view attention (CVA) Pallas kernel (TPU).

One launch per tile of windows executes the ENTIRE ``SwinDAttention`` chain
(reference ``models/modules/deformableAttention.py:218-405``):

    q        = proj_q(x1_tiled)
    offsets  = tanh(offset_proj(gelu(LN(dwconv5x5(group(q)))))) * range
    sampled  = bilinear_sample(group(x2), ref + offsets)        # per group
    k, v     = proj_k(sampled), proj_v(sampled)
    out      = proj_out-accumulate(softmax(q k^T * scale) v)    # per head

Mosaic-shaped design decisions:

* All channel splits (offset groups g, attention heads h) are pre-split on
  LEADING axes outside the kernel (``prepare_cva_weights``) — lane slicing at
  sub-128 offsets is avoided entirely.  Group/head results re-enter full-C
  tensors through accumulating matmuls, never lane concatenation.
* The grouped depthwise 5x5 conv over each 7x7 window is expressed as 25
  static shift matrices (one per tap) applied as batched sublane matmuls with
  per-channel tap weights — no in-kernel transposes.
* Bilinear sampling uses the matmul form of :mod:`...ops.grid_sample`: per-axis
  weights (T, N, 7) are expanded to (T, N, N) sampling matrices through static
  one-hot expanders and contracted with the partner window on the MXU.
* The ``ratio`` query tiling / output fold (``:330,394-395``) stays outside the
  kernel (two cheap XLA ops on window-sized tensors).
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

from .swin_block import _choose_tile, _erf, _ln, attention_mode  # shared


def supported(c: int, n: int, itemsize: int = 2) -> bool:
    """Split weights are ~5C^2 (q twice, k, v, proj) plus small offset convs."""
    if not _PALLAS_OK:
        return False
    return itemsize * 5 * c * c < 9_000_000 and n <= 64


def _tap_shifts(ws: int, ksize: int = 5):
    """Static per-tap token-index shifts for the depthwise conv over a ws x ws
    window: tap t reads token p + dy*ws + dx."""
    pad = ksize // 2
    return tuple(
        (t // ksize - pad) * ws + (t % ksize - pad) for t in range(ksize * ksize)
    )


@functools.lru_cache(maxsize=None)
def _tap_masks(ws: int, npad: int, ksize: int = 5) -> np.ndarray:
    """(k*k, npad, 1) validity masks: tap t contributes at token p only when the
    shifted source (py+dy, px+dx) stays inside the window (zero padding)."""
    k2 = ksize * ksize
    pad = ksize // 2
    m = np.zeros((k2, npad, 1), np.float32)
    for t in range(k2):
        dy, dx = t // ksize - pad, t % ksize - pad
        for py in range(ws):
            for px in range(ws):
                if 0 <= py + dy < ws and 0 <= px + dx < ws:
                    m[t, py * ws + px, 0] = 1.0
    return m


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


@functools.lru_cache(maxsize=None)
def _ref_points(ws: int, npad: int):
    """Padded (npad, 1) reference y/x coordinates in [-1, 1] (cell centers,
    ``deformableAttention.py:311-322``)."""
    ys = (np.linspace(0.5, ws - 0.5, ws) / ws) * 2 - 1
    ref_y = np.zeros((npad, 1), np.float32)
    ref_x = np.zeros((npad, 1), np.float32)
    for q in range(ws * ws):
        ref_y[q, 0] = ys[q // ws]
        ref_x[q, 0] = ys[q % ws]
    return ref_y, ref_x


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
    x1_ref, x2g_ref,
    wq_ref, bq_ref, mw_ref, dwb_ref, lns_ref, lnb_ref, woff_ref,
    wk_ref, bk_ref, wv_ref, bv_ref,
    wproj_ref,
    ey_ref, ex_ref, refy_ref, refx_ref,
    out_ref, q_scr, s_scr, k_scr, v_scr, o_scr,
    *, groups, heads, n_valid, ws, scale, off_range,
):
    tile, npad, c = x1_ref.shape
    gc = c // groups
    hd = c // heads
    x1 = x1_ref[:]
    dtype = x1.dtype
    x1_2d = x1.reshape(tile * npad, c)

    key_ids = jax.lax.broadcasted_iota(jnp.int32, (npad, npad), dimension=1)

    # full-width q projection once (shared by offsets and attention); per-group
    # and per-head access is by lane-sliced scratch reads (swin_block rationale)
    q_scr[:] = (jax.lax.dot_general(
        x1_2d, wq_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bq_ref[:].astype(jnp.float32)).astype(dtype)

    # ---- per-group: offsets -> sampling matrix -> sampled partner ----
    for g in range(groups):
        # f32 copy for the rolls: Mosaic's rotate only handles 32-bit data
        qg = q_scr[:, g * gc:(g + 1) * gc].astype(jnp.float32).reshape(tile, npad, gc)

        # depthwise 5x5 over the window grid: static sublane rolls + masked
        # per-channel tap weights (no (tile, N, N) temporaries — an earlier
        # shift-matmul formulation blew the 16MB scoped-VMEM limit)
        dw = jnp.zeros((tile, npad, gc), jnp.float32)
        for t, sh in enumerate(_tap_shifts(ws)):
            src = pltpu.roll(qg, (-sh) % npad, 1) if sh % npad else qg
            dw = dw + src.astype(jnp.float32) * mw_ref[t].astype(jnp.float32)
        dw = dw + dwb_ref[:].astype(jnp.float32)

        h = _ln(dw, lns_ref[:].astype(jnp.float32), lnb_ref[:].astype(jnp.float32))
        h = 0.5 * h * (1.0 + _erf(h * 0.7071067811865476))
        off = jax.lax.dot_general(
            h.astype(dtype).reshape(tile * npad, gc), woff_ref[:],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        ).reshape(tile, npad, 2)
        off = jnp.tanh(off) * (off_range / ws)

        gy = (off[..., 0] + refy_ref[:, 0].astype(jnp.float32)[None] + 1.0) * 0.5 * (ws - 1)
        gx = (off[..., 1] + refx_ref[:, 0].astype(jnp.float32)[None] + 1.0) * 0.5 * (ws - 1)
        wy = _axis_weights(gy, ws)  # (tile, npad, ws)
        wx = _axis_weights(gx, ws)
        wmat = jax.lax.dot_general(
            wy.astype(dtype), ey_ref[:].astype(dtype),
            (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        ) * jax.lax.dot_general(
            wx.astype(dtype), ex_ref[:].astype(dtype),
            (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )  # (tile, npad_q, npad_src)
        s_scr[:, g * gc:(g + 1) * gc] = jax.lax.dot_general(
            wmat.astype(dtype), x2g_ref[g], (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(dtype).reshape(tile * npad, gc)

    # full-width k/v projections of the sampled partner
    k_scr[:] = (jax.lax.dot_general(
        s_scr[:], wk_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bk_ref[:].astype(jnp.float32)).astype(dtype)
    v_scr[:] = (jax.lax.dot_general(
        s_scr[:], wv_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bv_ref[:].astype(jnp.float32)).astype(dtype)

    # ---- per-head attention, then one full-width output projection ----
    for hh in range(heads):
        q3 = q_scr[:, hh * hd:(hh + 1) * hd].reshape(tile, npad, hd)
        k3 = k_scr[:, hh * hd:(hh + 1) * hd].reshape(tile, npad, hd)
        v3 = v_scr[:, hh * hd:(hh + 1) * hd].reshape(tile, npad, hd)
        scores = jax.lax.dot_general(
            q3, k3, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale
        scores = jnp.where(key_ids[None] < n_valid, scores, -1e30)
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(dtype)
        o_scr[:, hh * hd:(hh + 1) * hd] = jax.lax.dot_general(
            p, v3, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(dtype).reshape(tile * npad, hd)
    proj = jax.lax.dot_general(
        o_scr[:], wproj_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # proj_out BIAS is applied by the caller AFTER the ratio fold — the
    # reference projects the folded sum (``deformableAttention.py:394-399``),
    # and sum-then-bias != bias-then-sum when ratio > 1.
    out_ref[:] = proj.astype(dtype).reshape(tile, npad, c)


def prepare_cva_weights(weights, *, groups: int, heads: int, ws: int):
    """Kernel-ready operand dict from ``SwinDAttention`` flax params.

    ``weights`` keys (flax layouts): proj_q/proj_k/proj_v/proj_out kernel
    (C, C) + bias (C,); offset_dwconv kernel (5, 5, 1, gc) + bias (gc,);
    offset_norm scale/bias (gc,); offset_proj kernel (1, 1, gc, 2).
    """
    wq = weights["proj_q_kernel"]
    c = wq.shape[0]
    gc = c // groups
    hd = c // heads
    npad = -(-ws * ws // 8) * 8
    wdtype = wq.dtype

    ey, ex = _axis_expanders(ws, npad)
    refy, refx = _ref_points(ws, npad)

    dwk = weights["dw_kernel"].reshape(25, 1, gc)  # (5,5,1,gc) -> taps
    masks = jnp.asarray(_tap_masks(ws, npad), wdtype)  # (25, npad, 1)
    return {
        "wq": wq, "bq": weights["proj_q_bias"].reshape(1, c),
        "mw": (masks * dwk.astype(wdtype)).astype(wdtype),  # (25, npad, gc)
        "dwb": weights["dw_bias"].reshape(1, gc).astype(wdtype),
        "lns": weights["ln_scale"].reshape(1, gc).astype(wdtype),
        "lnb": weights["ln_bias"].reshape(1, gc).astype(wdtype),
        "woff": weights["off_kernel"].reshape(gc, 2).astype(wdtype),
        "wk": weights["proj_k_kernel"], "bk": weights["proj_k_bias"].reshape(1, c),
        "wv": weights["proj_v_kernel"], "bv": weights["proj_v_bias"].reshape(1, c),
        "wproj": weights["proj_out_kernel"],
        "bproj": weights["proj_out_bias"].reshape(1, c),  # applied post-fold
        "ey": jnp.asarray(ey, wdtype), "ex": jnp.asarray(ex, wdtype),
        "refy": jnp.asarray(refy, wdtype), "refx": jnp.asarray(refx, wdtype),
    }


_WL_ORDER = ("wq", "bq", "mw", "dwb", "lns", "lnb", "woff",
             "wk", "bk", "wv", "bv", "wproj",
             "ey", "ex", "refy", "refx")


@functools.partial(jax.jit, static_argnames=(
    "groups", "heads", "ws", "off_range", "interpret"))
def fused_cva_prepared(x1, x2g, prepared, *, groups: int, heads: int, ws: int,
                       off_range: float = 2.0, interpret: bool = False):
    """x1: (R, N, C) tiled query windows; x2g: (g, R, N, gc) grouped partner
    windows.  Returns the pre-``ratio``-fold attention output (R, N, C)."""
    r, n, c = x1.shape
    hd = c // heads
    scale = hd**-0.5
    npad = -(-n // 8) * 8
    # tighter per-buffer cap: the kernel's own scratches + f32 sampling
    # temporaries are ~8x the input tile
    tile, _, _ = _choose_tile(
        r, 1, npad, c, heads, prepared["wq"].dtype.itemsize, n_act_bufs=3,
        extra_weight_bytes=prepared["wq"].dtype.itemsize * c * c,
        per_buf_cap=262_144,
        scratch_bytes_per_window=npad * 5 * c * prepared["wq"].dtype.itemsize,
    )

    x1p = jnp.pad(x1, ((0, 0), (0, npad - n), (0, 0)))
    x2p = jnp.pad(x2g, ((0, 0), (0, 0), (0, npad - n), (0, 0)))
    wl = [prepared[k] for k in _WL_ORDER]
    full = lambda a: pl.BlockSpec(
        a.shape, lambda i, nd=a.ndim: (0,) * nd, memory_space=pltpu.VMEM)

    flops = r * n * c * (10 * c + 6 * n)  # q(x2), kv, proj, attn, sampling
    cost = pl.CostEstimate(
        flops=flops,
        bytes_accessed=3 * r * npad * c * x1.dtype.itemsize,
        transcendentals=r * n * (n + c),
    )
    out = pl.pallas_call(
        functools.partial(
            _cva_kernel, groups=groups, heads=heads, n_valid=n, ws=ws,
            scale=scale, off_range=off_range,
        ),
        out_shape=jax.ShapeDtypeStruct((r, npad, c), x1.dtype),
        grid=(r // tile,),
        in_specs=[
            pl.BlockSpec((tile, npad, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (groups, tile, npad, c // groups), lambda i: (0, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ] + [full(a) for a in wl],
        out_specs=pl.BlockSpec((tile, npad, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((tile * npad, c), x1.dtype) for _ in range(5)],
        cost_estimate=cost,
        interpret=interpret,
    )(x1p, x2p, *wl)
    return out[:, :n, :]
