"""Custom-VJP fused LayerNorm + windowed MSA + residual kernel (TPU, training).

Training counterpart of :mod:`.attn_ln` for the CrossSwinBlock's attention
half (reference ``multiTemporalViewEncoder.py:142-291``): the W-MSA output is
needed TWICE — as the drop-path residual branch and, pre-residual, as the
partner stream handed to the next view in the CVA chain (``:275,345-349``) —
so the whole-block train kernel cannot apply and the half runs here.

Forward (one launch over window tiles):

    y   = proj(softmax(q k^T * scale + mb) v),  q,k,v = qkv(LN(x))
    out = x + keep * y

returning BOTH ``y`` and ``out``.  Backward: ONE kernel recomputes the forward
from ``x`` per tile and produces ``dx`` from the two cotangents (``dy`` for the
partner-stream use, ``dout`` for the residual), spilling h1/dqkv/o/dproj for
the XLA weight-gradient GEMMs plus the per-tile pre-softmax score-grad sums
for the relative-position-bias gradient — the same recompute-from-input split
as :mod:`.swin_block_vjp`.
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

from .swin_block import _choose_tile, _hoisted_scores, kernel_compiler_params, vmem_limit_bytes
from .swin_block_vjp import _expand_mb, _ln_bwd, _ln_stats, _mb_spec


def train_supported(c: int, n: int, itemsize: int, drop: float,
                    attn_drop: float) -> bool:
    """qkv+proj weights (4C^2) must fit VMEM; dropout must be inactive
    (drop_path is handled via keep factors)."""
    if not _PALLAS_OK or drop != 0.0 or attn_drop != 0.0:
        return False
    return itemsize * 4 * c * c < 0.40 * vmem_limit_bytes() and n <= 64


def _tile(r, p_w, npad, c, heads, itemsize, *, bwd=False):
    t, _, _ = _choose_tile(
        r, p_w, npad, c, heads, itemsize,
        n_act_bufs=7 if bwd else 3,
        scratch_bytes_per_window=(
            npad * (8 if bwd else 4) * c * itemsize * (3 if bwd else 1)
            + heads * npad * npad * 4),
    )
    return t


def _fwd_kernel(
    x_ref, mb_ref, k1_ref,
    lns_ref, lnb_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
    y_ref, out_ref, qkv_scr, o_scr, s_scr,
    *, heads, n_valid, scale,
):
    tile, npad, c = x_ref.shape
    hd = c // heads
    x = x_ref[:]
    dtype = x.dtype

    xh, _ = _ln_stats(x.astype(jnp.float32))
    h1 = (xh * lns_ref[:].astype(jnp.float32)
          + lnb_ref[:].astype(jnp.float32)).astype(dtype)
    qkv_scr[:] = (jax.lax.dot_general(
        h1.reshape(tile * npad, c), wqkv_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bqkv_ref[:].astype(jnp.float32)).astype(dtype).reshape(tile, npad, 3 * c)

    _hoisted_scores(qkv_scr, mb_ref, s_scr, heads=heads, n_valid=n_valid,
                    scale=scale)
    for h in range(heads):
        v3 = qkv_scr[:, :, 2 * c + h * hd:2 * c + (h + 1) * hd]
        p = s_scr[h * tile:(h + 1) * tile].astype(dtype)
        o_scr[:, :, h * hd:(h + 1) * hd] = jax.lax.dot_general(
            p, v3, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(dtype)
    y32 = (jax.lax.dot_general(
        o_scr[:].reshape(tile * npad, c), wproj_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bproj_ref[:].astype(jnp.float32)).reshape(tile, npad, c)
    y_ref[:] = y32.astype(dtype)
    out_ref[:] = (x.astype(jnp.float32)
                  + k1_ref[:].astype(jnp.float32) * y32).astype(dtype)


def _bwd_kernel(
    x_ref, dy_ref, dout_ref, mb_ref, k1_ref,
    lns_ref, lnb_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
    dx_ref, h1_ref, dqkv_ref, o_ref, dproj_ref, dmb_ref,
    qkv_scr, dqkv_scr, do_scr, s_scr,
    *, heads, n_valid, scale,
):
    """Recompute the forward from x, produce dx from (dy, dout), spill the
    weight-grad operands (h1, dqkv, o, dproj) and the per-tile row-summed
    score gradient for the rel-pos bias."""
    tile, npad, c = x_ref.shape
    hd = c // heads
    x = x_ref[:]
    dtype = x.dtype
    dout32 = dout_ref[:].astype(jnp.float32)

    # ---- forward recompute ----
    xh, rstd = _ln_stats(x.astype(jnp.float32))
    s1 = lns_ref[:].astype(jnp.float32)
    h1 = (xh * s1 + lnb_ref[:].astype(jnp.float32)).astype(dtype)
    h1_ref[:] = h1
    qkv_scr[:] = (jax.lax.dot_general(
        h1.reshape(tile * npad, c), wqkv_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bqkv_ref[:].astype(jnp.float32)).astype(dtype).reshape(tile, npad, 3 * c)
    _hoisted_scores(qkv_scr, mb_ref, s_scr, heads=heads, n_valid=n_valid,
                    scale=scale)
    # o recompute goes through do_scr first (it is free until the proj bwd)
    for h in range(heads):
        v3 = qkv_scr[:, :, 2 * c + h * hd:2 * c + (h + 1) * hd]
        p = s_scr[h * tile:(h + 1) * tile].astype(dtype)
        do_scr[:, :, h * hd:(h + 1) * hd] = jax.lax.dot_general(
            p, v3, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(dtype)
    o_ref[:] = do_scr[:]

    # ---- backward ----
    # grad at the proj OUTPUT: partner-stream use + keep-scaled residual use
    dyt = (dy_ref[:].astype(jnp.float32)
           + k1_ref[:].astype(jnp.float32) * dout32).astype(dtype)
    dproj_ref[:] = dyt
    do_scr[:] = jax.lax.dot_general(
        dyt.reshape(tile * npad, c), wproj_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dtype).reshape(tile, npad, c)
    for h in range(heads):
        q3 = qkv_scr[:, :, h * hd:(h + 1) * hd]
        k3 = qkv_scr[:, :, c + h * hd:c + (h + 1) * hd]
        v3 = qkv_scr[:, :, 2 * c + h * hd:2 * c + (h + 1) * hd]
        p32 = s_scr[h * tile:(h + 1) * tile]
        p = p32.astype(dtype)
        do_h = do_scr[:, :, h * hd:(h + 1) * hd]
        dp = jax.lax.dot_general(
            do_h, v3, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dsum = jnp.sum(dp * p32, axis=-1, keepdims=True)
        ds = p32 * (dp - dsum)
        dmb_ref[0, h] = jnp.sum(ds, axis=0)
        ds_t = (ds * scale).astype(dtype)
        dq = jax.lax.dot_general(
            ds_t, k3, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dk = jax.lax.dot_general(
            ds_t, q3, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dv = jax.lax.dot_general(
            p, do_h, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dqkv_scr[:, :, h * hd:(h + 1) * hd] = dq.astype(dtype)
        dqkv_scr[:, :, c + h * hd:c + (h + 1) * hd] = dk.astype(dtype)
        dqkv_scr[:, :, 2 * c + h * hd:2 * c + (h + 1) * hd] = dv.astype(dtype)
    dqkv_ref[:] = dqkv_scr[:]

    dh1 = jax.lax.dot_general(
        dqkv_scr[:].reshape(tile * npad, 3 * c), wqkv_ref[:],
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(tile, npad, c)
    dx_ref[:] = (dout32 + _ln_bwd(dh1, xh, rstd, s1)).astype(dtype)


_W_NAMES = ("lns", "lnb", "wqkv", "bqkv", "wproj", "bproj")


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def fused_attn_ln_train(x, mb, weights, keep1, heads, n, p_w, interpret=False):
    """Differentiable ``(y, x + keep1 * y)`` with y the LN+W-MSA branch.

    x: (R, N, C) window tokens; mb: (P, H, N, N) additive term; weights: dict
    with the 6 `_W_NAMES` entries (2D, biases (1, d)); keep1: (R, 1) f32.
    """
    (y, out), _ = _fwd(x, mb, weights, keep1, heads, n, p_w, interpret)
    return y, out


def _specs(tile, npad, c, wl):
    full = lambda a: pl.BlockSpec(
        a.shape, lambda i, nd=a.ndim: (0,) * nd, memory_space=pltpu.VMEM)
    act = lambda d: pl.BlockSpec((tile, npad, d), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM)
    row = pl.BlockSpec((tile, 1, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    return act, row, [full(a) for a in wl]


def _fwd(x, mb, weights, keep1, heads, n, p_w, interpret):
    r, _, c = x.shape
    hd = c // heads
    npad = -(-n // 8) * 8
    wdtype = weights["wqkv"].dtype
    tile = _tile(r, p_w, npad, c, heads, wdtype.itemsize)

    xp = jnp.pad(x, ((0, 0), (0, npad - n), (0, 0)))
    mbt = _expand_mb(mb, npad, tile, p_w, wdtype)
    wl = [weights[k] for k in _W_NAMES]
    act, row, full_wl = _specs(tile, npad, c, wl)
    k1p = keep1.reshape(r, 1, 1)

    cost = pl.CostEstimate(
        flops=r * (8 * n * c * c + 4 * n * n * c),
        bytes_accessed=3 * r * npad * c * x.dtype.itemsize,
        transcendentals=r * n * n,
    )
    y, out = pl.pallas_call(
        functools.partial(_fwd_kernel, heads=heads, n_valid=n, scale=hd**-0.5),
        out_shape=(
            jax.ShapeDtypeStruct((r, npad, c), x.dtype),
            jax.ShapeDtypeStruct((r, npad, c), x.dtype),
        ),
        grid=(r // tile,),
        in_specs=[act(c), _mb_spec(mbt, tile, heads, npad), row] + full_wl,
        out_specs=(act(c), act(c)),
        scratch_shapes=[
            pltpu.VMEM((tile, npad, 3 * c), x.dtype),
            pltpu.VMEM((tile, npad, c), x.dtype),
            pltpu.VMEM((heads * tile, npad, npad), jnp.float32),
        ],
        cost_estimate=cost,
        interpret=interpret,
        compiler_params=kernel_compiler_params(),
    )(xp, mbt, k1p, *wl)
    return (y[:, :n, :], out[:, :n, :]), (x, mb, weights, keep1)


def _bwd(heads, n, p_w, interpret, res, cts):
    dy, dout = cts
    x, mb, weights, keep1 = res
    r, _, c = x.shape
    hd = c // heads
    npad = -(-n // 8) * 8
    wdtype = weights["wqkv"].dtype
    tile = _tile(r, p_w, npad, c, heads, wdtype.itemsize, bwd=True)

    xp = jnp.pad(x, ((0, 0), (0, npad - n), (0, 0)))
    dyp = jnp.pad(dy, ((0, 0), (0, npad - n), (0, 0)))
    doutp = jnp.pad(dout, ((0, 0), (0, npad - n), (0, 0)))
    mbt = _expand_mb(mb, npad, tile, p_w, wdtype)
    wl = [weights[k] for k in _W_NAMES]
    act, row, full_wl = _specs(tile, npad, c, wl)
    k1p = keep1.reshape(r, 1, 1)

    n_tiles = r // tile
    cost = pl.CostEstimate(
        flops=3 * r * (8 * n * c * c + 4 * n * n * c),
        bytes_accessed=8 * r * npad * c * x.dtype.itemsize,
        transcendentals=r * n * n,
    )
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, heads=heads, n_valid=n, scale=hd**-0.5),
        out_shape=(
            jax.ShapeDtypeStruct((r, npad, c), x.dtype),        # dx
            jax.ShapeDtypeStruct((r, npad, c), x.dtype),        # h1
            jax.ShapeDtypeStruct((r, npad, 3 * c), x.dtype),    # dqkv
            jax.ShapeDtypeStruct((r, npad, c), x.dtype),        # o
            jax.ShapeDtypeStruct((r, npad, c), x.dtype),        # dproj
            jax.ShapeDtypeStruct((n_tiles, heads, npad, npad), jnp.float32),
        ),
        grid=(n_tiles,),
        in_specs=[act(c), act(c), act(c), _mb_spec(mbt, tile, heads, npad), row]
        + full_wl,
        out_specs=(
            act(c), act(c), act(3 * c), act(c), act(c),
            pl.BlockSpec((1, heads, npad, npad), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((tile, npad, 3 * c), x.dtype),  # qkv
            pltpu.VMEM((tile, npad, 3 * c), x.dtype),  # dqkv
            pltpu.VMEM((tile, npad, c), x.dtype),      # o recompute / do
            pltpu.VMEM((heads * tile, npad, npad), jnp.float32),
        ],
        cost_estimate=cost,
        interpret=interpret,
        compiler_params=kernel_compiler_params(),
    )(xp, dyp, doutp, mbt, k1p, *wl)
    dx, h1, dqkv, o, dproj, dmb_tiles = outs

    f32 = jnp.float32
    flat = lambda a: a.reshape(r * npad, a.shape[-1])
    h1f, dqkvf, of, dprojf = map(flat, (h1, dqkv, o, dproj))
    mm = lambda a, b: jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=f32)
    dW = {
        "wqkv": mm(h1f, dqkvf).astype(wdtype),
        "bqkv": jnp.sum(dqkvf.astype(f32), axis=0, keepdims=True).astype(wdtype),
        "wproj": mm(of, dprojf).astype(wdtype),
        "bproj": jnp.sum(dprojf.astype(f32), axis=0, keepdims=True).astype(wdtype),
    }
    s1 = weights["lns"].astype(f32)
    xh = (h1f.astype(f32) - weights["lnb"].astype(f32)) / s1
    dh1 = dqkvf.astype(f32) @ weights["wqkv"].astype(f32).T
    dW["lns"] = jnp.sum(dh1 * xh, axis=0, keepdims=True).astype(wdtype)
    dW["lnb"] = jnp.sum(dh1, axis=0, keepdims=True).astype(wdtype)

    dmb_total = jnp.sum(dmb_tiles, axis=0)[:, :n, :n]
    dmb = jnp.zeros_like(mb).at[0].set(dmb_total.astype(mb.dtype))
    return (dx[:, :n, :], dmb, dW, jnp.zeros_like(keep1))


fused_attn_ln_train.defvjp(_fwd, _bwd)


def xla_attn_ln_reference(x, mb, weights, keep1, *, heads, n, p_w):
    """Pure-XLA forward with identical math, for parity tests."""
    r, _, c = x.shape
    hd = c // heads
    f32 = jnp.float32
    xh, _ = _ln_stats(x.astype(f32))
    h1 = xh * weights["lns"].astype(f32) + weights["lnb"].astype(f32)
    qkv = (h1.reshape(r * n, c) @ weights["wqkv"].astype(f32)
           + weights["bqkv"].astype(f32)).reshape(r, n, 3, heads, hd)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    scores = jnp.einsum("rqhd,rkhd->rhqk", q * hd**-0.5, k)
    mb_rows = mb[jnp.arange(r) % mb.shape[0]]  # (r, H, n, n)
    p = jax.nn.softmax(scores + mb_rows.astype(f32), axis=-1)
    o = jnp.einsum("rhqk,rkhd->rqhd", p, v).reshape(r, n, c)
    proj = (o.reshape(r * n, c) @ weights["wproj"].astype(f32)
            + weights["bproj"].astype(f32)).reshape(r, n, c)
    out = x.astype(f32) + keep1.astype(f32)[:, :, None] * proj
    return proj.astype(x.dtype), out.astype(x.dtype)
