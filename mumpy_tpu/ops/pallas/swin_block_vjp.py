"""Custom-VJP fused Swin block for the TRAINING path (TPU).

Round-1 measured training at ~3.7x the optimized forward, entirely pure-XLA
(PERF.md): like inference, the per-block op chain is launch-overhead bound, and
remat policy made no difference — so the win has to come from fused kernels
with custom VJPs.  This module provides the whole-block kernel pair:

* forward: the inference whole-block kernel extended with per-row stochastic-
  depth keep factors (``x2 = x + keep1*attn; y = x2 + keep2*mlp`` — drop_path
  is the only active stochastic regularizer in the flagship recipe; attn/proj/
  mlp dropout rates are 0, which :func:`train_supported` asserts).
* backward: ONE kernel recomputes the forward per tile from ``x`` (recompute-
  from-input — the residual is just the block input, so memory behaves like
  full remat) and produces ``dx`` in-kernel, while spilling the five matrices
  the weight gradients need (h1, dqkv, o, h2, dproj) plus the per-tile
  pre-softmax-grad sums for the relative-position-bias gradient.  The weight
  gradients themselves are large MXU-friendly GEMMs and stay in XLA.

Gradient of the additive term: ``mb = mask + bias`` broadcasts one bias over
all rows, so only the row-summed score gradient matters; it is returned in
slot 0 of ``dmb`` (the shift MASK is a non-differentiable constant built from
iota — its "gradient" is discarded by upstream construction).

Mirrors the reference training step ``loss.backward()`` over
``SwinTransformerBlock`` (``train.py:116``, ``swinTransformer.py:185-307``).
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

from .swin_block import (_choose_tile, _erf, _hoisted_scores, _ln,
                         attention_mode, kernel_compiler_params,
                         vmem_limit_bytes)

_SQRT1_2 = 0.7071067811865476
_INV_SQRT2PI = 0.3989422804014327

_FORCED_TRAIN_MODE = None


def set_train_mode(mode):
    global _FORCED_TRAIN_MODE
    _FORCED_TRAIN_MODE = mode


def train_mode() -> str:
    """Dispatch mode for the fused TRAINING block: off | interpret | compiled.

    Defaults to the inference kernel gate (attention_mode) but can be forced
    independently via MUMPY_FUSED_TRAIN (the training kernels are benched
    separately — see PERF.md)."""
    if _FORCED_TRAIN_MODE is not None:
        return _FORCED_TRAIN_MODE
    import os

    env = os.environ.get("MUMPY_FUSED_TRAIN", "auto")
    if env in ("0", "off"):
        return "off"
    if env in ("interpret", "compiled"):
        return env
    return attention_mode()


def train_site_enabled(site: str) -> bool:
    """MUMPY_FUSED_TRAIN_SITES env gate over the train-kernel call sites:
    "block" = the whole-block SwinBlock kernel, "cross" = the CrossSwinBlock
    attention half (ops/pallas/attn_ln_vjp.py), "mlp" = the CrossSwinBlock /
    VitBlock LN+MLP tails (ops/pallas/ln_mlp_vjp.py).  Comma list or
    "all"/"none"; TRACE-TIME only, like models.swin.fused_site_enabled.

    Default is "block,cross,mlp" again (the round-2 set): the round-3 "mlp
    crashes the TPU worker" regression was root-caused by the round-5 bisect
    to ONE instance — the c=1024/m=4096 view-3 stage-3 tail, whose compiled
    FORWARD kernel faults only when embedded in a composed program (PERF.md
    "ln_mlp root cause").  That instance is width-excluded at the call site
    (models.swin.fused_mlp_tail_train) unless MUMPY_ALLOW_CRASHING_KERNELS=1
    re-probes it; every other production instance is compiled-green inside
    the full flagship train step."""
    import os

    sites = os.environ.get("MUMPY_FUSED_TRAIN_SITES", "block,cross,mlp")
    if sites == "none":
        return False
    return sites == "all" or site in {t.strip() for t in sites.split(",")}


def train_supported(c: int, mlp_hidden: int, n: int, itemsize: int,
                    drop: float, attn_drop: float) -> bool:
    """The training kernel additionally requires all elementwise dropout rates
    to be zero (drop_path is handled via keep factors)."""
    if not _PALLAS_OK or drop != 0.0 or attn_drop != 0.0:
        return False
    weights = itemsize * (4 * c * c + 2 * c * mlp_hidden)
    return weights < 0.40 * vmem_limit_bytes() and n <= 64


def _gelu_and_grad(f1):
    """gelu(x) and d gelu(x)/dx with the same polynomial erf the fwd uses."""
    phi = 0.5 * (1.0 + _erf(f1 * _SQRT1_2))
    pdf = _INV_SQRT2PI * jnp.exp(-0.5 * f1 * f1)
    return f1 * phi, phi + f1 * pdf


def _ln_stats(x32, eps=1e-5):
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean((x32 - mu) ** 2, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    return (x32 - mu) * rstd, rstd


def _ln_bwd(dh, xhat, rstd, scale):
    """Backward of h = xhat*scale + bias wrt the LN input."""
    dxh = dh * scale
    m1 = jnp.mean(dxh, axis=-1, keepdims=True)
    m2 = jnp.mean(dxh * xhat, axis=-1, keepdims=True)
    return (dxh - m1 - xhat * m2) * rstd


def _train_fwd_kernel(
    x_ref, mb_ref, k1_ref, k2_ref,
    ln1s_ref, ln1b_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
    ln2s_ref, ln2b_ref, wfc1_ref, bfc1_ref, wfc2_ref, bfc2_ref,
    out_ref, qkv_scr, o_scr, s_scr,
    *, heads, n_valid, scale,
):
    """Forward with stochastic-depth keep factors (k1/k2: (tile, 1, 1) f32).

    The keep operands are fed as (R, 1, 1) with block (tile, 1, 1): Mosaic
    requires the last two block dims be (8, 128)-divisible OR equal to the
    array dims, and a 2D (tile, 1) block violates that whenever tile % 8 != 0
    (e.g. the r=48/tile=12 stage-3 shape)."""
    tile, npad, c = x_ref.shape
    hd = c // heads
    x = x_ref[:]
    dtype = x.dtype

    xh1, _ = _ln_stats(x.astype(jnp.float32))
    h1 = (xh1 * ln1s_ref[:].astype(jnp.float32)
          + ln1b_ref[:].astype(jnp.float32)).astype(dtype)
    # 3D scratches: per-head q/k/v is a pure lane-sliced REF load (see
    # swin_block._block_kernel — measured ~9% kernel win vs the 2D layout)
    qkv_scr[:] = (jax.lax.dot_general(
        h1.reshape(tile * npad, c), wqkv_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bqkv_ref[:].astype(jnp.float32)).astype(dtype).reshape(tile, npad, 3 * c)

    # hoisted all-head softmax (see swin_block._hoisted_scores: -22% kernel)
    _hoisted_scores(qkv_scr, mb_ref, s_scr, heads=heads, n_valid=n_valid,
                    scale=scale)
    for h in range(heads):
        v3 = qkv_scr[:, :, 2 * c + h * hd:2 * c + (h + 1) * hd]
        p = s_scr[h * tile:(h + 1) * tile].astype(dtype)
        o_scr[:, :, h * hd:(h + 1) * hd] = jax.lax.dot_general(
            p, v3, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(dtype)
    proj = jax.lax.dot_general(
        o_scr[:].reshape(tile * npad, c), wproj_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bproj_ref[:].astype(jnp.float32)
    k1 = k1_ref[:].astype(jnp.float32)  # (tile, 1, 1)
    x2 = x.astype(jnp.float32) + k1 * proj.reshape(tile, npad, c)
    x2 = x2.astype(dtype)

    k2 = k2_ref[:].astype(jnp.float32)
    wc = max(1, min(tile, 2_000_000 // (npad * wfc1_ref.shape[1] * 4)))
    for j in range(0, tile, wc):
        cc = min(wc, tile - j)
        xs = x2[j:j + cc]
        xh2, _ = _ln_stats(xs.astype(jnp.float32))
        h2 = (xh2 * ln2s_ref[:].astype(jnp.float32)
              + ln2b_ref[:].astype(jnp.float32)).astype(dtype).reshape(cc * npad, c)
        f1 = jax.lax.dot_general(
            h2, wfc1_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bfc1_ref[:].astype(jnp.float32)
        g = (0.5 * f1 * (1.0 + _erf(f1 * _SQRT1_2))).astype(dtype)
        f2 = jax.lax.dot_general(
            g, wfc2_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bfc2_ref[:].astype(jnp.float32)
        out_ref[j:j + cc] = xs + (
            k2[j:j + cc] * f2.reshape(cc, npad, c)
        ).astype(dtype)


def _train_bwd_kernel(
    x_ref, dy_ref, mb_ref, k1_ref, k2_ref,
    ln1s_ref, ln1b_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
    ln2s_ref, ln2b_ref, wfc1_ref, bfc1_ref, wfc2_ref, bfc2_ref,
    dx_ref, h1_ref, dqkv_ref, o_ref, h2_ref, dproj_ref, dmb_ref,
    qkv_scr, o_scr, dqkv_scr, do_scr, s_scr,
    *, heads, n_valid, scale,
):
    """Recompute the forward from x, produce dx, spill weight-grad operands.

    Outputs per tile: dx (tile,N,C); h1/dqkv/o/h2/dproj in the activation
    dtype for the XLA weight-grad GEMMs; dmb (1,H,N,N) f32 = sum over the
    tile's rows of the pre-softmax score gradient (for the relative-position
    bias; see module docstring).
    """
    tile, npad, c = x_ref.shape
    hd = c // heads
    x = x_ref[:]
    dy = dy_ref[:]
    dtype = x.dtype

    # ---- forward recompute: LN1 / qkv / attention ----
    xh1, rstd1 = _ln_stats(x.astype(jnp.float32))
    s1 = ln1s_ref[:].astype(jnp.float32)
    h1_32 = xh1 * s1 + ln1b_ref[:].astype(jnp.float32)
    h1 = h1_32.astype(dtype)
    h1_ref[:] = h1
    # 3D scratches: per-head q/k/v/do reads and dq/dk/dv writes are pure
    # lane-sliced REF accesses (see swin_block._block_kernel, ~9% kernel win)
    qkv_scr[:] = (jax.lax.dot_general(
        h1.reshape(tile * npad, c), wqkv_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bqkv_ref[:].astype(jnp.float32)).astype(dtype).reshape(tile, npad, 3 * c)

    # hoisted all-head softmax, computed ONCE and kept in s_scr for both the
    # o recompute here and the score backward below (the old per-head loop
    # recomputed scores+softmax twice per head)
    _hoisted_scores(qkv_scr, mb_ref, s_scr, heads=heads, n_valid=n_valid,
                    scale=scale)
    for h in range(heads):
        v3 = qkv_scr[:, :, 2 * c + h * hd:2 * c + (h + 1) * hd]
        p = s_scr[h * tile:(h + 1) * tile].astype(dtype)
        o_scr[:, :, h * hd:(h + 1) * hd] = jax.lax.dot_general(
            p, v3, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(dtype)
    o_ref[:] = o_scr[:]
    proj = jax.lax.dot_general(
        o_scr[:].reshape(tile * npad, c), wproj_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bproj_ref[:].astype(jnp.float32)
    k1 = k1_ref[:].astype(jnp.float32)  # (tile, 1, 1)
    x2_32 = x.astype(jnp.float32) + k1 * proj.reshape(tile, npad, c)
    x2 = x2_32.astype(dtype)

    # ---- MLP branch: recompute + backward, chunked over windows ----
    xh2, rstd2 = _ln_stats(x2.astype(jnp.float32))
    s2 = ln2s_ref[:].astype(jnp.float32)
    h2_32 = xh2 * s2 + ln2b_ref[:].astype(jnp.float32)
    h2 = h2_32.astype(dtype)
    h2_ref[:] = h2
    k2 = k2_ref[:].astype(jnp.float32)

    wc = max(1, min(tile, 1_000_000 // (npad * wfc1_ref.shape[1] * 4)))
    ln2_terms = []
    for j in range(0, tile, wc):
        cc = min(wc, tile - j)
        h2c = h2[j:j + cc].reshape(cc * npad, c)
        f1 = jax.lax.dot_general(
            h2c, wfc1_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bfc1_ref[:].astype(jnp.float32)
        _, dgelu = _gelu_and_grad(f1)
        df2 = (k2[j:j + cc] * dy[j:j + cc].astype(jnp.float32)
               ).reshape(cc * npad, c).astype(dtype)
        dg = jax.lax.dot_general(
            df2, wfc2_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        df1 = (dg * dgelu).astype(dtype)
        dh2 = jax.lax.dot_general(
            df1, wfc1_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(cc, npad, c)
        ln2_terms.append(_ln_bwd(dh2, xh2[j:j + cc], rstd2[j:j + cc], s2))
    dx2 = dy.astype(jnp.float32) + (
        ln2_terms[0] if len(ln2_terms) == 1
        else jnp.concatenate(ln2_terms, axis=0))

    dproj = k1 * dx2
    dproj_d = dproj.astype(dtype)
    dproj_ref[:] = dproj_d

    # ---- attention backward ----
    # do_scr holds do_full (grad at o) in 3D so per-head do_h is a lane slice
    do_scr[:] = jax.lax.dot_general(
        dproj_d.reshape(tile * npad, c), wproj_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dtype).reshape(tile, npad, c)
    for h in range(heads):
        q3 = qkv_scr[:, :, h * hd:(h + 1) * hd]
        k3 = qkv_scr[:, :, c + h * hd:c + (h + 1) * hd]
        v3 = qkv_scr[:, :, 2 * c + h * hd:2 * c + (h + 1) * hd]
        p32 = s_scr[h * tile:(h + 1) * tile]
        p = p32.astype(dtype)
        do_h = do_scr[:, :, h * hd:(h + 1) * hd]
        dp = jax.lax.dot_general(  # (tile, N, N)
            do_h, v3, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dsum = jnp.sum(dp * p32, axis=-1, keepdims=True)
        ds = p32 * (dp - dsum)  # grad at (q k^T scale + mb)
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
    dx_ref[:] = (dx2 + _ln_bwd(dh1, xh1, rstd1, s1)).astype(dtype)


def _train_bwd_dw_kernel(
    x_ref, dy_ref, mb_ref, k1_ref, k2_ref,
    ln1s_ref, ln1b_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
    ln2s_ref, ln2b_ref, wfc1_ref, bfc1_ref, wfc2_ref, bfc2_ref,
    dx_ref, dmb_ref,
    dln1s_ref, dln1b_ref, dwqkv_ref, dbqkv_ref, dwproj_ref, dbproj_ref,
    dln2s_ref, dln2b_ref, dwfc1_ref, dbfc1_ref, dwfc2_ref, dbfc2_ref,
    qkv_scr, o_scr, dqkv_scr, do_scr, s_scr,
    *, heads, n_valid, scale,
):
    """Backward with IN-KERNEL weight-gradient accumulation.

    The spill-form backward (:func:`_train_bwd_kernel`) writes five full-size
    activation operands to HBM and leaves the weight grads to an XLA tail that
    re-reads them (plus an f32 MLP recompute).  scripts/bwd_probe.py measured
    that tail at **43-45% of the whole VJP** (stage2v3: 917 us of 2149).  Here
    every dW is a per-tile GEMM over operands already in VMEM, accumulated
    across grid steps in f32 output blocks with constant index maps (zeroed at
    grid step 0) — no activation spills, no XLA tail, ~1x extra fwd-GEMM flops
    on the MXU in exchange for ~7c/row less HBM traffic.

    Pad-row correctness: dy pad rows are 0, so df2/df1 and all of dqkv's pad
    rows are exactly 0 (pad KEY columns carry softmax prob 0 via the -1e30
    additive term), hence pad rows contribute nothing to any dW — same math
    as the spill path's full-row GEMMs.
    """
    tile, npad, c = x_ref.shape
    hd = c // heads
    x = x_ref[:]
    dy = dy_ref[:]
    dtype = x.dtype
    f32 = jnp.float32

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for ref in (dln1s_ref, dln1b_ref, dwqkv_ref, dbqkv_ref, dwproj_ref,
                    dbproj_ref, dln2s_ref, dln2b_ref, dwfc1_ref, dbfc1_ref,
                    dwfc2_ref, dbfc2_ref):
            ref[...] = jnp.zeros_like(ref)

    # ---- forward recompute: LN1 / qkv / attention ----
    xh1, rstd1 = _ln_stats(x.astype(f32))
    s1 = ln1s_ref[:].astype(f32)
    h1_32 = xh1 * s1 + ln1b_ref[:].astype(f32)
    h1 = h1_32.astype(dtype)
    qkv_scr[:] = (jax.lax.dot_general(
        h1.reshape(tile * npad, c), wqkv_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    ) + bqkv_ref[:].astype(f32)).astype(dtype).reshape(tile, npad, 3 * c)

    _hoisted_scores(qkv_scr, mb_ref, s_scr, heads=heads, n_valid=n_valid,
                    scale=scale)
    for h in range(heads):
        v3 = qkv_scr[:, :, 2 * c + h * hd:2 * c + (h + 1) * hd]
        p = s_scr[h * tile:(h + 1) * tile].astype(dtype)
        o_scr[:, :, h * hd:(h + 1) * hd] = jax.lax.dot_general(
            p, v3, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=f32,
        ).astype(dtype)
    proj = jax.lax.dot_general(
        o_scr[:].reshape(tile * npad, c), wproj_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    ) + bproj_ref[:].astype(f32)
    k1 = k1_ref[:].astype(f32)
    x2_32 = x.astype(f32) + k1 * proj.reshape(tile, npad, c)
    x2 = x2_32.astype(dtype)

    # ---- MLP branch: recompute + backward + fc/ln2 weight grads ----
    xh2, rstd2 = _ln_stats(x2.astype(f32))
    s2 = ln2s_ref[:].astype(f32)
    h2_32 = xh2 * s2 + ln2b_ref[:].astype(f32)
    h2 = h2_32.astype(dtype)
    k2 = k2_ref[:].astype(f32)

    m = wfc1_ref.shape[1]
    wc = max(1, min(tile, 1_000_000 // (npad * m * 4)))
    ln2_terms = []
    for j in range(0, tile, wc):
        cc = min(wc, tile - j)
        h2c = h2[j:j + cc].reshape(cc * npad, c)
        f1 = jax.lax.dot_general(
            h2c, wfc1_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        ) + bfc1_ref[:].astype(f32)
        g, dgelu = _gelu_and_grad(f1)
        df2 = (k2[j:j + cc] * dy[j:j + cc].astype(f32)
               ).reshape(cc * npad, c).astype(dtype)
        dg = jax.lax.dot_general(
            df2, wfc2_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=f32,
        )
        df1 = (dg * dgelu).astype(dtype)
        dh2 = jax.lax.dot_general(
            df1, wfc1_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=f32,
        ).reshape(cc, npad, c)
        # fc weight/bias grads over this chunk's in-VMEM operands
        dwfc1_ref[...] += jax.lax.dot_general(
            h2c, df1, (((0,), (0,)), ((), ())), preferred_element_type=f32)
        dbfc1_ref[...] += jnp.sum(df1.astype(f32), axis=0, keepdims=True)
        dwfc2_ref[...] += jax.lax.dot_general(
            g.astype(dtype), df2, (((0,), (0,)), ((), ())),
            preferred_element_type=f32)
        dbfc2_ref[...] += jnp.sum(df2.astype(f32), axis=0, keepdims=True)
        dh2_32 = dh2.astype(f32)
        dln2s_ref[...] += jnp.sum(
            (dh2_32 * xh2[j:j + cc]).reshape(cc * npad, c), axis=0,
            keepdims=True)
        dln2b_ref[...] += jnp.sum(dh2_32.reshape(cc * npad, c), axis=0,
                                  keepdims=True)
        ln2_terms.append(_ln_bwd(dh2, xh2[j:j + cc], rstd2[j:j + cc], s2))
    dx2 = dy.astype(f32) + (
        ln2_terms[0] if len(ln2_terms) == 1
        else jnp.concatenate(ln2_terms, axis=0))

    dproj = k1 * dx2
    dproj_d = dproj.astype(dtype)
    dproj_2d = dproj_d.reshape(tile * npad, c)
    dwproj_ref[...] += jax.lax.dot_general(
        o_scr[:].reshape(tile * npad, c), dproj_2d, (((0,), (0,)), ((), ())),
        preferred_element_type=f32)
    dbproj_ref[...] += jnp.sum(dproj_2d.astype(f32), axis=0, keepdims=True)

    # ---- attention backward ----
    do_scr[:] = jax.lax.dot_general(
        dproj_2d, wproj_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=f32,
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
            preferred_element_type=f32,
        )
        dsum = jnp.sum(dp * p32, axis=-1, keepdims=True)
        ds = p32 * (dp - dsum)
        dmb_ref[0, h] = jnp.sum(ds, axis=0)
        ds_t = (ds * scale).astype(dtype)
        dq = jax.lax.dot_general(
            ds_t, k3, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=f32,
        )
        dk = jax.lax.dot_general(
            ds_t, q3, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=f32,
        )
        dv = jax.lax.dot_general(
            p, do_h, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=f32,
        )
        dqkv_scr[:, :, h * hd:(h + 1) * hd] = dq.astype(dtype)
        dqkv_scr[:, :, c + h * hd:c + (h + 1) * hd] = dk.astype(dtype)
        dqkv_scr[:, :, 2 * c + h * hd:2 * c + (h + 1) * hd] = dv.astype(dtype)

    dqkv_2d = dqkv_scr[:].reshape(tile * npad, 3 * c)
    dwqkv_ref[...] += jax.lax.dot_general(
        h1.reshape(tile * npad, c), dqkv_2d, (((0,), (0,)), ((), ())),
        preferred_element_type=f32)
    dbqkv_ref[...] += jnp.sum(dqkv_2d.astype(f32), axis=0, keepdims=True)

    dh1 = jax.lax.dot_general(
        dqkv_2d, wqkv_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=f32,
    ).reshape(tile, npad, c)
    dln1s_ref[...] += jnp.sum(
        (dh1 * xh1).reshape(tile * npad, c), axis=0, keepdims=True)
    dln1b_ref[...] += jnp.sum(dh1.reshape(tile * npad, c), axis=0,
                              keepdims=True)
    dx_ref[:] = (dx2 + _ln_bwd(dh1, xh1, rstd1, s1)).astype(dtype)


_W_NAMES = ("ln1s", "ln1b", "wqkv", "bqkv", "wproj", "bproj",
            "ln2s", "ln2b", "wfc1", "bfc1", "wfc2", "bfc2")

_DW_SHAPES = lambda c, m: {
    "ln1s": (1, c), "ln1b": (1, c), "wqkv": (c, 3 * c), "bqkv": (1, 3 * c),
    "wproj": (c, c), "bproj": (1, c), "ln2s": (1, c), "ln2b": (1, c),
    "wfc1": (c, m), "bfc1": (1, m), "wfc2": (m, c), "bfc2": (1, c),
}


def dw_in_kernel(c: int, m: int, itemsize: int) -> bool:
    """Use the in-kernel dW-accumulation backward when the f32 accumulators +
    resident weights fit the VMEM budget.  ``MUMPY_BWD_DW=spill`` forces the
    spill-form backward (A/B knob, trace-time)."""
    import os

    mode = os.environ.get("MUMPY_BWD_DW", "").strip()
    if mode == "spill":
        return False
    if mode == "kernel":
        return True
    if itemsize >= 4:
        # f32 training (reference-parity mode): the f32 accumulator outputs
        # push XLA's own 16MB scoped-vmem fusion budget over at flagship
        # widths ("Scoped allocation ... exceeded scoped vmem limit", an
        # XLA-side limit CompilerParams cannot raise) — use the spill form
        return False
    acc = 4 * (4 * c * c + 2 * c * m + 6 * c + 3 * c + m)
    weights = itemsize * (4 * c * c + 2 * c * m)
    return acc + weights < 0.55 * vmem_limit_bytes()


def _tile_and_mb(r, p_w, npad, c, heads, itemsize, m, *, bwd=False):
    factor = 3 if bwd else 1  # bwd carries ~3x the live f32 temporaries
    tile, reps, _ = _choose_tile(
        r, p_w, npad, c, heads, itemsize,
        n_act_bufs=8 if bwd else 2,
        extra_weight_bytes=2 * c * m * itemsize,
        scratch_bytes_per_window=(
            npad * (10 if bwd else 4) * c * itemsize * factor
            + heads * npad * npad * 4),  # hoisted-softmax scores scratch
    )
    return tile, reps


def _expand_mb(mb, npad, tile, p_w, wdtype):
    """(P, H, n, n) additive term -> kernel layout (H, rows_or_1, npad, npad)."""
    n = mb.shape[-1]
    # key-PAD columns carry -1e30: the additive term doubles as the pad mask
    # for both the forward and the recompute-in-backward softmaxes (see
    # swin_block._hoisted_scores); pad-column probabilities are exactly 0, so
    # the softmax JVP/VJP math is untouched.
    mbp = jnp.pad(mb.astype(wdtype), ((0, 0), (0, 0), (0, npad - n), (0, 0)))
    mbp = jnp.pad(mbp, ((0, 0), (0, 0), (0, 0), (0, npad - n)),
                  constant_values=-1e30)
    if p_w > 1 and tile > p_w:
        mbp = jnp.tile(mbp, (tile // p_w, 1, 1, 1))
    return mbp.transpose(1, 0, 2, 3)


def _mb_spec(mbt, tile, heads, npad):
    mbw = mbt.shape[1]
    if mbw == 1:
        return pl.BlockSpec((heads, 1, npad, npad), lambda i: (0, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    nb = mbw // tile
    return pl.BlockSpec((heads, tile, npad, npad),
                        lambda i, nb=nb: (0, i % nb, 0, 0),
                        memory_space=pltpu.VMEM)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def fused_block_train(x, mb, weights, keep1, keep2, heads, n, p_w,
                      interpret=False):
    """Differentiable fused Swin block on window tokens.

    x: (R, N, C); mb: (P, H, N, N) additive term (mask + rel-pos bias);
    weights: dict with the 12 `_W_NAMES` entries (2D, biases (1, d));
    keep1/keep2: (R, 1) f32 stochastic-depth keep factors (0 or 1/(1-p)).
    """
    y, _ = _fwd(x, mb, weights, keep1, keep2, heads, n, p_w, interpret)
    return y


def _fwd(x, mb, weights, keep1, keep2, heads, n, p_w, interpret):
    r, _, c = x.shape
    hd = c // heads
    npad = -(-n // 8) * 8
    wdtype = weights["wqkv"].dtype
    m = weights["wfc1"].shape[1]
    tile, _ = _tile_and_mb(r, p_w, npad, c, heads, wdtype.itemsize, m)

    xp = jnp.pad(x, ((0, 0), (0, npad - n), (0, 0)))
    mbt = _expand_mb(mb, npad, tile, p_w, wdtype)
    wl = [weights[k] for k in _W_NAMES]
    full = lambda a: pl.BlockSpec(
        a.shape, lambda i, nd=a.ndim: (0,) * nd, memory_space=pltpu.VMEM)
    k1p = keep1.reshape(r, 1, 1)
    k2p = keep2.reshape(r, 1, 1)
    row = pl.BlockSpec((tile, 1, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)

    flops = r * (8 * n * c * c + 4 * n * n * c + 4 * n * c * m)
    cost = pl.CostEstimate(
        flops=flops,
        bytes_accessed=2 * r * npad * c * x.dtype.itemsize,
        transcendentals=r * n * m,
    )
    y = pl.pallas_call(
        functools.partial(_train_fwd_kernel, heads=heads, n_valid=n,
                          scale=hd**-0.5),
        out_shape=jax.ShapeDtypeStruct((r, npad, c), x.dtype),
        grid=(r // tile,),
        in_specs=[
            pl.BlockSpec((tile, npad, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            _mb_spec(mbt, tile, heads, npad),
            row, row,
        ] + [full(a) for a in wl],
        out_specs=pl.BlockSpec((tile, npad, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((tile, npad, 3 * c), x.dtype),
            pltpu.VMEM((tile, npad, c), x.dtype),
            pltpu.VMEM((heads * tile, npad, npad), jnp.float32),  # scores/probs
        ],
        cost_estimate=cost,
        interpret=interpret,
        compiler_params=kernel_compiler_params(),
    )(xp, mbt, k1p, k2p, *wl)
    return y[:, :n, :], (x, mb, weights, keep1, keep2)


def _bwd(heads, n, p_w, interpret, res, dy):
    x, mb, weights, keep1, keep2 = res
    r, _, c = x.shape
    hd = c // heads
    npad = -(-n // 8) * 8
    wdtype = weights["wqkv"].dtype
    m = weights["wfc1"].shape[1]
    if dw_in_kernel(c, m, wdtype.itemsize):
        return _bwd_dw(heads, n, p_w, interpret, res, dy)
    tile, _ = _tile_and_mb(r, p_w, npad, c, heads, wdtype.itemsize, m, bwd=True)

    xp = jnp.pad(x, ((0, 0), (0, npad - n), (0, 0)))
    dyp = jnp.pad(dy, ((0, 0), (0, npad - n), (0, 0)))
    mbt = _expand_mb(mb, npad, tile, p_w, wdtype)
    wl = [weights[k] for k in _W_NAMES]
    full = lambda a: pl.BlockSpec(
        a.shape, lambda i, nd=a.ndim: (0,) * nd, memory_space=pltpu.VMEM)
    k1p = keep1.reshape(r, 1, 1)
    k2p = keep2.reshape(r, 1, 1)
    row = pl.BlockSpec((tile, 1, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    act = lambda lastdim: pl.BlockSpec(
        (tile, npad, lastdim), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)

    n_tiles = r // tile
    flops = r * (3 * (8 * n * c * c + 4 * n * n * c + 4 * n * c * m))
    cost = pl.CostEstimate(
        flops=flops,
        bytes_accessed=9 * r * npad * c * x.dtype.itemsize,
        transcendentals=2 * r * n * m,
    )
    outs = pl.pallas_call(
        functools.partial(_train_bwd_kernel, heads=heads, n_valid=n,
                          scale=hd**-0.5),
        out_shape=(
            jax.ShapeDtypeStruct((r, npad, c), x.dtype),        # dx
            jax.ShapeDtypeStruct((r, npad, c), x.dtype),        # h1
            jax.ShapeDtypeStruct((r, npad, 3 * c), x.dtype),    # dqkv
            jax.ShapeDtypeStruct((r, npad, c), x.dtype),        # o
            jax.ShapeDtypeStruct((r, npad, c), x.dtype),        # h2
            jax.ShapeDtypeStruct((r, npad, c), x.dtype),        # dproj
            jax.ShapeDtypeStruct((n_tiles, heads, npad, npad), jnp.float32),
        ),
        grid=(n_tiles,),
        in_specs=[
            act(c), act(c), _mb_spec(mbt, tile, heads, npad), row, row,
        ] + [full(a) for a in wl],
        out_specs=(
            act(c), act(c), act(3 * c), act(c), act(c), act(c),
            pl.BlockSpec((1, heads, npad, npad), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((tile, npad, 3 * c), x.dtype),  # qkv
            pltpu.VMEM((tile, npad, c), x.dtype),      # o
            pltpu.VMEM((tile, npad, 3 * c), x.dtype),  # dqkv
            pltpu.VMEM((tile, npad, c), x.dtype),      # do_full (grad at o)
            pltpu.VMEM((heads * tile, npad, npad), jnp.float32),  # probs
        ],
        cost_estimate=cost,
        interpret=interpret,
        compiler_params=kernel_compiler_params(),
    )(xp, dyp, mbt, k1p, k2p, *wl)
    dx, h1, dqkv, o, h2, dproj, dmb_tiles = outs

    import os
    if os.environ.get("MUMPY_BWD_NO_DW"):
        # probe-only (scripts/bwd_probe.py): skip the XLA weight-grad tail to
        # time the bwd kernel alone — gradients are WRONG under this gate
        if not getattr(_bwd, "_no_dw_logged", False):
            _bwd._no_dw_logged = True
            print(
                "[mumpy] WARNING: MUMPY_BWD_NO_DW active — weight gradients "
                "are ZERO (timing probe only; any training run under this "
                "gate updates nothing but via dx)", flush=True)
        dmb_total = jnp.sum(dmb_tiles, axis=0)[:, :n, :n]
        dmb = jnp.zeros_like(mb).at[0].set(dmb_total.astype(mb.dtype))
        dW = {k: jnp.zeros_like(weights[k]) for k in _W_NAMES}
        return (dx[:, :n, :], dmb, dW,
                jnp.zeros_like(keep1), jnp.zeros_like(keep2))

    f32 = jnp.float32
    flat = lambda a: a.reshape(r * npad, a.shape[-1])
    h1f, dqkvf, of, h2f, dprojf = map(flat, (h1, dqkv, o, h2, dproj))
    dyp32 = flat(dyp).astype(f32)

    # ---- weight grads: big MXU GEMMs in XLA over the spilled operands ----
    mm = lambda a, b: jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=f32)
    dW = {}
    dW["wqkv"] = mm(h1f, dqkvf).astype(wdtype)
    dW["bqkv"] = jnp.sum(dqkvf.astype(f32), axis=0, keepdims=True).astype(wdtype)
    dW["wproj"] = mm(of, dprojf).astype(wdtype)
    dW["bproj"] = jnp.sum(dprojf.astype(f32), axis=0, keepdims=True).astype(wdtype)

    # MLP recompute (GEMMs) for fc grads
    f1 = (h2f.astype(f32) @ weights["wfc1"].astype(f32)
          + weights["bfc1"].astype(f32))
    g, dgelu = _gelu_and_grad(f1)
    keep2_rows = jnp.repeat(keep2.astype(f32), npad, axis=0)  # (r*npad, 1)
    df2 = keep2_rows * dyp32
    dg = df2 @ weights["wfc2"].astype(f32).T
    df1 = dg * dgelu
    dW["wfc1"] = mm(h2f.astype(f32), df1).astype(wdtype)
    dW["bfc1"] = jnp.sum(df1, axis=0, keepdims=True).astype(wdtype)
    dW["wfc2"] = mm(g, df2).astype(wdtype)
    dW["bfc2"] = jnp.sum(df2, axis=0, keepdims=True).astype(wdtype)

    # LN parameter grads (xhat recovered elementwise from h = xhat*s + b)
    s1 = weights["ln1s"].astype(f32)
    xh1 = (h1f.astype(f32) - weights["ln1b"].astype(f32)) / s1
    dh1 = dqkvf.astype(f32) @ weights["wqkv"].astype(f32).T
    dW["ln1s"] = jnp.sum(dh1 * xh1, axis=0, keepdims=True).astype(wdtype)
    dW["ln1b"] = jnp.sum(dh1, axis=0, keepdims=True).astype(wdtype)
    s2 = weights["ln2s"].astype(f32)
    xh2 = (h2f.astype(f32) - weights["ln2b"].astype(f32)) / s2
    dh2 = df1 @ weights["wfc1"].astype(f32).T
    dW["ln2s"] = jnp.sum(dh2 * xh2, axis=0, keepdims=True).astype(wdtype)
    dW["ln2b"] = jnp.sum(dh2, axis=0, keepdims=True).astype(wdtype)

    # additive-term grad: all rows share one bias -> total row-sum in slot 0
    dmb_total = jnp.sum(dmb_tiles, axis=0)[:, :n, :n]
    dmb = jnp.zeros_like(mb).at[0].set(dmb_total.astype(mb.dtype))

    return (dx[:, :n, :], dmb, dW, jnp.zeros_like(keep1), jnp.zeros_like(keep2))


def _bwd_dw(heads, n, p_w, interpret, res, dy):
    """In-kernel-dW backward dispatch (see :func:`_train_bwd_dw_kernel`)."""
    x, mb, weights, keep1, keep2 = res
    r, _, c = x.shape
    hd = c // heads
    npad = -(-n // 8) * 8
    wdtype = weights["wqkv"].dtype
    m = weights["wfc1"].shape[1]
    dw_shapes = _DW_SHAPES(c, m)
    acc_bytes = 4 * sum(int(np.prod(s)) for s in dw_shapes.values())
    tile, _, _ = _choose_tile(
        r, p_w, npad, c, heads, wdtype.itemsize,
        n_act_bufs=8,
        extra_weight_bytes=2 * c * m * wdtype.itemsize + acc_bytes,
        scratch_bytes_per_window=(npad * 10 * c * wdtype.itemsize * 3
                                  + heads * npad * npad * 4),
    )

    xp = jnp.pad(x, ((0, 0), (0, npad - n), (0, 0)))
    dyp = jnp.pad(dy, ((0, 0), (0, npad - n), (0, 0)))
    mbt = _expand_mb(mb, npad, tile, p_w, wdtype)
    wl = [weights[k] for k in _W_NAMES]
    full = lambda a: pl.BlockSpec(
        a.shape, lambda i, nd=a.ndim: (0,) * nd, memory_space=pltpu.VMEM)
    k1p = keep1.reshape(r, 1, 1)
    k2p = keep2.reshape(r, 1, 1)
    row = pl.BlockSpec((tile, 1, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    act = lambda lastdim: pl.BlockSpec(
        (tile, npad, lastdim), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    acc = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM)

    n_tiles = r // tile
    # 4x fwd flops: 3x recompute + ~1x dW GEMMs, all on the MXU in-kernel
    flops = r * (4 * (8 * n * c * c + 4 * n * n * c + 4 * n * c * m))
    cost = pl.CostEstimate(
        flops=flops,
        bytes_accessed=3 * r * npad * c * x.dtype.itemsize,
        transcendentals=2 * r * n * m,
    )
    outs = pl.pallas_call(
        functools.partial(_train_bwd_dw_kernel, heads=heads, n_valid=n,
                          scale=hd**-0.5),
        out_shape=(
            jax.ShapeDtypeStruct((r, npad, c), x.dtype),                 # dx
            jax.ShapeDtypeStruct((n_tiles, heads, npad, npad), jnp.float32),
        ) + tuple(jax.ShapeDtypeStruct(dw_shapes[k], jnp.float32)
                  for k in _W_NAMES),
        grid=(n_tiles,),
        in_specs=[
            act(c), act(c), _mb_spec(mbt, tile, heads, npad), row, row,
        ] + [full(a) for a in wl],
        out_specs=(
            act(c),
            pl.BlockSpec((1, heads, npad, npad), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ) + tuple(acc(dw_shapes[k]) for k in _W_NAMES),
        scratch_shapes=[
            pltpu.VMEM((tile, npad, 3 * c), x.dtype),  # qkv
            pltpu.VMEM((tile, npad, c), x.dtype),      # o
            pltpu.VMEM((tile, npad, 3 * c), x.dtype),  # dqkv
            pltpu.VMEM((tile, npad, c), x.dtype),      # do_full
            pltpu.VMEM((heads * tile, npad, npad), jnp.float32),  # probs
        ],
        cost_estimate=cost,
        interpret=interpret,
        compiler_params=kernel_compiler_params(),
    )(xp, dyp, mbt, k1p, k2p, *wl)
    dx, dmb_tiles = outs[0], outs[1]
    dW = {k: v.astype(wdtype) for k, v in zip(_W_NAMES, outs[2:])}

    dmb_total = jnp.sum(dmb_tiles, axis=0)[:, :n, :n]
    dmb = jnp.zeros_like(mb).at[0].set(dmb_total.astype(mb.dtype))
    return (dx[:, :n, :], dmb, dW, jnp.zeros_like(keep1), jnp.zeros_like(keep2))


fused_block_train.defvjp(_fwd, _bwd)


def xla_block_reference(x, mb, weights, keep1, keep2, *, heads, n, p_w):
    """Pure-XLA forward with identical math, for parity tests."""
    r, _, c = x.shape
    hd = c // heads
    f32 = jnp.float32
    xh1, _ = _ln_stats(x.astype(f32))
    h1 = xh1 * weights["ln1s"].astype(f32) + weights["ln1b"].astype(f32)
    qkv = h1.reshape(r * n, c) @ weights["wqkv"].astype(f32) + weights["bqkv"].astype(f32)
    qkv = qkv.reshape(r, n, 3, heads, hd)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    scores = jnp.einsum("rqhd,rkhd->rhqk", q * hd**-0.5, k)
    mb_rows = mb[jnp.arange(r) % mb.shape[0]]  # (r, H, n, n)
    p = jax.nn.softmax(scores + mb_rows.astype(f32), axis=-1)
    o = jnp.einsum("rhqk,rkhd->rqhd", p, v).reshape(r, n, c)
    proj = o.reshape(r * n, c) @ weights["wproj"].astype(f32) + weights["bproj"].astype(f32)
    x2 = x.astype(f32) + keep1.astype(f32)[:, :, None] * proj.reshape(r, n, c)
    xh2, _ = _ln_stats(x2)
    h2 = xh2 * weights["ln2s"].astype(f32) + weights["ln2b"].astype(f32)
    f1 = h2.reshape(r * n, c) @ weights["wfc1"].astype(f32) + weights["bfc1"].astype(f32)
    g, _ = _gelu_and_grad(f1)
    f2 = g @ weights["wfc2"].astype(f32) + weights["bfc2"].astype(f32)
    y = x2 + keep2.astype(f32)[:, :, None] * f2.reshape(r, n, c)
    return y.astype(x.dtype)
