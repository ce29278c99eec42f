"""Fused whole-layer kernel for the global temporal ViT (n=3 tokens).

The global temporal encoder (``multiTemporalViewEncoder.py:657-746``) runs a
12-layer ViT over sequences of n=3 temporal slices with the 49 spatial tokens
folded into the batch: rows (B*49, 3, 768).  The generic whole-block kernel
(``swin_block.py``) was measured and REJECTED here — its attention pads the
token axis 3 -> 8 (2.7x wasted score/probability work) and per-head (n, n)
matmuls at n=3 are pure overhead (PERF.md "vit whole-block kernel").

This kernel is specialized to tiny n: tokens live TIME-MAJOR as three
full-width (R, C) slabs, and the 3x3 attention is unrolled over (i, j) token
pairs so it never materializes an (n, n) score matrix:

* per-head scores  ``s_ij[h] = sum_lanes(q_i * k_j, head h)``  via ONE tiny
  matmul with a constant (C, H) block-diagonal reducer (lane l -> head l//hd);
* softmax over j is three (R, H) element-wise ops;
* ``out_i = sum_j expand(p_ij) * v_j`` where ``expand`` is the transposed
  reducer (H, C) — a second tiny matmul broadcasts each head's probability
  across its hd lanes.

Everything flop-heavy (qkv / proj / fc1 / fc2) is a full-width MXU matmul on
(tile, C) rows, exactly like the other fused kernels.  The time-major layout
means zero transposes anywhere in the 12-layer stack: the encoder keeps the
carry as (3, R, C) and the final channel concat is a lane concat of the three
slabs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .swin_block import (
    _PALLAS_OK,
    _erf,
    _ln,
    attention_mode,
    kernel_compiler_params,
    vmem_limit_bytes,
)

if _PALLAS_OK:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu


def supported(c: int, mlp_hidden: int, heads: int, itemsize: int = 2) -> bool:
    """Kernel eligibility: full weight set resident in VMEM, heads divide C."""
    if not _PALLAS_OK:
        return False
    weights = itemsize * (4 * c * c + 2 * c * mlp_hidden)
    return c % heads == 0 and weights < 0.45 * vmem_limit_bytes()


def _choose_tile(r: int, c: int, itemsize: int,
                 per_buf_cap: int = 786_432) -> int:
    """Largest row tile that divides R, is sublane-aligned, and keeps each
    pipelined (3, tile, C) activation buffer under the per-buffer cap
    (PERF.md: caps beyond ~768KB lose double-buffer overlap)."""
    import os

    cap_env = os.environ.get("MUMPY_PER_BUF_CAP_KB")
    if cap_env:
        per_buf_cap = int(cap_env) * 1024
    align = 16 if itemsize == 2 else 8
    best = None
    for t in range(align, r + 1, align):
        if r % t == 0 and 3 * t * c * itemsize <= per_buf_cap:
            best = t
    # no aligned divisor (tiny test shapes): single grid step, Mosaic pads
    return best if best is not None else r


def _vit3_kernel(
    x_ref,
    ln1s_ref, ln1b_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
    ln2s_ref, ln2b_ref, wfc1_ref, bfc1_ref, wfc2_ref, bfc2_ref,
    red_ref, exp_ref,
    out_ref, qkv_scr, y_scr,
    *, scale,
):
    _, tile, c = x_ref.shape
    dtype = x_ref.dtype

    # ---- qkv for all three tokens: full-width (tile, C) @ (C, 3C) ----
    for t in range(3):
        h = _ln(
            x_ref[t].astype(jnp.float32), ln1s_ref[:].astype(jnp.float32),
            ln1b_ref[:].astype(jnp.float32),
        ).astype(dtype)
        qkv_scr[t] = (jax.lax.dot_general(
            h, wqkv_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bqkv_ref[:].astype(jnp.float32)).astype(dtype)

    # ---- unrolled 3x3 attention ----
    red = red_ref[:]  # (C, H) f32 block-diagonal head reducer
    exp_m = exp_ref[:]  # (H, C) f32 head-lane expander
    for i in range(3):
        qi = qkv_scr[i, :, :c].astype(jnp.float32) * scale
        e = []
        for j in range(3):
            kj = qkv_scr[j, :, c:2 * c].astype(jnp.float32)
            # per-head q.k: one (tile, C) x (C, H) matmul sums each head's
            # hd-lane product block (no (n, n) scores, no pad rows)
            e.append(jax.lax.dot_general(
                qi * kj, red, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ))
        m = jnp.maximum(jnp.maximum(e[0], e[1]), e[2])
        p = [jnp.exp(ej - m) for ej in e]
        inv = 1.0 / (p[0] + p[1] + p[2])
        o = None
        for j in range(3):
            # expand (tile, H) -> (tile, C) broadcasting each head over its
            # hd lanes, then weight v_j element-wise
            pj = jax.lax.dot_general(
                p[j] * inv, exp_m, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            vj = qkv_scr[j, :, 2 * c:].astype(jnp.float32)
            o = pj * vj if o is None else o + pj * vj
        proj = jax.lax.dot_general(
            o.astype(dtype), wproj_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bproj_ref[:].astype(jnp.float32)
        y_scr[i] = x_ref[i] + proj.astype(dtype)

    # ---- MLP tails, chunked like the whole-block kernel ----
    mlp_hidden = wfc1_ref.shape[1]
    rc = max(8, (2_000_000 // (mlp_hidden * 4)) // 8 * 8)
    for t in range(3):
        for j in range(0, tile, rc):
            cc = min(rc, tile - j)
            ys = y_scr[t, j:j + cc]
            h2 = _ln(
                ys.astype(jnp.float32), ln2s_ref[:].astype(jnp.float32),
                ln2b_ref[:].astype(jnp.float32),
            ).astype(dtype)
            f1 = jax.lax.dot_general(
                h2, wfc1_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + bfc1_ref[:].astype(jnp.float32)
            g = (0.5 * f1 * (1.0 + _erf(f1 * 0.7071067811865476))).astype(dtype)
            f2 = jax.lax.dot_general(
                g, wfc2_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + bfc2_ref[:].astype(jnp.float32)
            out_ref[t, j:j + cc] = ys + f2.astype(dtype)


def prepare_vit3_weights(weights, *, heads: int):
    """Kernel-ready operands: reshaped biases + the constant head reducer /
    expander matrices (built once and captured in the "prepared" collection)."""
    c = weights["qkv_kernel"].shape[0]
    hd = c // heads
    red = (np.arange(c)[:, None] // hd == np.arange(heads)[None, :])
    red = jnp.asarray(red, jnp.float32)
    w = weights
    return {
        "ln1s": w["ln1_scale"].reshape(1, c), "ln1b": w["ln1_bias"].reshape(1, c),
        "wqkv": w["qkv_kernel"], "bqkv": w["qkv_bias"].reshape(1, 3 * c),
        "wproj": w["proj_kernel"], "bproj": w["proj_bias"].reshape(1, c),
        "ln2s": w["ln2_scale"].reshape(1, c), "ln2b": w["ln2_bias"].reshape(1, c),
        "wfc1": w["fc1_kernel"], "bfc1": w["fc1_bias"].reshape(1, -1),
        "wfc2": w["fc2_kernel"], "bfc2": w["fc2_bias"].reshape(1, c),
        "red": red, "exp": red.T,
    }


_WL_ORDER = ("ln1s", "ln1b", "wqkv", "bqkv", "wproj", "bproj",
             "ln2s", "ln2b", "wfc1", "bfc1", "wfc2", "bfc2", "red", "exp")


@functools.partial(jax.jit, static_argnames=("heads", "interpret"))
def fused_vit3_prepared(x, prepared, *, heads: int, interpret: bool = False):
    """One full ViT layer on time-major tokens.

    x: (3, R, C) — three temporal-slice slabs of R = B*49 rows each.
    prepared: output of :func:`prepare_vit3_weights`.
    Returns (3, R, C).
    """
    three, r, c = x.shape
    if three != 3:
        raise ValueError(f"vit3 kernel is specialized to 3 tokens, got {three}")
    scale = (c // heads) ** -0.5
    tile = _choose_tile(r, c, x.dtype.itemsize)
    wl = [prepared[k] for k in _WL_ORDER]
    full = lambda a: pl.BlockSpec(
        a.shape, lambda i, nd=a.ndim: (0,) * nd, memory_space=pltpu.VMEM)

    m = prepared["wfc1"].shape[1]
    flops = 3 * r * (2 * c * 3 * c + 2 * c * c + 4 * c * m) + 18 * r * 2 * c * heads
    weight_bytes = sum(int(np.prod(a.shape)) * a.dtype.itemsize for a in wl)
    cost = pl.CostEstimate(
        flops=flops,
        bytes_accessed=2 * 3 * r * c * x.dtype.itemsize
        + (r // tile) * weight_bytes,
        transcendentals=3 * r * m,
    )

    return pl.pallas_call(
        functools.partial(_vit3_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((3, r, c), x.dtype),
        grid=(r // tile,),
        in_specs=[
            pl.BlockSpec((3, tile, c), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ] + [full(a) for a in wl],
        out_specs=pl.BlockSpec((3, tile, c), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((3, tile, 3 * c), x.dtype),  # qkv slabs
            pltpu.VMEM((3, tile, c), x.dtype),      # post-attention residual
        ],
        cost_estimate=cost,
        interpret=interpret,
        compiler_params=kernel_compiler_params(),
    )(x, *wl)
