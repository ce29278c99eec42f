"""Fused LayerNorm + windowed MSA + residual Pallas kernel (TPU).

Computes, in ONE launch over window-major tokens,

    y   = proj(softmax(q k^T * scale + mb) v)   with q,k,v = qkv(LN(x))
    out = x + y

and returns BOTH ``y`` (the pre-residual attention branch — the CrossSwinBlock
passes it to the next view as the partner stream,
``multiTemporalViewEncoder.py:275,345-349``) and ``out``.

This is the attention half of :mod:`.swin_block` factored out for blocks whose
MLP half cannot live in the same kernel: the CrossSwinBlock (cross-view
attention interleaves between the halves) and the global temporal ViT at
C=768 (the full-block weight set exceeds the VMEM budget per tile, but the
4C^2 attention weights fit — the MLP half goes through
:func:`..ln_mlp.fused_ln_mlp`).

Same Mosaic-shaped structure as the whole-block kernel: full-width qkv and
output-projection matmuls through VMEM scratch, per-head attention via
lane-sliced ref loads, N padded to the sublane multiple with key masking.
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

from .swin_block import (_choose_tile, _hoisted_scores, _ln, attention_mode,
                         kernel_compiler_params, vmem_limit_bytes)


def supported(c: int, n: int, itemsize: int = 2) -> bool:
    """qkv+proj weights (4C^2) must fit the VMEM budget next to the row tiles."""
    if not _PALLAS_OK:
        return False
    return itemsize * 4 * c * c < 0.45 * vmem_limit_bytes() and n <= 64


def _attn_kernel(
    x_ref, mb_ref,
    lns_ref, lnb_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
    y_ref, out_ref, qkv_scr, o_scr, s_scr,
    *, heads, n_valid, scale,
):
    tile, npad, c = x_ref.shape
    hd = c // heads
    x = x_ref[:]
    dtype = x.dtype

    # full-width qkv/proj matmuls through VMEM scratch; per-head attention
    # reads lane slices (see ops/pallas/swin_block.py for the rationale)
    h1 = _ln(
        x.astype(jnp.float32), lns_ref[:].astype(jnp.float32),
        lnb_ref[:].astype(jnp.float32),
    ).astype(dtype)
    h2d = h1.reshape(tile * npad, c)
    # 3D scratches: per-head q/k/v is a pure lane-sliced REF load (see
    # swin_block._block_kernel — measured ~9% kernel win vs the 2D layout)
    qkv_scr[:] = (jax.lax.dot_general(
        h2d, wqkv_ref[:], (((1,), (0,)), ((), ())),
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
    y = (jax.lax.dot_general(
        o_scr[:].reshape(tile * npad, c), wproj_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bproj_ref[:].astype(jnp.float32)).astype(dtype)
    y = y.reshape(tile, npad, c)
    y_ref[:] = y
    out_ref[:] = x + y


def prepare_attn_weights(weights, mask_bias, *, heads: int, r: int):
    """Kernel-ready operands: per-head q/k/v/proj splits and the padded/tiled
    additive term (see :func:`..swin_block.prepare_weights`)."""
    c = weights["qkv_kernel"].shape[0]
    hd = c // heads
    n = mask_bias.shape[-1]
    npad = -(-n // 8) * 8
    p_w = mask_bias.shape[0]
    wdtype = weights["qkv_kernel"].dtype
    _, reps, _ = _choose_tile(
        r, p_w, npad, c, heads, wdtype.itemsize, n_act_bufs=3,
        scratch_bytes_per_window=(npad * 4 * c * wdtype.itemsize
                                  + heads * npad * npad * 4),
    )

    mb = mask_bias.astype(wdtype)
    # key-PAD columns carry -1e30: the additive term doubles as the pad mask
    # (see swin_block.prepare_weights / _hoisted_scores)
    mb = jnp.pad(mb, ((0, 0), (0, 0), (0, npad - n), (0, 0)))
    mb = jnp.pad(mb, ((0, 0), (0, 0), (0, 0), (0, npad - n)),
                 constant_values=-1e30)
    if p_w > 1 and reps > 1:
        mb = jnp.tile(mb, (reps, 1, 1, 1))
    mb = mb.transpose(1, 0, 2, 3)  # (H, tile_w or 1, npad, npad)

    w = weights
    return {
        "mb": mb,
        "lns": w["ln_scale"].reshape(1, c), "lnb": w["ln_bias"].reshape(1, c),
        "wqkv": w["qkv_kernel"], "bqkv": w["qkv_bias"].reshape(1, 3 * c),
        "wproj": w["proj_kernel"],
        "bproj": w["proj_bias"].reshape(1, c),
    }


_WL_ORDER = ("lns", "lnb", "wqkv", "bqkv", "wproj", "bproj")


@functools.partial(jax.jit, static_argnames=("heads", "n", "p_w", "interpret"))
def fused_attn_ln_prepared(x, prepared, *, heads: int, n: int, p_w: int,
                           interpret: bool = False):
    """(R, N, C) window tokens -> (y, x + y); operands from
    :func:`prepare_attn_weights` (``p_w`` = additive-term period in windows)."""
    r, _, c = x.shape
    hd = c // heads
    scale = hd**-0.5
    npad = -(-n // 8) * 8
    tile, _, _ = _choose_tile(
        r, p_w, npad, c, heads, prepared["wqkv"].dtype.itemsize, n_act_bufs=3,
        scratch_bytes_per_window=(npad * 4 * c * prepared["wqkv"].dtype.itemsize
                                  + heads * npad * npad * 4),
    )
    mbw = prepared["mb"].shape[1]
    if mbw == 1:
        mb_block, mb_index = 1, (lambda i: (0, 0, 0, 0))
    else:
        if mbw % tile != 0:
            # ValueError, not assert: a mismatched prepared batch would read
            # wrong mask rows, and asserts are stripped under python -O.
            raise ValueError(
                f"prepared additive term tiled for a different batch (mb rows "
                f"{mbw}, tile {tile}): re-run prepare_for_inference at this "
                "batch size")
        nb = mbw // tile
        mb_block, mb_index = tile, (lambda i, nb=nb: (0, i % nb, 0, 0))

    xp = jnp.pad(x, ((0, 0), (0, npad - n), (0, 0)))
    wl = [prepared[k] for k in _WL_ORDER]
    full = lambda a: pl.BlockSpec(
        a.shape, lambda i, nd=a.ndim: (0,) * nd, memory_space=pltpu.VMEM)

    flops = r * (8 * n * c * c + 4 * n * n * c)
    weight_bytes = sum(int(np.prod(a.shape)) * a.dtype.itemsize for a in wl)
    cost = pl.CostEstimate(
        flops=flops,
        bytes_accessed=3 * r * npad * c * x.dtype.itemsize
        + (r // tile) * weight_bytes,
        transcendentals=r * n * n,
    )

    tile_spec = pl.BlockSpec((tile, npad, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    y, out = pl.pallas_call(
        functools.partial(_attn_kernel, heads=heads, n_valid=n, scale=scale),
        out_shape=(
            jax.ShapeDtypeStruct((r, npad, c), x.dtype),
            jax.ShapeDtypeStruct((r, npad, c), x.dtype),
        ),
        grid=(r // tile,),
        in_specs=[
            tile_spec,
            pl.BlockSpec((heads, mb_block, npad, npad), mb_index, memory_space=pltpu.VMEM),
        ] + [full(a) for a in wl],
        out_specs=(tile_spec, tile_spec),
        scratch_shapes=[
            pltpu.VMEM((tile, npad, 3 * c), x.dtype),
            pltpu.VMEM((tile, npad, c), x.dtype),
            pltpu.VMEM((heads * tile, npad, npad), jnp.float32),  # scores/probs
        ],
        cost_estimate=cost,
        interpret=interpret,
        compiler_params=kernel_compiler_params(),
    )(xp, prepared["mb"], *wl)
    return y[:, :n, :], out[:, :n, :]


def fused_attn_ln(x, mask_bias, weights, *, heads: int, interpret: bool = False):
    """Convenience entry: prepare operands inline, then run the kernel.

    x: (R, N, C) window tokens; mask_bias: (P, H, N, N) additive term (period P
    in windows; pass zeros (1, H, N, N) for bias-free attention); weights: dict
    with ln (scale, bias), qkv (C,3C)+(3C,), proj (C,C)+(C,).
    """
    prepared = prepare_attn_weights(weights, mask_bias, heads=heads, r=x.shape[0])
    return fused_attn_ln_prepared(
        x, prepared, heads=heads, n=x.shape[1], p_w=mask_bias.shape[0],
        interpret=interpret,
    )
