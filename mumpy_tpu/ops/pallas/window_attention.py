"""Fused window attention Pallas kernel (TPU).

The hot loop of the encoder is window attention over thousands of 49-token windows
(``swinTransformer.py:142-163``; 48 transformer blocks run it).  The XLA path
materializes the (B*nW*heads, 49, 49) attention tensor in HBM between the two
matmuls; this kernel keeps scores in VMEM and fuses

    scores = q @ k^T * scale + bias (+ window mask)
    p = softmax(scores)
    out = p @ v

for a tile of (window, head) pairs per grid step.  N is padded to a sublane
multiple; padded keys are masked out of the softmax.

The additive term (relative-position bias, optionally + shifted-window mask) varies
along the flattened (window, head) axis with a fixed period, so it is pre-tiled to
one tile's worth of rows and reused by every grid step.
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


def enabled() -> bool:
    if not _PALLAS_OK:
        return False
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, out_ref, *, scale, n_valid):
    q = q_ref[:].astype(jnp.float32)
    k = k_ref[:].astype(jnp.float32)
    v = v_ref[:].astype(jnp.float32)
    scores = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # (TILE, N_PAD, N_PAD)
    scores = scores * scale + bias_ref[:].astype(jnp.float32)
    npad = scores.shape[-1]
    key_ids = jax.lax.broadcasted_iota(jnp.int32, (npad, npad), dimension=1)
    scores = jnp.where(key_ids[None] < n_valid, scores, -1e30)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    out = jax.lax.dot_general(
        p, v, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    out_ref[:] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_window_attention(q, k, v, bias, interpret: bool = False):
    """Attention over independent windows with a periodic additive bias.

    q, k, v: (R, N, D) where R = batch * windows * heads (row-major, heads fastest).
    bias: (P, N, N) additive term with period P along R (R % P == 0) — e.g.
    per-head relative-position bias (P = heads) or head x window bias + shifted
    mask (P = windows * heads).

    Returns (R, N, D).
    """
    r, n, d = q.shape
    p_period = bias.shape[0]
    assert r % p_period == 0, (r, p_period)
    scale = d**-0.5
    npad = -(-n // 8) * 8

    # tile: multiple of the bias period, targeting ~64 rows per grid step
    tile = p_period * max(1, 64 // p_period)
    while r % tile != 0:
        tile -= p_period
    reps = tile // p_period

    def pad_rows(x):
        return jnp.pad(x, ((0, 0), (0, npad - n), (0, 0)))

    qp, kp, vp = pad_rows(q), pad_rows(k), pad_rows(v)
    biasp = jnp.pad(bias, ((0, 0), (0, npad - n), (0, npad - n)))
    bias_tile = jnp.tile(biasp, (reps, 1, 1))  # (tile, npad, npad)

    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, n_valid=n),
        out_shape=jax.ShapeDtypeStruct((r, npad, d), q.dtype),
        grid=(r // tile,),
        in_specs=[
            pl.BlockSpec((tile, npad, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, npad, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, npad, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, npad, npad), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, npad, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(qp, kp, vp, bias_tile)
    return out[:, :n, :]
