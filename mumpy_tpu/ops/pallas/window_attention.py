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


_FORCED_MODE = None  # test hook: None (auto) | "off" | "interpret" | "compiled"


def set_mode(mode):
    """Force the kernel dispatch mode (tests use "interpret" on CPU)."""
    global _FORCED_MODE
    _FORCED_MODE = mode


def attention_mode() -> str:
    """How model code should run window attention: "compiled" pallas on TPU,
    "interpret" (forced, tests), or "off" (pure-XLA einsum path).

    Measured on a v5e chip (batch 8, bf16, full 224^2 model), XLA's own fusion of
    the einsum attention is ~15% faster end-to-end than this kernel (18.1k vs
    15.7k frames/s) — the 49-token windows are too small for a hand kernel to beat
    the compiler.  The default is therefore the XLA path; set MUMPY_PALLAS=on to
    opt into the fused kernel.
    """
    if _FORCED_MODE is not None:
        return _FORCED_MODE
    import os

    env = os.environ.get("MUMPY_PALLAS", "off")
    if env in ("0", "off", "auto"):
        return "off"
    if env == "interpret":
        return "interpret"
    if not _PALLAS_OK:
        return "off"
    try:
        platform = jax.devices()[0].platform
    except Exception:
        return "off"
    return "compiled" if platform in ("tpu", "axon") else "off"


def enabled() -> bool:
    return attention_mode() != "off"


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, out_ref, *, scale, n_valid):
    # matmuls run on the inputs' native dtype (bf16 on the inference path) with
    # f32 MXU accumulation; only the softmax itself is f32
    q = q_ref[:]
    k = k_ref[:]
    v = v_ref[:]
    scores = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # (TILE, N_PAD, N_PAD) f32
    scores = scores * scale + bias_ref[:].astype(jnp.float32)
    npad = scores.shape[-1]
    key_ids = jax.lax.broadcasted_iota(jnp.int32, (npad, npad), dimension=1)
    scores = jnp.where(key_ids[None] < n_valid, scores, -1e30)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(v.dtype)
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

    # Tile selection targets ~64 rows/step so VMEM stays well under the 16MB
    # scoped limit (q/k/v/out blocks + the (tile, npad, npad) bias block and
    # score temps, double-buffered).  Two regimes:
    #  * small period: tile = multiple of the period; one pre-tiled bias block
    #    is reused by every grid step (index_map -> 0).
    #  * large period (e.g. windows*heads = 768 at stage 0): tile = divisor of
    #    the period; the bias block is selected per grid step by periodic
    #    indexing, never materializing period*npad^2 rows in VMEM at once.
    # 64 rows/step keeps the worst case (f32 bias + score temps, double-buffered
    # q/k/v/out) under the 16MB scoped-VMEM limit for both f32 and bf16 inputs
    target = 64
    if p_period <= target:
        tile = p_period * max(1, target // p_period)
        while r % tile != 0:
            tile -= p_period
        reps = tile // p_period
        bias_blocks = 1
    else:
        tile = next(t for t in range(target, 0, -1) if p_period % t == 0)
        reps = 1
        bias_blocks = p_period // tile

    def pad_rows(x):
        return jnp.pad(x, ((0, 0), (0, npad - n), (0, 0)))

    qp, kp, vp = pad_rows(q), pad_rows(k), pad_rows(v)
    biasp = jnp.pad(bias, ((0, 0), (0, npad - n), (0, npad - n)))
    if reps > 1:
        biasp = jnp.tile(biasp, (reps, 1, 1))  # (tile, npad, npad)

    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, n_valid=n),
        out_shape=jax.ShapeDtypeStruct((r, npad, d), q.dtype),
        grid=(r // tile,),
        in_specs=[
            pl.BlockSpec((tile, npad, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, npad, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, npad, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (tile, npad, npad),
                lambda i, nb=bias_blocks: (i % nb, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec((tile, npad, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(qp, kp, vp, biasp)
    return out[:, :n, :]


@jax.custom_vjp
def window_attention_ad(q, k, v, bias):
    """Differentiable fused window attention.

    Forward is the Pallas kernel; backward recomputes the (small, VMEM-sized)
    per-window softmax in plain XLA — the score matrices are 49x56-token tiles,
    so the recompute is cheap and keeps the kernel single-purpose.
    Signature matches :func:`fused_window_attention`.
    """
    interpret = attention_mode() == "interpret"
    return fused_window_attention(q, k, v, bias, interpret=interpret)


def _softmax_rows(q, k, bias):
    r = q.shape[0]
    scale = q.shape[-1] ** -0.5
    reps = r // bias.shape[0]
    bias_rows = jnp.tile(bias, (reps, 1, 1))
    scores = (
        jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
        * scale + bias_rows.astype(jnp.float32)
    )
    return jax.nn.softmax(scores, axis=-1)


def _ad_fwd(q, k, v, bias):
    return window_attention_ad(q, k, v, bias), (q, k, v, bias)


def _ad_bwd(res, g):
    q, k, v, bias = res
    scale = q.shape[-1] ** -0.5
    p = _softmax_rows(q, k, bias)
    g32 = g.astype(jnp.float32)
    dv = jax.lax.dot_general(p, g32, (((1,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(g32, v.astype(jnp.float32),
                             (((2,), (2,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jax.lax.dot_general(ds, k.astype(jnp.float32),
                             (((2,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32) * scale
    dk = jax.lax.dot_general(ds, q.astype(jnp.float32),
                             (((1,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32) * scale
    reps = q.shape[0] // bias.shape[0]
    dbias = ds.reshape((reps,) + bias.shape).sum(0)
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            dbias.astype(bias.dtype))


window_attention_ad.defvjp(_ad_fwd, _ad_bwd)
