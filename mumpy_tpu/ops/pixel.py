"""Pixel shuffle / pooling primitives with torch layout parity (channels-last).

Reference usages: ``nn.PixelShuffle(2)`` (ECRE, ``models/decoder/decoder.py:128``),
``DAP = PixelShuffle(2) + AvgPool2d(2)`` (``decoder.py:140-143``), and the
``AvgPool2d(2, 2)`` stages of the frequency pyramid (``decoder.py:147-181``).
Torch orders pixel-shuffle input channels as ``c * r^2 + i * r + j``; we keep the same
index semantics on the trailing NHWC axis so ported weights line up.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
from jax import lax

__all__ = ["pixel_shuffle", "avg_pool_2d", "dap_pool"]


def pixel_shuffle(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """(B, H, W, C*r^2) -> (B, H*r, W*r, C), torch channel ordering."""
    b, h, w, crr = x.shape
    c = crr // (r * r)
    x = x.reshape(b, h, w, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # b, h, i, w, j, c
    return x.reshape(b, h * r, w * r, c)


def avg_pool_2d(x: jnp.ndarray, k: int, stride: int | None = None) -> jnp.ndarray:
    """Average pooling over NHWC spatial dims (no padding).

    The common non-overlapping divisible case runs as reshape+mean —
    ``reduce_window_sum`` measured 2.9 ms/step of the batch-32 serving trace
    where the reshape form fuses into neighbors; the general case falls back
    to ``lax.reduce_window``."""
    import os

    stride = stride or k
    b, h, w, c = x.shape
    fast = os.environ.get("MUMPY_DECODER_FAST", "1") not in ("0", "off")
    if fast and stride == k and h % k == 0 and w % k == 0:
        # k*k strided slices summed in the INPUT dtype: one fused elementwise
        # pass over x.  (reduce_window was 2.9 ms/step of the batch-32 serving
        # trace; the reshape+jnp.mean form was no better — XLA converts the
        # whole bf16 array to f32 to reduce it, a 3.5 ms/step copy.)
        acc = x[:, 0::k, 0::k, :]
        for i in range(k):
            for j in range(k):
                if i or j:
                    acc = acc + x[:, i::k, j::k, :]
        return acc * jnp.asarray(1.0 / (k * k), x.dtype)
    y = lax.reduce_window(
        x, 0.0, lax.add, (1, k, k, 1), (1, stride, stride, 1), "VALID"
    )
    return y / (k * k)


def dap_pool(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """``avg_pool_2d(pixel_shuffle(x, k), k)`` without the spatial round-trip.

    The DAP head (reference ``decoder.py:139``) shuffles channels out to a
    k-times-finer grid and immediately average-pools them back, so the k*k
    values averaged at cell (h, w) are exactly the k*k channel-block values at
    cell (h, w): the composite is a per-pixel mean over channel sub-groups
    (torch channel order c*k*k + i*k + j -> sub-group index m = i*k + j maps
    to the lane-strided slice ``x[..., m::k*k]``).  The full-resolution
    pixel-shuffle transpose never materializes.
    """
    import os

    if os.environ.get("MUMPY_DECODER_FAST", "1") in ("0", "off"):
        return avg_pool_2d(pixel_shuffle(x, k), k)
    kk = k * k
    if os.environ.get("MUMPY_DAP_FORM") == "strided":  # ab_bench "dapstrided"
        acc = x[..., 0::kk]
        for m in range(1, kk):
            acc = acc + x[..., m::kk]
        return acc * jnp.asarray(1.0 / kk, x.dtype)
    # out[..., t] = mean(x[..., t*kk:(t+1)*kk]): a contiguous channel-block
    # mean.  Lane-STRIDED slices (x[..., m::kk]) lower to mini-gather-slice on
    # TPU (1.2 ms/step of the batch-32 serving trace at the full-res DAP); the
    # tiny dense averaging matmul stays on the MXU and fuses with neighbors.
    return x @ jnp.asarray(_block_mean_matrix(x.shape[-1], kk), x.dtype)


@functools.lru_cache(maxsize=None)
def _block_mean_matrix(c: int, kk: int):
    import numpy as np

    p = np.zeros((c, c // kk), dtype=np.float32)
    p[np.arange(c), np.arange(c) // kk] = 1.0 / kk
    return p
