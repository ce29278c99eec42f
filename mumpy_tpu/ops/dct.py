"""DCT band-pass frequency features (FAF branch).

Reference: ``models/modules/dct.py``.  The frequency branch computes a type-II DCT of
each frame (a 224x224 matmul sandwich), masks three triangular frequency bands, and
inverse-transforms each band.  On TPU these are six extra 224x224 matmuls per band —
pure MXU work.  Band bounds copy the reference's arithmetic exactly:
low [0, size//2.82], mid [size//2.82, size//2], high [size, 2*size]
(``dct.py:66-68``) — a pixel (i, j) passes when ``start <= i + j <= end``.

The reference hardcodes ``.cuda()`` (``dct.py:16,61-62``); here the matrices are
ordinary device-agnostic constants.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

__all__ = ["dct_matrix", "band_filters", "faf"]


@functools.lru_cache(maxsize=None)
def dct_matrix(size: int) -> np.ndarray:
    """Orthonormal type-II DCT matrix D with y = D @ x @ D.T (``dct.py:42-45``)."""
    i = np.arange(size)[:, None]
    j = np.arange(size)[None, :]
    m = np.sqrt(2.0 / size) * np.cos((j + 0.5) * np.pi * i / size)
    m[0, :] = np.sqrt(1.0 / size)
    return m.astype(np.float32)


@functools.lru_cache(maxsize=None)
def band_filters(size: int) -> np.ndarray:
    """(3, size, size) binary masks for the low/mid/high bands (``dct.py:48-49,66-68``).

    The reference floor-divides: ``size // 2.82`` = 79.0 for 224, so the
    ``i + j == 79`` anti-diagonal belongs to BOTH the low and mid bands."""
    bounds = [(0.0, size // 2.82), (size // 2.82, size // 2), (float(size), 2.0 * size)]
    i = np.arange(size)[:, None]
    j = np.arange(size)[None, :]
    s = i + j
    masks = [((s >= lo) & (s <= hi)).astype(np.float32) for lo, hi in bounds]
    return np.stack(masks, axis=0)


def faf(x: jnp.ndarray) -> jnp.ndarray:
    """Frequency features of frames ``x`` (..., H, W, C) -> (..., H, W, 3*C).

    Per input channel emits one channel per band, ordered band-major to match the
    reference's channel concatenation (``dct.py:74-78``).
    """
    size = x.shape[-2]
    d = jnp.asarray(dct_matrix(size), dtype=x.dtype)
    masks = jnp.asarray(band_filters(size), dtype=x.dtype)
    freq = jnp.einsum("ih,...hwc->...iwc", d, x)
    freq = jnp.einsum("jw,...iwc->...ijc", d, freq)  # D x D^T over (H, W)
    banded = freq[..., None, :, :, :] * masks[:, :, :, None]  # (..., 3, H, W, C)
    # inverse per band: D^T (M * F) D
    y = jnp.einsum("ih,...iwc->...hwc", d, banded)  # rows: D^T @ .
    y = jnp.einsum("jw,...hjc->...hwc", d, y)  # cols: . @ D
    # (..., 3, H, W, C) -> (..., H, W, 3*C) band-major channel order
    y = jnp.moveaxis(y, -4, -2)  # (..., H, W, 3, C)
    shape = y.shape[:-2] + (y.shape[-2] * y.shape[-1],)
    return y.reshape(shape)
