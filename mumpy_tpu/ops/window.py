"""Window partition/reverse and shifted-window attention masks.

TPU-native counterparts of the reference's window utilities
(``models/modules/swinTransformer.py:54-83`` and the mask construction at
``swinTransformer.py:233-254``).  Everything is a static reshape/transpose, which XLA
lowers to free layout changes; the shifted-window mask is precomputed in numpy once
per static (H, W, window, shift) signature.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

__all__ = ["window_partition", "window_reverse", "shifted_window_mask"]


def window_partition(x: jnp.ndarray, window: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B * nH * nW, window, window, C), row-major window order."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // window, window, w // window, window, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, window, window, c)


def window_reverse(windows: jnp.ndarray, window: int, h: int, w: int) -> jnp.ndarray:
    """Inverse of :func:`window_partition`; returns (B, H, W, C)."""
    c = windows.shape[-1]
    b = windows.shape[0] // (h * w // window // window)
    x = windows.reshape(b, h // window, w // window, window, window, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, c)


@functools.lru_cache(maxsize=None)
def _mask_np(h: int, w: int, window: int, shift: int) -> np.ndarray:
    img = np.zeros((h, w), dtype=np.int32)
    slices = (slice(0, -window), slice(-window, -shift), slice(-shift, None))
    cnt = 0
    for hs in slices:
        for ws in slices:
            img[hs, ws] = cnt
            cnt += 1
    img = img.reshape(h // window, window, w // window, window)
    img = img.transpose(0, 2, 1, 3).reshape(-1, window * window)  # (nW, ws*ws)
    diff = img[:, None, :] - img[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def shifted_window_mask(h: int, w: int, window: int, shift: int) -> jnp.ndarray:
    """Additive (0 / -100) attention mask of shape (nW, window^2, window^2).

    ``h`` already includes any temporal folding (the reference builds the mask over a
    ``(T*H, W)`` grid, ``swinTransformer.py:236``).
    """
    return jnp.asarray(_mask_np(h, w, window, shift))
