"""Bilinear resize with PyTorch semantics, expressed as interpolation-matrix matmuls.

The reference decoder mixes two flavours of ``nn.Upsample(mode="bilinear")``:
``align_corners=True`` (reference ``models/decoder/decoder.py:72,79,86,93``) and the
default ``align_corners=False`` (``decoder.py:10,136-137``).  ``jax.image.resize``
matches neither exactly, so we build the 1-D interpolation operator for each axis as
a dense ``(out, in)`` matrix (computed once per static shape in numpy) and apply it
with two matmuls.  On TPU this turns resampling into MXU work that XLA fuses with the
surrounding convolutions, and it is bit-accurate against torch's CPU kernels.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

__all__ = ["resize_bilinear", "upsample_2d"]


@functools.lru_cache(maxsize=None)
def _interp_matrix(in_size: int, out_size: int, align_corners: bool) -> np.ndarray:
    """Dense 1-D bilinear interpolation operator of shape (out_size, in_size).

    Follows torch's ``area_pixel_compute_source_index``: for align_corners=True the
    source coordinate is ``dst * (in-1)/(out-1)``; otherwise ``(dst+0.5)*in/out - 0.5``
    clamped below at 0 (torch clamps the negative overhang rather than reflecting).
    """
    m = np.zeros((out_size, in_size), dtype=np.float64)
    if in_size == 1:
        m[:, 0] = 1.0
        return m.astype(np.float32)
    for o in range(out_size):
        if align_corners:
            src = o * (in_size - 1) / (out_size - 1) if out_size > 1 else 0.0
        else:
            src = max((o + 0.5) * in_size / out_size - 0.5, 0.0)
        i0 = min(int(np.floor(src)), in_size - 1)
        i1 = min(i0 + 1, in_size - 1)
        frac = src - i0
        m[o, i0] += 1.0 - frac
        m[o, i1] += frac
    return m.astype(np.float32)


def resize_bilinear(x: jnp.ndarray, out_hw: tuple[int, int], align_corners: bool) -> jnp.ndarray:
    """Bilinear resize of an NHWC tensor to ``out_hw`` with torch semantics."""
    h_out, w_out = out_hw
    b, h_in, w_in, c = x.shape
    if (h_in, w_in) == (h_out, w_out):
        return x
    mh = jnp.asarray(_interp_matrix(h_in, h_out, align_corners))
    mw = jnp.asarray(_interp_matrix(w_in, w_out, align_corners))
    # (B,H,W,C): contract H then W. einsum keeps everything on the MXU.
    y = jnp.einsum("oh,bhwc->bowc", mh.astype(x.dtype), x)
    y = jnp.einsum("ow,bhwc->bhoc", mw.astype(x.dtype), y)
    return y


def upsample_2d(x: jnp.ndarray, scale: int, align_corners: bool = False) -> jnp.ndarray:
    """``nn.Upsample(scale_factor=scale, mode='bilinear')`` for NHWC tensors."""
    _, h, w, _ = x.shape
    return resize_bilinear(x, (h * scale, w * scale), align_corners)
