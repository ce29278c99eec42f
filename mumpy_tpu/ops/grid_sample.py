"""Bilinear grid sampling (``F.grid_sample`` parity) for the deformable CVA.

The reference samples each 7x7 key window at offset positions with
``F.grid_sample(..., mode='bilinear', align_corners=True)``
(``models/modules/deformableAttention.py:353-358``).  Windows are tiny (7x7), so a
gather-free formulation is used: for each of the 49 sample points we build bilinear
weights over the 49 source pixels and contract with one matmul.  That keeps the op on
the MXU with static shapes instead of performing 4 scattered gathers per point.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["grid_sample_bilinear"]


def _axis_weights(coord: jnp.ndarray, size: int) -> jnp.ndarray:
    """Per-sample bilinear weights along one axis.

    coord: (..., N) absolute pixel coordinate (already unnormalized).
    Returns (..., N, size) weights; out-of-range contributions get zero weight,
    matching ``padding_mode='zeros'``.
    """
    idx = jnp.arange(size, dtype=coord.dtype)
    i0 = jnp.floor(coord)
    frac = coord - i0
    d0 = idx[None, :] - i0[..., None]  # (..., N, size): offset of each src pixel from floor
    # Source pixels outside [0, size-1] simply never match d0 in {0, 1}, which yields
    # exactly the zero-padding contribution of torch's padding_mode='zeros'.
    return jnp.where(d0 == 0, 1.0 - frac[..., None], jnp.where(d0 == 1, frac[..., None], 0.0))


def grid_sample_bilinear(x: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """Sample ``x`` (B, H, W, C) at ``grid`` (B, N, 2) normalized (x, y) in [-1, 1].

    align_corners=True semantics: -1 maps to pixel 0, +1 to pixel size-1.
    Out-of-range samples contribute zeros (torch ``padding_mode='zeros'``).
    Returns (B, N, C).
    """
    b, h, w, c = x.shape
    gx = (grid[..., 0] + 1.0) * 0.5 * (w - 1)  # (B, N)
    gy = (grid[..., 1] + 1.0) * 0.5 * (h - 1)
    wx = _axis_weights(gx, w)  # (B, N, W)
    wy = _axis_weights(gy, h)  # (B, N, H)
    # out[b,n,c] = sum_{i,j} wy[b,n,i] * wx[b,n,j] * x[b,i,j,c]
    xc = x.reshape(b, h, w * c)
    t = jnp.einsum("bni,bim->bnm", wy, xc).reshape(b, -1, w, c)
    return jnp.einsum("bnj,bnjc->bnc", wx, t)
