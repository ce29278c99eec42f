"""Window partition/reverse and shifted-window attention masks.

TPU-native counterparts of the reference's window utilities
(``models/modules/swinTransformer.py:54-83`` and the mask construction at
``swinTransformer.py:233-254``).  Everything is a static reshape/transpose, which XLA
lowers to free layout changes; the shifted-window mask is precomputed in numpy once
per static (H, W, window, shift) signature.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "window_partition",
    "window_reverse",
    "shifted_window_mask",
    "img_to_window_perm",
    "win_to_img_perm",
    "window_layout_perm",
    "inverse_perm",
    "permutation_take",
    "partition_tokens",
    "unpartition_tokens",
]


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
def img_to_window_perm(h: int, w: int, window: int, shift: int) -> np.ndarray:
    """Static token permutation equivalent to ``partition(roll(img, -shift))``.

    Returns ``perm`` of length ``h*w`` such that gathering image-layout tokens
    ``(B, H*W, C)`` with ``x[:, perm]`` yields exactly the window-major token
    order produced by ``window_partition(jnp.roll(x_img, (-shift, -shift)))``.
    On TPU this turns the roll + pad + transpose launch chain around a fused
    window kernel into a single row gather.
    """
    img = np.arange(h * w, dtype=np.int32).reshape(h, w)
    if shift:
        img = np.roll(img, (-shift, -shift), axis=(0, 1))
    img = img.reshape(h // window, window, w // window, window)
    return img.transpose(0, 2, 1, 3).reshape(-1)


@functools.lru_cache(maxsize=None)
def inverse_perm(perm: tuple) -> np.ndarray:
    """Inverse of a permutation given as a hashable tuple."""
    p = np.asarray(perm, dtype=np.int32)
    inv = np.empty_like(p)
    inv[p] = np.arange(p.size, dtype=np.int32)
    return inv


@functools.lru_cache(maxsize=None)
def win_to_img_perm(h: int, w: int, window: int, shift: int) -> np.ndarray:
    """Inverse of :func:`img_to_window_perm`: gathers window-major tokens back to
    image order (equivalent to ``roll(reverse(wins), +shift)``)."""
    return inverse_perm(tuple(img_to_window_perm(h, w, window, shift).tolist()))


@functools.lru_cache(maxsize=None)
def window_layout_perm(
    h: int, w: int, window: int, src_shift: int, dst_shift: int
) -> np.ndarray:
    """Permutation between two window-major layouts of the same image.

    ``wins_dst[:, q] = wins_src[:, perm[q]]`` where each layout is the flattened
    window-major order of ``partition(roll(img, -shift))``.  Lets a scanned stack
    of alternating shifted/plain blocks stay in window domain: one gather per
    layout change instead of reverse + roll + partition.
    """
    src = img_to_window_perm(h, w, window, src_shift)
    dst = img_to_window_perm(h, w, window, dst_shift)
    inv_src = inverse_perm(tuple(src.tolist()))
    return inv_src[dst]


@functools.lru_cache(maxsize=None)
def window_layout_perm_padded(
    h: int, w: int, window: int, src_shift: int, dst_shift: int, npad: int
) -> np.ndarray:
    """:func:`window_layout_perm` lifted to a sublane-padded window layout.

    A padded scan carry keeps windows as ``(B*nW, npad, C)`` rows (``npad`` the
    sublane-rounded window area) so the fused block kernel's per-block pad /
    slice disappears.  The lifted permutation moves the ``n`` valid rows of
    every window exactly as :func:`window_layout_perm` and maps each pad row to
    itself — pad-row garbage never crosses into valid rows (the kernel also
    masks pad KEY columns, so it never crosses inside attention either).
    """
    n = window * window
    perm = window_layout_perm(h, w, window, src_shift, dst_shift)
    nw = perm.size // n
    lifted = np.arange(nw * npad, dtype=np.int32)
    src_w, src_i = perm // n, perm % n
    lifted.reshape(nw, npad)[:, :n] = (src_w * npad + src_i).reshape(nw, n)
    return lifted


@functools.lru_cache(maxsize=None)
def _perm_take_fn(perm_bytes: bytes):
    """custom-VJP row gather for a static PERMUTATION.

    ``jnp.take``'s VJP is a scatter-add; XLA lowers scatter on TPU far slower
    than gather.  For a permutation the transpose is exactly a gather with the
    inverse permutation, so the backward stays a cheap row gather.  Cached per
    permutation (keyed by its bytes) so jit tracing reuses one closure.

    Reverse-mode only (``jax.custom_vjp``): forward-mode AD through this op
    raises; if jvp is ever needed, a permutation's JVP is the same gather.
    """
    perm = np.frombuffer(perm_bytes, dtype=np.int32)
    if not np.array_equal(np.sort(perm), np.arange(perm.size, dtype=np.int32)):
        raise ValueError("permutation_take requires a true permutation "
                         "(repeated/missing indices would silently corrupt the "
                         "inverse-perm backward)")
    inv = inverse_perm(tuple(perm.tolist()))

    @jax.custom_vjp
    def take(x):
        return jnp.take(x, jnp.asarray(perm), axis=1)

    def fwd(x):
        return take(x), None

    def bwd(_, g):
        return (jnp.take(g, jnp.asarray(inv), axis=1),)

    take.defvjp(fwd, bwd)
    return take


def permutation_take(x: jnp.ndarray, perm: np.ndarray) -> jnp.ndarray:
    """``jnp.take(x, perm, axis=1)`` for a static permutation, with a
    gather-form (inverse-permutation) backward instead of a scatter.

    ``MUMPY_PERM_TAKE=scatter`` reverts to plain ``jnp.take`` (trace-time
    gate, for A/B benchmarking)."""
    import os

    if os.environ.get("MUMPY_PERM_TAKE", "").strip() == "scatter":
        if not getattr(permutation_take, "_scatter_logged", False):
            permutation_take._scatter_logged = True
            print("[mumpy] MUMPY_PERM_TAKE=scatter active (trace-time gate)",
                  flush=True)
        return jnp.take(x, jnp.asarray(perm), axis=1)
    return _perm_take_fn(np.ascontiguousarray(perm, np.int32).tobytes())(x)


def partition_tokens(x: jnp.ndarray, gh: int, gw: int, window: int, shift: int) -> jnp.ndarray:
    """(B, gh*gw, C) image tokens -> (B*nW, window^2, C) window-major tokens of
    the ``roll(-shift)`` layout.

    shift == 0 lowers to reshape+transpose (bandwidth-efficient on TPU);
    shift > 0 uses ONE static row gather, replacing the roll + pad + transpose
    launch chain (the fused-block model is launch-overhead bound).
    """
    b, l, c = x.shape
    n = window * window
    if shift == 0:
        wins = window_partition(x.reshape(b, gh, gw, c), window)
        return wins.reshape(-1, n, c)
    perm = img_to_window_perm(gh, gw, window, shift)
    return permutation_take(x, perm).reshape(-1, n, c)


def unpartition_tokens(wins: jnp.ndarray, gh: int, gw: int, window: int, shift: int) -> jnp.ndarray:
    """Inverse of :func:`partition_tokens`; returns (B, gh*gw, C)."""
    n, c = wins.shape[-2:]
    if shift == 0:
        x = window_reverse(wins.reshape(-1, window, window, c), window, gh, gw)
        return x.reshape(x.shape[0], gh * gw, c)
    b = wins.shape[0] * n // (gh * gw)
    perm = win_to_img_perm(gh, gw, window, shift)
    return permutation_take(wins.reshape(b, gh * gw, c), perm)


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
