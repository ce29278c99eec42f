"""Clip-consistent augmentation (active reference ops only).

The reference's RandAugment draws ONE op per clip from
{Identity x4, HFlip, VFlip, PsccAug} (``utils/randaugment.py:542-576``, list at
``:634-654``) and applies it to every frame of every inpainting stream plus the
center-frame mask (``universaldataset.py:100-120``).  PsccAug picks one of 8
rot90/flip combinations — the reference's ``np.random.randint(0, 7)`` never selects
variant 7 (``randaugment.py:516``); that quirk is preserved.

Pure numpy on host-side uint8 frames; geometry-only ops so mask semantics are exact.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

__all__ = ["clip_augment"]


def _pscc(arr: np.ndarray, variant: int) -> np.ndarray:
    """PIL rotate is counter-clockwise; np.rot90 matches it for HWC arrays when
    applied with k on the (0, 1) axes after a vertical flip of coordinates —
    verified against PIL in tests/test_data.py."""
    if variant == 0:
        return arr
    if variant in (1, 2, 3):
        return np.rot90(arr, k=variant, axes=(0, 1))
    if variant == 4:
        return arr[::-1]
    # 5/6/7: rotate then FLIP_TOP_BOTTOM
    return np.rot90(arr, k=variant - 4, axes=(0, 1))[::-1]


def clip_augment(
    streams: List[List[np.ndarray]], mask: np.ndarray, rng: np.random.Generator
) -> Tuple[List[List[np.ndarray]], np.ndarray]:
    """Apply one clip-consistent geometric op to all frames + mask."""
    op = rng.integers(0, 7)  # 0-3 identity, 4 hflip, 5 vflip, 6 pscc
    if op <= 3:
        return streams, mask
    if op == 4:  # horizontal flip (left-right)
        f = lambda a: np.ascontiguousarray(a[:, ::-1])
    elif op == 5:  # vertical flip (top-bottom)
        f = lambda a: np.ascontiguousarray(a[::-1])
    else:
        variant = int(rng.integers(0, 7))  # reference randint(0, 7) excl. 7
        f = lambda a: np.ascontiguousarray(_pscc(a, variant))
    streams = [[f(fr) for fr in frames] for frames in streams]
    return streams, f(mask)
