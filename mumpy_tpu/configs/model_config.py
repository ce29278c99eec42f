"""Model architecture configs (dataclass counterparts of the reference's
ml_collections ConfigDicts, ``models/factory/modelFactory.py:17-63``).

Unlike the reference, configs are plain frozen dataclasses passed explicitly —
nothing is read from argparse at import time.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple


@dataclasses.dataclass(frozen=True)
class ViewConfig:
    """One temporal view of the multilateral encoder (``modelFactory.py:38-44``)."""

    hidden_size: Tuple[int, int, int, int]
    patch_size: Tuple[int, int, int]  # (ph, pw, pt) — reference stores (4, 4, t)
    depths: Tuple[int, int, int, int]
    num_heads: Tuple[int, int, int, int]
    mlp_dim: int
    num_frames: int
    input_resolution: Tuple[Tuple[int, int], ...]
    temporal_dim: int  # temporal tokens after patchify
    window_size: int = 7


@dataclasses.dataclass(frozen=True)
class GlobalEncoderConfig:
    """Global temporal ViT over per-token temporal slices (``modelFactory.py:55-62``)."""

    num_heads: int = 12
    mlp_dim: int = 3072
    num_layers: int = 12
    hidden_size: int = 768
    num_frames: int = 3


@dataclasses.dataclass(frozen=True)
class MumpyConfig:
    """Full Mumpy model configuration."""

    views: Tuple[ViewConfig, ...]
    global_encoder: GlobalEncoderConfig
    input_token_temporal_dims: Tuple[int, ...] = (1, 1, 3)
    image_size: int = 224
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.2
    # cross-view attention variant: "deformable" (published, ``deformableAttention.py
    # :218-405``) or "window" (softmax W-CVMSA alternative, ``multiTemporalViewEncoder
    # .py:18-124``)
    cva_kind: str = "deformable"
    # rematerialize the scanned block-pair bodies under grad: trades ~1 extra
    # forward of the deep stages for O(depth) -> O(1) activation memory
    remat: bool = True
    # "full": recompute everything in the bwd pass; "dots": save matmul
    # outputs and recompute only elementwise ops (jax dots_with_no_batch_dims
    # policy) — more HBM, less recompute
    remat_policy: str = "full"
    # unroll the deep-stage and global-ViT scans on the TRAINING path too
    # (inference always unrolls).  The rolled scan's while-loop machinery
    # (carry copies, saved-residual dynamic-update-slice stacking) showed up
    # as tens of ms/step in the DVI train trace; unrolling trades compile
    # time for removing it.  Measured A/B lives in PERF.md.
    train_scan_unroll: bool = False
    # decoder
    decoder_num_classes: int = 32
    decoder_dap_k: int = 2
    decoder_features: Tuple[int, ...] = (256, 256, 256, 256, 256)
    decoder_kernel_size: int = 7

    @property
    def stage_shapes(self) -> Sequence[int]:
        return [r[0] for r in self.views[0].input_resolution]

    @property
    def merged_channels(self) -> Sequence[int]:
        """Per-stage channel count after merging the three views (320/640/1280/2560)."""
        return [sum(v.hidden_size[s] for v in self.views) for s in range(4)]

    @property
    def encoder_out_channels(self) -> int:
        return self.global_encoder.hidden_size * self.global_encoder.num_frames


def multiswin_config(
    image_size: int = 224,
    drop_path_rate: float = 0.2,
) -> MumpyConfig:
    """The published three-view architecture (``modelFactory.py:36-67``).

    View temporal patchify strides (3, 2, 1) over a 3-frame clip produce temporal
    dims (1, 1, 3); spatial patch 4x4 at 224^2 gives the 56/28/14/7 pyramid.
    """
    res = tuple(
        (image_size // 4 // (2**s), image_size // 4 // (2**s)) for s in range(4)
    )
    views = (
        ViewConfig((96, 192, 384, 768), (4, 4, 3), (2, 2, 6, 2), (3, 6, 12, 24),
                   768, 1, res, 1),
        ViewConfig((96, 192, 384, 768), (4, 4, 2), (2, 2, 18, 2), (3, 6, 12, 24),
                   1536, 1, res, 1),
        ViewConfig((128, 256, 512, 1024), (4, 4, 1), (2, 2, 18, 2), (4, 8, 16, 32),
                   3072, 3, res, 3),
    )
    return MumpyConfig(
        views=views,
        global_encoder=GlobalEncoderConfig(),
        input_token_temporal_dims=(1, 1, 3),
        image_size=image_size,
        drop_path_rate=drop_path_rate,
    )


def mid_config(image_size: int = 64) -> MumpyConfig:
    """Flagship channel widths, depths and heads on a reduced spatial grid.

    window_size=4 divides the 16/8/4/2 pyramid that image_size=64 produces
    (224 is the only size the 7-window flagship grid divides).  This exercises
    the real kernel-relevant dimensions — C=96..1024, mlp 4x, 18-deep scanned
    stages, full 12-layer global ViT — at test-tractable spatial cost; used by
    the multichip tests to drive shard_map x prepared-operands x pallas at
    flagship widths.
    """
    res = tuple(
        (image_size // 4 // (2**s), image_size // 4 // (2**s)) for s in range(4)
    )
    views = (
        ViewConfig((96, 192, 384, 768), (4, 4, 3), (2, 2, 6, 2), (3, 6, 12, 24),
                   768, 1, res, 1, window_size=4),
        ViewConfig((96, 192, 384, 768), (4, 4, 2), (2, 2, 18, 2), (3, 6, 12, 24),
                   1536, 1, res, 1, window_size=4),
        ViewConfig((128, 256, 512, 1024), (4, 4, 1), (2, 2, 18, 2), (4, 8, 16, 32),
                   3072, 3, res, 3, window_size=4),
    )
    return MumpyConfig(
        views=views,
        global_encoder=GlobalEncoderConfig(),
        input_token_temporal_dims=(1, 1, 3),
        image_size=image_size,
        drop_path_rate=0.0,
    )


def tiny_config(image_size: int = 32) -> MumpyConfig:
    """A miniature config with the same topology, for fast tests.

    image_size=32 gives the stage pyramid 8/4/2/1 (patch merging stays even);
    window_size=4 divides every stage resolution and clamps to min(res) at the
    later stages exactly like the reference (``swinTransformer.py:217-220``).
    Hidden sizes stay divisible by num_heads and by the 3 CVA offset groups.
    Stage-3 depth 4 exercises the scanned block-pair path (1 pair + 1 trailing
    shifted block) next to the depth-2 stages' single trailing block.
    """
    res = tuple(
        (image_size // 4 // (2**s), image_size // 4 // (2**s)) for s in range(4)
    )
    views = (
        ViewConfig((12, 24, 48, 96), (4, 4, 3), (1, 1, 4, 1), (3, 3, 6, 6),
                   48, 1, res, 1, window_size=4),
        ViewConfig((12, 24, 48, 96), (4, 4, 2), (1, 1, 4, 1), (3, 3, 6, 6),
                   96, 1, res, 1, window_size=4),
        ViewConfig((24, 48, 96, 192), (4, 4, 1), (1, 1, 4, 1), (6, 6, 12, 12),
                   192, 3, res, 3, window_size=4),
    )
    ge = GlobalEncoderConfig(num_heads=4, mlp_dim=64, num_layers=2, hidden_size=32)
    return MumpyConfig(
        views=views,
        global_encoder=ge,
        input_token_temporal_dims=(1, 1, 3),
        image_size=image_size,
        drop_path_rate=0.0,
        decoder_num_classes=8,
    )
