"""Baseline single-view Swin ablation model family (TPU-native).

Counterpart of the reference's ablation path: ``create_baseline``
(``models/factory/modelFactory.py:76-93``), the single-view Swin backbone
(``models/modules/swinTransformer.py:502-634`` with ``BaselineTokenize`` at
``:11-32``), ``BaselineEncoder`` (``models/encoder/encoder.py:22-30``) and
``BaselineDecoder`` (``models/decoder/decoder.py:228-284``).

Same TPU-first design choices as the flagship model: the 3D-conv patchify is a
reshape+matmul, stages are plain :class:`~mumpy_tpu.models.swin.SwinBlock` stacks
over static shapes, and the decoder is channels-last convs with the exact torch
``align_corners=True`` bilinear semantics.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from .encoder import PatchEmbed3D
from .swin import PatchMerging, SwinBlock
from .decoder import ConvGNReLUUp


@dataclasses.dataclass(frozen=True)
class BaselineConfig:
    """The reference baseline hyperparameters (``modelFactory.py:76-93``)."""

    embed_dim: int = 128
    depths: Tuple[int, ...] = (2, 2, 18, 2)
    num_heads: Tuple[int, ...] = (4, 8, 16, 32)
    window_size: int = 7
    patch: Tuple[int, int, int] = (4, 4, 3)  # (ph, pw, pt)
    image_size: int = 224
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.1
    decoder_features: Tuple[int, ...] = (256, 256, 256, 256, 256)

    @property
    def num_features(self) -> int:
        return int(self.embed_dim * 2 ** (len(self.depths) - 1))


def tiny_baseline_config(image_size: int = 32) -> BaselineConfig:
    """Miniature baseline for tests (8/4/2/1 pyramid like ``tiny_config``)."""
    return BaselineConfig(
        embed_dim=16, depths=(2, 2, 4, 2), num_heads=(2, 2, 4, 4),
        window_size=4, image_size=image_size, drop_path_rate=0.0,
        decoder_features=(32, 32, 32, 32, 32),
    )


class BaselineEncoder(nn.Module):
    """Single-view hierarchical Swin over the 3-frame clip
    (``swinTransformer.py:502-634``; wrapper reshape ``encoder.py:22-30``).

    Input (B, T, H, W, 3) -> features (B, H/32, W/32, 8*embed_dim).
    """

    cfg: BaselineConfig

    @nn.compact
    def __call__(self, clip: jnp.ndarray, deterministic: bool = True):
        cfg = self.cfg
        x = PatchEmbed3D(cfg.embed_dim, cfg.patch, name="patch_embed")(clip)
        x = x[:, 0]  # temporal kernel == clip length -> single temporal token
        x = nn.Dropout(cfg.drop_rate)(x, deterministic=deterministic)

        res = cfg.image_size // cfg.patch[0]
        dpr = np.linspace(0.0, cfg.drop_path_rate, sum(cfg.depths))
        for s, depth in enumerate(cfg.depths):
            dim = int(cfg.embed_dim * 2**s)
            for i in range(depth):
                x = SwinBlock(
                    dim, (res, res), cfg.num_heads[s],
                    window_size=cfg.window_size,
                    shift_size=0 if i % 2 == 0 else cfg.window_size // 2,
                    drop=cfg.drop_rate, attn_drop=cfg.attn_drop_rate,
                    drop_path_rate=float(dpr[sum(cfg.depths[:s]) + i]),
                    name=f"stage{s}_block{i}",
                )(x, deterministic)
            if s < len(cfg.depths) - 1:
                x = PatchMerging(dim, (res, res), name=f"stage{s}_merge")(x)
                res //= 2
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        b, l, c = x.shape
        return x.reshape(b, res, res, c)


class BaselineDecoder(nn.Module):
    """Five conv+GN+ReLU+2x-bilinear stages + final 3x3 conv
    (``decoder.py:228-284``; GroupNorm(32), ``align_corners=True``)."""

    features: Tuple[int, ...] = (256, 256, 256, 256, 256)

    @nn.compact
    def __call__(self, x):
        for i, f in enumerate(self.features):
            x = ConvGNReLUUp(f, groups=32, name=f"decoder_{i + 1}")(x)
        return nn.Conv(1, (3, 3), padding=1, name="final_out")(x)


class BaselineModel(nn.Module):
    """Single-view encoder + progressive decoder ablation (``encoder.py:22-30``,
    ``decoder.py:228-284``): clip (B, T, H, W, 3) -> logits (B, H, W, 1)."""

    cfg: BaselineConfig

    @nn.compact
    def __call__(self, clip: jnp.ndarray, deterministic: bool = True):
        feats = BaselineEncoder(self.cfg, name="encoder")(clip, deterministic)
        return BaselineDecoder(self.cfg.decoder_features, name="decoder")(feats)


def create_baseline(cfg: BaselineConfig | None = None) -> BaselineModel:
    """Factory (counterpart of ``modelFactory.py:76-93``)."""
    return BaselineModel(cfg or BaselineConfig())
