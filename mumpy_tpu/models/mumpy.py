"""The full Mumpy model: encoder + decoder in one flax module.

Mirrors the ``Encoder()``/``Decoder()`` pair driven by the reference's train/test
loops (``train.py:103-104``, ``test.py:90-95``) but as a single pure function of
(params, clip).  Parameters live under ``encoder/...`` and ``decoder/...`` so the
trainer can reproduce the reference's three optimizer groups (encoder, decoder, CVA —
``train.py:204-213``) by path matching.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..configs.model_config import MumpyConfig, multiswin_config, tiny_config
from .decoder import MumpyDecoder
from .encoder import MumpyEncoder

__all__ = ["Mumpy", "create_mumpy", "MumpyConfig", "multiswin_config", "tiny_config"]


class Mumpy(nn.Module):
    cfg: MumpyConfig

    @nn.compact
    def __call__(self, clip: jnp.ndarray, deterministic: bool = True):
        """clip: (B, T, H, W, 3) normalized frames -> logits (B, H, W, 1)."""
        feats, view_x, ffinfo = MumpyEncoder(self.cfg, name="encoder")(clip, deterministic)
        logits, _ = MumpyDecoder(self.cfg, name="decoder")(feats, view_x, ffinfo)
        return logits


def create_mumpy(cfg: MumpyConfig | None = None) -> Mumpy:
    """Model factory (counterpart of ``models/factory/modelFactory.py:36-73``)."""
    return Mumpy(cfg or multiswin_config())
