"""mumpy_tpu — TPU-native Multilateral Temporal-view Pyramid Transformer for
video inpainting detection (rebuild of the BMVC 2024 reference; see README.md).

Public API:

    from mumpy_tpu import Mumpy, MumpyConfig, multiswin_config, tiny_config
    from mumpy_tpu.models.baseline import BaselineModel, create_baseline
    from mumpy_tpu.data.dataset import ClipDataset, DataLoader, get_dataset
    from mumpy_tpu.train.trainer import create_train_state, train_loop
    from mumpy_tpu.utils.metrics import evaluate_dirs
"""

from .configs.model_config import (GlobalEncoderConfig, MumpyConfig, ViewConfig,
                                   multiswin_config, tiny_config)
from .models.mumpy import Mumpy, create_mumpy

__version__ = "0.1.0"

__all__ = [
    "Mumpy",
    "create_mumpy",
    "MumpyConfig",
    "ViewConfig",
    "GlobalEncoderConfig",
    "multiswin_config",
    "tiny_config",
    "__version__",
]
