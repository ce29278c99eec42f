"""mumpy_tpu — TPU-native Multilateral Temporal-view Pyramid Transformer for
video inpainting detection (rebuild of the BMVC 2024 reference; see README.md).

Public API:

    from mumpy_tpu import Mumpy, MumpyConfig, multiswin_config, tiny_config
    from mumpy_tpu.models.baseline import BaselineModel, create_baseline
    from mumpy_tpu.data.dataset import ClipDataset, DataLoader, get_dataset
    from mumpy_tpu.train.trainer import create_train_state, train_loop
    from mumpy_tpu.utils.metrics import evaluate_dirs

Exports resolve lazily (PEP 562) so importing the package does not pull in
jax/flax — data-loader worker processes import ``mumpy_tpu.data.dataset``
without paying the JAX import or risking a device-client init in a subprocess.
"""

import importlib

__version__ = "0.1.0"

_EXPORTS = {
    "Mumpy": ".models.mumpy",
    "create_mumpy": ".models.mumpy",
    "MumpyConfig": ".configs.model_config",
    "ViewConfig": ".configs.model_config",
    "GlobalEncoderConfig": ".configs.model_config",
    "multiswin_config": ".configs.model_config",
    "tiny_config": ".configs.model_config",
}

__all__ = list(_EXPORTS) + ["__version__"]


def __getattr__(name):
    mod = _EXPORTS.get(name)
    if mod is None:
        raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
    return getattr(importlib.import_module(mod, __name__), name)
