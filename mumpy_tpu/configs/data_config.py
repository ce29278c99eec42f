"""Dataset/path configuration (explicit dataclasses replacing the reference's
import-time easydict config modules, ``configs/davis/config.py`` /
``configs/youtube/config.py``).

The reference selects the config module from argparse *at import time*
(``dataloaders/base.py:9-14``); here everything is passed explicitly.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional, Tuple

# normalization constants (``train.py:49-55``, ``test.py:23-24``)
MEAN = (0.4776, 0.479, 0.4465)
STD = (0.230, 0.2085, 0.2324)


@dataclasses.dataclass(frozen=True)
class DataConfig:
    dataset: str = "davis"  # 'davis' | 'youtubevos'
    # inpainting-stream roots: same sequence rendered by different inpainting
    # methods (``configs/davis/config.py:50-52``, ``configs/youtube/config.py:52-54``)
    sequences: str = "/databases/DAVIS_2016_vi/JPEGImages/480p"
    sequences2: Optional[str] = "/databases/DAVIS_2016_cp/JPEGImages_224/480p"
    sequences3: Optional[str] = None
    annotations: str = "/databases/DAVIS_2016_vi/Annotations/480p"
    db_info: Optional[str] = None  # yaml with sequence membership
    year: str = "2016"
    length_clip: int = 3
    input_res: Tuple[int, int] = (224, 224)
    frame_ext: str = "png"  # davis frames are .png, youtube .jpg (``universaldataset.py:56-57``)
    batch_size: int = 6
    augment: bool = True
    single_augment: bool = True
    num_workers: int = 4
    seed: int = 282845927
    # host-pipeline throughput knobs (scripts/host_pipeline_bench.py):
    # LRU cache of decoded+resized uint8 frames — the sliding clip windows
    # revisit each frame ~length_clip times per epoch, so caching cuts decodes
    # ~3x.  0 disables.
    cache_mb: int = 512
    # decode JPEGs at PIL draft scale (DCT-domain downscale) before the final
    # resize: ~1.8x faster, pixels differ slightly from full-decode+resize —
    # OFF by default for reference parity; safe to enable for training.
    fast_decode: bool = False
    # optional LMDB frame-list index (``dataloaders/base.py:55-60``): each key
    # is a sequence name, the value a '|'-joined frame file list.  Replaces the
    # per-sequence directory glob (one mmap'd read instead of a dirent scan) on
    # network filesystems with slow metadata ops.  None = glob the directories.
    lmdb_index: Optional[str] = None

    @property
    def num_streams(self) -> int:
        return 1 + (self.sequences2 is not None) + (self.sequences3 is not None)


def davis_config(**overrides) -> DataConfig:
    here = os.path.dirname(os.path.abspath(__file__))
    defaults = dict(
        dataset="davis",
        db_info=os.path.join(here, "davis_db_info.yaml"),
        frame_ext="png",
        batch_size=6,
    )
    defaults.update(overrides)
    return DataConfig(**defaults)


def youtubevos_config(**overrides) -> DataConfig:
    here = os.path.dirname(os.path.abspath(__file__))
    defaults = dict(
        dataset="youtubevos",
        db_info=os.path.join(here, "youtubevos_2018.yaml"),
        frame_ext="jpg",
        batch_size=4,
        year="2018",
    )
    defaults.update(overrides)
    return DataConfig(**defaults)
