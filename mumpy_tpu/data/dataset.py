"""Clip dataset: sliding-window clip index + multilateral frame loading.

Counterpart of ``dataloaders/universaldataloader.py`` + ``universaldataset.py``:

* one clip per frame — a centered window of ``length_clip`` frame indices clamped at
  the sequence edges (``universaldataloader.py:41-48``);
* each clip is loaded from 1-3 inpainting-stream roots (the same frames rendered by
  different inpainting methods, ``universaldataset.py:58-61``), resized to 224^2 and
  normalized with the reference's mean/std (``train.py:49-55``);
* the target is the center frame's annotation binarized (annot > 0) and flattened
  (``universaldataset.py:141-144``);
* train batches concatenate the streams along the batch axis with duplicated masks
  (``universaldataset.py:146-203``); test yields the primary stream only.

Everything is host-side numpy/PIL; batches are fed to the device as channels-last
(B, T, H, W, 3) float32.
"""

from __future__ import annotations

import dataclasses
import glob
import os
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image

from ..configs.data_config import MEAN, STD, DataConfig
from .augment import clip_augment, double_clip_augment
from .db import SequenceInfo, read_sequences


def get_dataset(cfg: DataConfig, split: str) -> "ClipDataset":
    """Dataset facade (counterpart of ``utils/dataset_utils.py:4-8``)."""
    assert cfg.dataset in ("davis", "youtubevos"), cfg.dataset
    return ClipDataset(cfg, split)


@dataclasses.dataclass(frozen=True)
class Clip:
    seq_name: str
    frame_files: Tuple[str, ...]  # basenames of the clip's frames (with ext)
    starting_frame: int  # center-frame number (test naming, ``universaldataset.py:50``)


def list_frames(seq_dir: str, ext: str) -> List[str]:
    files = sorted(glob.glob(os.path.join(seq_dir, f"*.{ext}")))
    if not files:  # tolerate mixed extensions
        files = sorted(
            f for e in ("png", "jpg") for f in glob.glob(os.path.join(seq_dir, f"*.{e}"))
        )
    return files


class LmdbFrameIndex:
    """Sequence-name -> frame-file-list index stored in LMDB.

    Counterpart of the reference's LMDB branch (``dataloaders/base.py:55-60``):
    keys are sequence basenames, values '|'-joined frame filenames.  Only the
    *listing* comes from the DB — pixel data is still read from the filesystem,
    exactly as upstream.  Gated on the optional ``lmdb`` package.
    """

    def __init__(self, path: str):
        try:
            import lmdb  # optional dependency, not in the base image
        except ImportError as e:  # pragma: no cover - exercised via stub in tests
            raise ImportError(
                "DataConfig.lmdb_index requires the 'lmdb' package; install it "
                "or leave lmdb_index=None to list frames from the filesystem"
            ) from e
        self._env = lmdb.open(
            path, readonly=True, lock=False, readahead=False, meminit=False
        )

    def list_frames(self, seq_dir: str) -> List[str]:
        key = os.path.basename(seq_dir)
        with self._env.begin() as txn:
            raw = txn.get(key.encode())
        if raw is None:
            return []
        return [os.path.join(seq_dir, f) for f in raw.decode().split("|")]


def build_clips(cfg: DataConfig, split: str) -> List[Clip]:
    """Sliding centered windows with edge clamping (``universaldataloader.py:41-48``)."""
    phase = split
    seqs = read_sequences(cfg.dataset, cfg.sequences, cfg.db_info, cfg.year, phase)
    k = cfg.length_clip // 2
    clips: List[Clip] = []
    index = LmdbFrameIndex(cfg.lmdb_index) if cfg.lmdb_index else None
    for s in seqs:
        seq_dir = os.path.join(cfg.sequences, s.name)
        files = (
            index.list_frames(seq_dir)
            if index is not None
            else list_frames(seq_dir, cfg.frame_ext)
        )
        n = len(files)
        if n == 0:
            continue
        basenames = [os.path.basename(f) for f in files]
        for idx in range(n):
            ids = [max(0, min(n - 1, i)) for i in range(idx - k, idx + k + 1)]
            center = ids[cfg.length_clip // 2]
            frame_no = int(
                os.path.splitext(basenames[center])[0].replace("frame_", "")
            )
            clips.append(Clip(s.name, tuple(basenames[i] for i in ids), frame_no))
    return clips


class FrameCache:
    """Bounded LRU of decoded+resized uint8 frames.

    The sliding clip windows (``universaldataloader.py:41-48``) revisit each
    frame ~``length_clip`` times per epoch; caching the decoded 224^2 uint8
    frame (~150KB) eliminates the repeat decodes.  Cached arrays are marked
    read-only so downstream augmentation cannot corrupt the cache in place.
    """

    def __init__(self, max_bytes: int):
        import collections

        self.max_bytes = max_bytes
        self._d: "collections.OrderedDict[str, np.ndarray]" = collections.OrderedDict()
        self._bytes = 0

    def get(self, key: str) -> Optional[np.ndarray]:
        v = self._d.get(key)
        if v is not None:
            self._d.move_to_end(key)
        return v

    def put(self, key: str, arr: np.ndarray) -> np.ndarray:
        arr.setflags(write=False)
        if self.max_bytes <= 0 or key in self._d:
            return arr
        self._d[key] = arr
        self._bytes += arr.nbytes
        while self._bytes > self.max_bytes and self._d:
            _, old = self._d.popitem(last=False)
            self._bytes -= old.nbytes
        return arr

    def __reduce__(self):  # pickled (spawned data workers) as an EMPTY cache
        return (FrameCache, (self.max_bytes,))


def _load_frame(path: str, size: Tuple[int, int], fast: bool = False,
                cache: Optional[FrameCache] = None) -> np.ndarray:
    if cache is not None:
        hit = cache.get(path)
        if hit is not None:
            return hit
    img = Image.open(path)
    if fast:
        # JPEG draft: decode at the nearest DCT scale >= target (~1.8x faster);
        # no-op for PNG.  Opt-in (cfg.fast_decode) — pixels differ slightly
        # from full decode + resize.
        img.draft("RGB", size)
    arr = np.asarray(img.convert("RGB").resize(size), dtype=np.uint8)
    if cache is not None:
        arr = cache.put(path, arr)
    return arr


def _load_annot(path: str, size: Tuple[int, int],
                cache: Optional["FrameCache"] = None) -> np.ndarray:
    if cache is not None:
        hit = cache.get(path)
        if hit is not None:
            return hit.astype(np.float32)
    annot = Image.open(path).convert("L").resize(size)
    arr = np.asarray(annot, dtype=np.uint8)
    if cache is not None:
        arr = cache.put(path, arr)  # u8 in cache (4x smaller than f32)
    return arr.astype(np.float32)


def normalize(frames_u8: np.ndarray) -> np.ndarray:
    """uint8 HWC frames -> float32 normalized (``train.py:49-55``)."""
    x = frames_u8.astype(np.float32) / 255.0
    return (x - np.asarray(MEAN, np.float32)) / np.asarray(STD, np.float32)


def binarize_mask(annot: np.ndarray) -> np.ndarray:
    """annot/max > 0 -> {0,1} (``universaldataset.py:141-144``)."""
    m = annot / max(float(annot.max()), 1e-8)
    return (m > 0).astype(np.float32)


class ClipDataset:
    """Indexable clip dataset over 1-3 inpainting streams."""

    def __init__(self, cfg: DataConfig, split: str):
        self.cfg = cfg
        self.split = split
        self.clips = build_clips(cfg, split)
        self.stream_roots = [r for r in (cfg.sequences, cfg.sequences2, cfg.sequences3) if r]
        if split == "test":
            self.stream_roots = self.stream_roots[:1]
        self.frame_cache = FrameCache(cfg.cache_mb << 20)

    def __len__(self) -> int:
        return len(self.clips)

    def load_clip(self, i: int, rng: Optional[np.random.Generator] = None,
                  raw: bool = False):
        """Returns (streams: [S](T,H,W,3), mask: (H*W,) float32, seq_name,
        starting_frame).  Streams are float32 normalized, or uint8 pre-normalize
        with ``raw=True`` (worker-process transport: 4x fewer bytes; the parent
        normalizes the assembled batch in one vectorized pass)."""
        cfg = self.cfg
        clip = self.clips[i]
        res = cfg.input_res

        raw_streams: List[List[np.ndarray]] = []
        for root in self.stream_roots:
            frames = [
                _load_frame(os.path.join(root, clip.seq_name, f), res,
                            fast=cfg.fast_decode, cache=self.frame_cache)
                for f in clip.frame_files
            ]
            raw_streams.append(frames)

        center = clip.frame_files[cfg.length_clip // 2]
        annot_path = os.path.join(
            cfg.annotations, clip.seq_name, os.path.splitext(center)[0] + ".png"
        )
        annot = _load_annot(annot_path, res, cache=self.frame_cache)

        if self.split == "train" and cfg.augment and rng is not None:
            aug = clip_augment if cfg.single_augment else double_clip_augment
            raw_streams, annot = aug(raw_streams, annot, rng)

        stack = lambda f: np.stack(f, axis=0)
        streams = [stack(f) if raw else normalize(stack(f)) for f in raw_streams]
        mask = binarize_mask(annot).reshape(-1)
        return streams, mask, clip.seq_name, clip.starting_frame


def multilateral_collate(samples: Sequence) -> Dict[str, np.ndarray]:
    """Concatenate streams along batch with duplicated masks
    (``universaldataset.py:146-203``): images (S*B, T, H, W, 3), masks (S*B, H*W).

    uint8 images (the ``raw`` worker-transport path) keep their dtype — the
    loader normalizes the assembled batch in the parent process."""
    n_streams = len(samples[0][0])
    images = np.concatenate(
        [np.stack([s[0][j] for s in samples], axis=0) for j in range(n_streams)], axis=0
    )
    if images.dtype != np.uint8:
        images = images.astype(np.float32)
    masks = np.stack([s[1] for s in samples], axis=0)
    masks = np.concatenate([masks] * n_streams, axis=0)
    return {"image": images, "mask": masks.astype(np.float32)}


def assemble_batch(ds: ClipDataset, idx, seeds, raw: bool = False) -> Dict[str, np.ndarray]:
    """Load + collate one batch of clips (module-level so worker processes can
    run it on their unpickled dataset copy)."""
    samples = [
        ds.load_clip(int(i), np.random.default_rng(int(s)), raw=raw)
        for i, s in zip(idx, seeds)
    ]
    if ds.split == "test":
        images = np.stack([s[0][0] for s in samples])
        return {
            "image": images if raw else images.astype(np.float32),
            "mask": np.stack([s[1] for s in samples]).astype(np.float32),
            "seq_name": [s[2] for s in samples],
            "starting_frame": [s[3] for s in samples],
        }
    return multilateral_collate(samples)


_WORKER_DS: Optional[ClipDataset] = None


def _worker_init(ds: ClipDataset) -> None:
    global _WORKER_DS
    _WORKER_DS = ds


def _worker_assemble(args) -> Dict[str, np.ndarray]:
    idx, seeds = args
    return assemble_batch(_WORKER_DS, idx, seeds, raw=True)


class DataLoader:
    """Host-side batching loader with shuffling, drop_last and process workers.

    Counterpart of the reference's ``torch.utils.data.DataLoader(num_workers=N)``
    (``train.py:86-90``): with ``num_workers > 0`` batches are assembled by a
    persistent pool of WORKER PROCESSES (torch-style — thread pools measured
    slower than serial here: PIL/numpy hold the GIL for most of the decode+
    augment path) and up to ``prefetch`` batches are staged ahead so host IO
    overlaps device compute.  Workers ship uint8 frames (4x fewer pickle bytes);
    the parent normalizes each batch in one vectorized pass.  Per-sample
    augmentation seeds are drawn up-front, so batches are bit-identical for any
    worker count.
    """

    def __init__(self, dataset: ClipDataset, batch_size: int, shuffle: bool,
                 drop_last: bool, seed: int = 0, num_workers: int = 0,
                 prefetch: int = 4, normalize_on_host: bool = True):
        self.ds = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.num_workers = num_workers
        self.prefetch = max(1, prefetch)
        # False: yield uint8 frames and let the consumer normalize ON DEVICE
        # ((x/255 - mean)/std fuses into the first conv) — 4x fewer bytes over
        # host->device transfer and no host-side f32 expansion
        self.normalize_on_host = normalize_on_host
        self._epoch = 0
        self._pool = None

    def __len__(self) -> int:
        n = len(self.ds)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _batch_indices(self, rng: np.random.Generator):
        order = np.arange(len(self.ds))
        if self.shuffle:
            rng.shuffle(order)
        bs = self.batch_size
        end = len(order) - (len(order) % bs) if self.drop_last else len(order)
        return [order[s : s + bs] for s in range(0, end, bs)
                if not (self.drop_last and len(order[s : s + bs]) < bs)]

    def _assemble(self, idx, seeds, raw: bool = False) -> Dict[str, np.ndarray]:
        return assemble_batch(self.ds, idx, seeds, raw=raw)

    def _finalize(self, batch: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        if self.normalize_on_host and batch["image"].dtype == np.uint8:
            batch["image"] = normalize(batch["image"])
        return batch

    def _get_pool(self):
        if self._pool is None:
            import multiprocessing as mp

            # spawn, not fork: the parent typically holds a live JAX/TPU client
            # whose internal threads and locks do not survive a fork
            ctx = mp.get_context("spawn")
            self._pool = ctx.Pool(
                self.num_workers, initializer=_worker_init, initargs=(self.ds,)
            )
        return self._pool

    def close(self) -> None:
        if self._pool is not None:
            self._pool.terminate()
            self._pool.join()
            self._pool = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        rng = np.random.default_rng(self.seed + self._epoch)
        self._epoch += 1
        batches = self._batch_indices(rng)
        # per-sample augmentation seeds drawn up-front so results are
        # independent of worker scheduling
        seeds = [rng.integers(0, 2**63, size=len(idx)) for idx in batches]
        if self.num_workers <= 0:
            raw = not self.normalize_on_host
            for idx, sd in zip(batches, seeds):
                yield self._assemble(idx, sd, raw=raw)
            return
        pool = self._get_pool()
        pending = []
        it = iter(zip(batches, seeds))
        for _ in range(self.prefetch):
            nxt = next(it, None)
            if nxt is not None:
                pending.append(pool.apply_async(_worker_assemble, (nxt,)))
        while pending:
            fut = pending.pop(0)
            nxt = next(it, None)
            if nxt is not None:
                pending.append(pool.apply_async(_worker_assemble, (nxt,)))
            yield self._finalize(fut.get())
