#!/usr/bin/env python
"""Host input-pipeline throughput at the DVI training recipe.

The device-side train step sustains ~54 clips/s (PERF.md); the host loader must
decode + resize + augment faster than that — with ~2x headroom so IO never
stalls the chip.  This measures the full DataLoader path (decode, resize to
224^2, clip-consistent augment, normalize, multilateral collate) on a synthetic
DVI-shaped dataset: JPEG frames at DAVIS's native 854x480, 2 inpainting streams,
batch 6 -> 12 stream-clips per batch (``scripts/train_davis.sh:3-20``).

Usage: python scripts/host_pipeline_bench.py [--workers 0 2 4 8] [--batches 30]
Prints clips/s and images/s per worker count plus the verdict vs the 54 clips/s
device rate.
"""

import argparse
import os
import sys
import tempfile
import time

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mumpy_tpu.configs.data_config import DataConfig  # noqa: E402
from mumpy_tpu.data.dataset import ClipDataset, DataLoader  # noqa: E402


def make_synthetic(root: str, n_seqs: int = 4, frames_per_seq: int = 30,
                   size=(854, 480)) -> None:
    rng = np.random.default_rng(0)
    for stream in ("vi", "cp"):
        for s in range(n_seqs):
            d = os.path.join(root, stream, f"seq{s}")
            os.makedirs(d, exist_ok=True)
            for i in range(frames_per_seq):
                # smooth gradients + noise: compresses/decodes more like natural
                # video than pure noise
                x = np.linspace(0, 255, size[0], dtype=np.float32)[None, :, None]
                y = np.linspace(0, 255, size[1], dtype=np.float32)[:, None, None]
                img = (0.5 * x + 0.3 * y + 0.2 * rng.uniform(0, 255, (size[1], size[0], 3))).astype(np.uint8)
                Image.fromarray(img).save(f"{d}/{i:05d}.jpg", quality=85)
    for s in range(n_seqs):
        d = os.path.join(root, "annot", f"seq{s}")
        os.makedirs(d, exist_ok=True)
        m = np.zeros((size[1], size[0]), np.uint8)
        m[100:300, 200:600] = 255
        for i in range(frames_per_seq):
            Image.fromarray(m).save(f"{d}/{i:05d}.png")


def bench(root: str, workers: int, n_batches: int, batch_size: int = 6,
          fast_decode: bool = False, cache_mb: int = 512):
    cfg = DataConfig(
        dataset="davis",
        sequences=os.path.join(root, "vi"),
        sequences2=os.path.join(root, "cp"),
        annotations=os.path.join(root, "annot"),
        db_info=None,  # glob mode: every directory under sequences is a sequence
        input_res=(224, 224),
        length_clip=3,
        frame_ext="jpg",
        augment=True,
        num_workers=workers,
        fast_decode=fast_decode,
        cache_mb=cache_mb,
    )
    ds = ClipDataset(cfg, "train")
    loader = DataLoader(ds, batch_size=batch_size, shuffle=True, drop_last=True,
                        num_workers=workers, prefetch=4)
    # warm one full epoch: pool spin-up, page cache, and the frame cache — the
    # steady-state (epoch >= 2) rate is what training actually sees
    for _ in iter(loader):
        pass
    t0 = time.perf_counter()
    done = 0
    for batch in iter(loader):
        done += 1
        if done >= n_batches:
            break
    dt = time.perf_counter() - t0
    loader.close()
    n_streams = 2
    clips = done * batch_size * n_streams  # stream-clips, matching the device batch
    images = done * batch_size * (n_streams * cfg.length_clip + 1)
    return clips / dt, images / dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--workers", type=int, nargs="+", default=[0, 2, 4, 8])
    p.add_argument("--batches", type=int, default=30)
    p.add_argument("--device-clips-per-sec", type=float, default=54.0)
    p.add_argument("--fast", action="store_true", help="enable cfg.fast_decode")
    p.add_argument("--cache-mb", type=int, default=512)
    p.add_argument("--keep", action="store_true")
    args = p.parse_args()

    tmp = tempfile.mkdtemp(prefix="mumpy_hostbench_")
    print(f"synthesizing DVI-shaped dataset under {tmp} ...")
    make_synthetic(tmp)

    results = {}
    for w in args.workers:
        cps, ips = bench(tmp, w, args.batches, fast_decode=args.fast,
                         cache_mb=args.cache_mb)
        results[w] = cps
        ratio = cps / args.device_clips_per_sec
        print(f"workers={w:2d}: {cps:7.1f} clips/s  {ips:7.1f} images/s "
              f"({ratio:4.1f}x the device step rate)")
    best = max(results.values())
    print(
        f"verdict: best {best:.1f} clips/s vs device {args.device_clips_per_sec} "
        f"clips/s -> {'OK (>=2x headroom)' if best >= 2 * args.device_clips_per_sec else 'INSUFFICIENT'}"
    )
    if not args.keep:
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
