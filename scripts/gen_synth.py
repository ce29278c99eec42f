#!/usr/bin/env python
"""Generate a synthetic 'video inpainting' dataset for the flagship
train->test->measure accuracy drive (VERDICT r2 item 2).

Frames are textured noise; inside each sequence's mask region the texture is
replaced by a heavily smoothed version of itself — the same kind of low-
frequency statistical anomaly real inpainting leaves, so the detector has an
actual signal to learn (pure-noise masks would be memorization-only).  Masks
vary per sequence (random rectangles/ellipses), constant across frames like
DVI's object masks.  Layout matches the loaders' expectations:

  root/vi/<seq>/NNNNN.png      stream 1 (e.g. VI-inpainted)
  root/cp/<seq>/NNNNN.png      stream 2 (e.g. CP-inpainted)
  root/annot/<seq>/NNNNN.png   binary masks
"""

import argparse
import os

import numpy as np
from PIL import Image, ImageFilter


def make_seq(root, name, n_frames, size, rng):
    h = w = size
    # per-sequence mask: rectangle or ellipse, 10-35% of the frame
    mask = np.zeros((h, w), np.uint8)
    kind = rng.integers(0, 2)
    mh = int(rng.uniform(0.28, 0.55) * h)
    mw = int(rng.uniform(0.28, 0.55) * w)
    top = int(rng.integers(0, h - mh))
    left = int(rng.integers(0, w - mw))
    if kind == 0:
        mask[top:top + mh, left:left + mw] = 255
    else:
        yy, xx = np.mgrid[0:h, 0:w]
        cy, cx = top + mh / 2, left + mw / 2
        mask[((yy - cy) / (mh / 2)) ** 2 + ((xx - cx) / (mw / 2)) ** 2 <= 1] = 255

    for stream in ("vi", "cp"):
        d = os.path.join(root, stream, name)
        os.makedirs(d, exist_ok=True)
        for i in range(n_frames):
            # temporally-correlated texture: base + per-frame jitter
            if i == 0:
                base = rng.integers(0, 255, (h, w, 3)).astype(np.float32)
            jitter = rng.normal(0, 25, (h, w, 3))
            frame = np.clip(base + jitter, 0, 255).astype(np.uint8)
            img = Image.fromarray(frame)
            smooth = img.filter(ImageFilter.GaussianBlur(4))
            out = np.where(mask[..., None] > 0, np.asarray(smooth), frame)
            Image.fromarray(out.astype(np.uint8)).save(
                os.path.join(d, f"{i:05d}.png"))

    d = os.path.join(root, "annot", name)
    os.makedirs(d, exist_ok=True)
    for i in range(n_frames):
        Image.fromarray(mask).save(os.path.join(d, f"{i:05d}.png"))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="/tmp/synth224")
    p.add_argument("--size", type=int, default=224)
    p.add_argument("--seqs", type=int, default=4)
    p.add_argument("--frames", type=int, default=25)
    args = p.parse_args()
    rng = np.random.default_rng(0)
    for s in range(args.seqs):
        make_seq(args.root, f"seq{s}", args.frames, args.size, rng)
    print(f"wrote {args.seqs} seqs x {args.frames} frames at "
          f"{args.size}^2 under {args.root}")


if __name__ == "__main__":
    main()
