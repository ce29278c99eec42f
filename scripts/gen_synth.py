#!/usr/bin/env python
"""Generate a synthetic 'video inpainting' dataset for the flagship
train->test->measure accuracy drive (VERDICT r2 item 2).

Frames are textured noise; inside each sequence's mask region the texture is
replaced by a forged version of itself.  Masks vary per sequence (random
rectangles/ellipses), constant across frames like DVI's object masks.  Layout
matches the loaders' expectations:

  root/vi/<seq>/NNNNN.png      stream 1 (e.g. VI-inpainted)
  root/cp/<seq>/NNNNN.png      stream 2 (e.g. CP-inpainted)
  root/annot/<seq>/NNNNN.png   binary masks

Forgery STYLES (round 5, VERDICT r4 missing #1 — the FVI "unseen inpainting
method" analog, ``measure.py:94-130`` / BASELINE.json configs[3]): each output
stream pairs a directory name with a named fill construction, so a model can
train on some styles and be scored on a held-out, differently-constructed one:

  blur        Gaussian-smoothed self (the original style): low-frequency
              statistical anomaly, like diffusion-based inpainting.
  resample    4x downscale + bilinear upscale: resampling/aliasing artifact,
              the footprint of patch-synthesis upscaling.
  noisepatch  fresh noise with the frame's mean/std, regenerated per frame:
              matched first-order stats but temporally DECORRELATED (flicker).
  copymove    content copied from a fixed spatial offset of the same frame:
              duplicated genuine texture, no spectral anomaly at all.

Default ``--styles vi:blur,cp:blur`` reproduces the round-4 recipe bit-for-bit
(same rng consumption order).  The generalization drive uses
``--styles vi:blur,cp:resample,np:noisepatch,cm:copymove`` and holds np/cm out
of training.
"""

import argparse
import os

import numpy as np
from PIL import Image, ImageFilter


def _fill(frame, style, rng, size):
    """Return the full-frame forged version for ``style`` (uint8 HWC)."""
    h, w = frame.shape[:2]
    img = Image.fromarray(frame)
    if style == "blur":
        return np.asarray(img.filter(ImageFilter.GaussianBlur(4)))
    if style == "resample":
        small = img.resize((w // 4, h // 4), Image.BILINEAR)
        return np.asarray(small.resize((w, h), Image.BILINEAR))
    if style == "noisepatch":
        noise = rng.normal(frame.mean(), frame.std(), frame.shape)
        return np.clip(noise, 0, 255).astype(np.uint8)
    if style == "copymove":
        return np.roll(frame, (h // 3, w // 3), axis=(0, 1))
    if style == "median":
        # non-linear smoothing: same artifact FAMILY as blur/resample (the
        # low-pass footprint all real inpainting methods share) but a distinct
        # construction — the held-out "unseen method" of the FVI analog
        return np.asarray(img.filter(ImageFilter.MedianFilter(9)))
    raise ValueError(f"unknown forgery style {style!r}")


def make_seq(root, name, n_frames, size, rng, streams=(("vi", "blur"),
                                                       ("cp", "blur"))):
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

    for stream, style in streams:
        d = os.path.join(root, stream, name)
        os.makedirs(d, exist_ok=True)
        for i in range(n_frames):
            # temporally-correlated texture: base + per-frame jitter
            if i == 0:
                base = rng.integers(0, 255, (h, w, 3)).astype(np.float32)
            jitter = rng.normal(0, 25, (h, w, 3))
            frame = np.clip(base + jitter, 0, 255).astype(np.uint8)
            fill = _fill(frame, style, rng, size)
            out = np.where(mask[..., None] > 0, fill, frame)
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
    p.add_argument("--styles", default="vi:blur,cp:blur",
                   help="comma list of <dir>:<style>; styles: blur, resample, "
                        "noisepatch, copymove")
    args = p.parse_args()
    streams = tuple(tuple(tok.split(":")) for tok in args.styles.split(","))
    for _, style in streams:
        _fill(np.zeros((8, 8, 3), np.uint8), style,
              np.random.default_rng(0), 8)  # validate style names up front
    rng = np.random.default_rng(0)
    for s in range(args.seqs):
        make_seq(args.root, f"seq{s}", args.frames, args.size, rng,
                 streams=streams)
    print(f"wrote {args.seqs} seqs x {args.frames} frames at "
          f"{args.size}^2 under {args.root}: "
          + ", ".join(f"{d}={st}" for d, st in streams))


if __name__ == "__main__":
    main()
