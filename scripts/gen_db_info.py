#!/usr/bin/env python
"""Generate a db-info YAML for a dataset root.

The reference ships hand-maintained DB files (``configs/davis/db_info.yaml``,
``configs/youtube/youtubevos_2018.yaml``).  This tool produces a compatible file by
scanning a dataset root whose subdirectories are sequences, assigning train/val
splits either from an explicit val-list file or a deterministic fraction.

Usage:
    python scripts/gen_db_info.py --root /data/DVI/JPEGImages_vi \
        --dataset davis --out db_info.yaml [--val-list vals.txt | --val-frac 0.15]
"""

import argparse
import glob
import hashlib
import os

import yaml


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", required=True, help="directory of per-sequence frame dirs")
    p.add_argument("--dataset", choices=["davis", "youtubevos"], default="davis")
    p.add_argument("--out", required=True)
    p.add_argument("--year", default="2016")
    p.add_argument("--val-list", default=None,
                   help="file with one sequence name per line to tag as val")
    p.add_argument("--val-frac", type=float, default=0.0,
                   help="deterministic fraction of sequences tagged val (by name hash)")
    args = p.parse_args()

    val_names = set()
    if args.val_list:
        with open(args.val_list) as f:
            val_names = {line.strip() for line in f if line.strip()}

    seqs = sorted(
        d for d in os.listdir(args.root) if os.path.isdir(os.path.join(args.root, d))
    )
    records = []
    for name in seqs:
        n_frames = len(glob.glob(os.path.join(args.root, name, "*.jpg"))) or len(
            glob.glob(os.path.join(args.root, name, "*.png"))
        )
        if val_names:
            split = "val" if name in val_names else "train"
        elif args.val_frac > 0:
            h = int(hashlib.sha1(name.encode()).hexdigest(), 16) % 1000
            split = "val" if h < args.val_frac * 1000 else "train"
        else:
            split = "train"
        if args.dataset == "davis":
            records.append({
                "name": name, "set": split, "year": int(args.year),
                "num_frames": n_frames, "attributes": [], "eval_t": True,
            })
        else:
            records.append({"video_name": name, "set": split})

    payload = {"sequences": records} if args.dataset == "davis" else records
    with open(args.out, "w") as f:
        yaml.safe_dump(payload, f, sort_keys=False)
    n_val = sum(1 for r in records if (r.get("set") == "val"))
    print(f"wrote {args.out}: {len(records)} sequences ({n_val} val)")


if __name__ == "__main__":
    main()
