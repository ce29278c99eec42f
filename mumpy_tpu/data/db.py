"""Sequence membership: DB-info YAML parsing + filesystem fallback.

Counterpart of ``db_read_sequences`` (``configs/davis/config.py:91-108``,
``configs/youtube/config.py:92-110``).  DAVIS semantics: ``test`` maps to the
``val`` membership set, ``trainval`` to train+val, and other phases filter on the
set tag *and* require the sequence directory to exist.  The YouTube-VOS yaml lists
``video_name`` records tagged ``set: train``.

When no db-info yaml is provided, sequences are discovered by scanning the stream
root directory — useful for new datasets and for tests.
"""

from __future__ import annotations

import dataclasses
import os
from typing import List, Optional

import yaml


@dataclasses.dataclass(frozen=True)
class SequenceInfo:
    name: str
    set: str = "train"
    year: Optional[str] = None
    num_frames: Optional[int] = None


def _read_yaml(path: str) -> dict:
    with open(path) as f:
        return yaml.safe_load(f)


def read_sequences_davis(
    db_info: str, sequences_root: str, year: Optional[str] = None, phase: str = "train"
) -> List[SequenceInfo]:
    """``configs/davis/config.py:91-108`` semantics."""
    recs = _read_yaml(db_info)["sequences"]
    out = []
    for r in recs:
        if year is not None and int(r.get("year", year)) > int(year):
            continue
        s = r.get("set", "train")
        if phase == "train-val":
            keep = s in ("train", "val")
        elif phase == "test":
            keep = s == "val"
        else:
            keep = s == phase and os.path.isdir(os.path.join(sequences_root, r["name"]))
        if keep:
            out.append(SequenceInfo(r["name"], s, str(r.get("year", "")), r.get("num_frames")))
    return out


def read_sequences_youtube(
    db_info: str, sequences_root: str, year: Optional[str] = None, phase: str = "train"
) -> List[SequenceInfo]:
    """``configs/youtube/config.py:92-110`` semantics (records keyed video_name)."""
    recs = _read_yaml(db_info)
    out = []
    for r in recs:
        s = r.get("set", "train")
        if phase == "train-val":
            keep = s in ("train", "val")
        elif phase == "test":
            keep = s == "val"
        else:
            keep = s == phase and os.path.isdir(os.path.join(sequences_root, r["video_name"]))
        if keep:
            out.append(SequenceInfo(r["video_name"], s, str(r.get("year", ""))))
    return out


def scan_sequences(sequences_root: str, phase: str = "train") -> List[SequenceInfo]:
    """Filesystem fallback: every subdirectory is one sequence in this phase."""
    if not os.path.isdir(sequences_root):
        return []
    names = sorted(
        d for d in os.listdir(sequences_root)
        if os.path.isdir(os.path.join(sequences_root, d))
    )
    return [SequenceInfo(n, phase) for n in names]


def read_sequences(
    dataset: str,
    sequences_root: str,
    db_info: Optional[str] = None,
    year: Optional[str] = None,
    phase: str = "train",
) -> List[SequenceInfo]:
    if db_info is None or not os.path.exists(db_info):
        return scan_sequences(sequences_root, phase)
    if "youtube" in dataset:
        return read_sequences_youtube(db_info, sequences_root, year, phase)
    return read_sequences_davis(db_info, sequences_root, year, phase)
