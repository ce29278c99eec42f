"""Data pipeline tests on a synthetic on-disk dataset."""

import os

import numpy as np
import pytest
from PIL import Image

from mumpy_tpu.configs.data_config import DataConfig
from mumpy_tpu.data.augment import _pscc
from mumpy_tpu.data.dataset import ClipDataset, DataLoader, build_clips


@pytest.fixture(scope="module")
def fake_davis(tmp_path_factory):
    root = tmp_path_factory.mktemp("davis")
    seqs = {"bear": 5, "boat": 4}
    rng = np.random.default_rng(0)
    for stream in ("vi", "cp"):
        for name, n in seqs.items():
            d = root / stream / name
            d.mkdir(parents=True)
            for i in range(n):
                arr = rng.integers(0, 255, size=(32, 48, 3), dtype=np.uint8)
                Image.fromarray(arr).save(d / f"{i:05d}.png")
    for name, n in seqs.items():
        d = root / "annot" / name
        d.mkdir(parents=True)
        for i in range(n):
            m = np.zeros((32, 48), np.uint8)
            m[8:16, 8:24] = 255
            Image.fromarray(m).save(d / f"{i:05d}.png")
    return DataConfig(
        dataset="davis",
        sequences=str(root / "vi"),
        sequences2=str(root / "cp"),
        sequences3=None,
        annotations=str(root / "annot"),
        db_info=None,  # filesystem scan
        input_res=(16, 16),
        batch_size=2,
        length_clip=3,
    )


def test_clip_windows_clamped(fake_davis):
    clips = build_clips(fake_davis, "train")
    # one clip per frame: 5 + 4
    assert len(clips) == 9
    bear = [c for c in clips if c.seq_name == "bear"]
    # first clip clamps left edge: frames (0,0,1); last clamps right: (3,4,4)
    assert bear[0].frame_files == ("00000.png", "00000.png", "00001.png")
    assert bear[-1].frame_files == ("00003.png", "00004.png", "00004.png")
    assert bear[2].frame_files == ("00001.png", "00002.png", "00003.png")
    assert bear[2].starting_frame == 2


def test_multilateral_batch_shapes(fake_davis):
    ds = ClipDataset(fake_davis, "train")
    loader = DataLoader(ds, batch_size=2, shuffle=True, drop_last=True, seed=0)
    batch = next(iter(loader))
    # 2 streams concatenated on batch: (2*2, 3, 16, 16, 3)
    assert batch["image"].shape == (4, 3, 16, 16, 3)
    assert batch["mask"].shape == (4, 16 * 16)
    # masks duplicated across streams
    np.testing.assert_array_equal(batch["mask"][:2], batch["mask"][2:])
    assert set(np.unique(batch["mask"])) <= {0.0, 1.0}


def test_test_split_single_stream(fake_davis):
    ds = ClipDataset(fake_davis, "test")
    loader = DataLoader(ds, batch_size=1, shuffle=False, drop_last=False)
    batch = next(iter(loader))
    assert batch["image"].shape == (1, 3, 16, 16, 3)
    assert batch["seq_name"][0] in ("bear", "boat")
    assert isinstance(batch["starting_frame"][0], int)


def test_normalization_range(fake_davis):
    ds = ClipDataset(fake_davis, "train")
    streams, mask, _, _ = ds.load_clip(0)
    # normalized with reference mean/std: roughly centered
    assert streams[0].dtype == np.float32
    assert -3.0 < streams[0].mean() < 3.0


def test_threaded_loader_matches_serial(fake_davis):
    """num_workers>0 prefetch yields byte-identical batches in the same order."""
    ds = ClipDataset(fake_davis, "train")
    a = list(DataLoader(ds, 2, shuffle=True, drop_last=True, seed=3))
    ds2 = ClipDataset(fake_davis, "train")
    b = list(DataLoader(ds2, 2, shuffle=True, drop_last=True, seed=3, num_workers=4))
    assert len(a) == len(b) > 0
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x["image"], y["image"])
        np.testing.assert_array_equal(x["mask"], y["mask"])


def test_indexed_png_roundtrip(tmp_path):
    from mumpy_tpu.utils.io import imread_indexed, imwrite_indexed

    labels = np.zeros((8, 8), np.uint8)
    labels[2:5, 3:7] = 1
    path = str(tmp_path / "m.png")
    imwrite_indexed(path, labels)
    back, palette = imread_indexed(path)
    np.testing.assert_array_equal(back, labels)
    assert palette is not None and tuple(palette[1]) == (128, 0, 0)


def test_double_augment_strategy(fake_davis):
    """DoubleAugmentStrategy (``randaugment.py:606-631``): shape-changing op then
    restored to the working resolution; mask stays binary and frames stay uint8."""
    from mumpy_tpu.data.augment import double_clip_augment

    rng = np.random.default_rng(0)
    frames = [[rng.integers(0, 255, (32, 32, 3), dtype=np.uint8) for _ in range(3)]
              for _ in range(2)]
    mask = np.zeros((32, 32), np.float32)
    mask[10:20, 12:24] = 255.0
    for seed in range(8):
        s2, m2 = double_clip_augment(
            [list(f) for f in frames], mask.copy(), np.random.default_rng(seed)
        )
        assert m2.shape == (32, 32) and s2[0][0].shape == (32, 32, 3)
        assert s2[0][0].dtype == np.uint8


def test_double_augment_in_dataset(fake_davis):
    import dataclasses

    cfg = dataclasses.replace(fake_davis, single_augment=False)
    ds = ClipDataset(cfg, "train")
    streams, mask, _, _ = ds.load_clip(0, np.random.default_rng(1))
    assert streams[0].shape == (3, 16, 16, 3)
    assert set(np.unique(mask)) <= {0.0, 1.0}


def test_get_dataset_facade(fake_davis):
    from mumpy_tpu.data.dataset import get_dataset

    ds = get_dataset(fake_davis, "train")
    assert len(ds) == 9


@pytest.mark.parametrize("variant", range(8))
def test_pscc_matches_pil(variant):
    rng = np.random.default_rng(variant)
    arr = rng.integers(0, 255, size=(6, 6, 3), dtype=np.uint8)
    img = Image.fromarray(arr)
    if variant == 0:
        ref = img
    elif variant in (1, 2, 3):
        ref = img.rotate(90 * variant, expand=True)
    elif variant == 4:
        ref = img.transpose(Image.FLIP_TOP_BOTTOM)
    else:
        ref = img.rotate(90 * (variant - 4), expand=True).transpose(Image.FLIP_TOP_BOTTOM)
    np.testing.assert_array_equal(_pscc(arr, variant), np.asarray(ref))


def test_lmdb_frame_index(fake_davis, monkeypatch):
    """LMDB sequence->frame-list index parity with the filesystem scan
    (``dataloaders/base.py:55-60``), via a stubbed ``lmdb`` module."""
    import dataclasses
    import sys
    import types

    # build the index content the reference's packing scripts would produce:
    # key = sequence basename, value = '|'-joined frame filenames
    fs_clips = build_clips(fake_davis, "train")
    db = {}
    for name in {c.seq_name for c in fs_clips}:
        seq_dir = os.path.join(fake_davis.sequences, name)
        db[name.encode()] = "|".join(sorted(os.listdir(seq_dir))).encode()

    class _Txn:
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

        def get(self, key):
            return db.get(key)

    class _Env:
        def begin(self):
            return _Txn()

    stub = types.ModuleType("lmdb")
    stub.open = lambda path, **kw: _Env()
    monkeypatch.setitem(sys.modules, "lmdb", stub)

    cfg = dataclasses.replace(fake_davis, lmdb_index="/nonexistent/index.lmdb")
    lmdb_clips = build_clips(cfg, "train")
    assert lmdb_clips == fs_clips


def test_lmdb_index_requires_package(fake_davis, monkeypatch):
    import dataclasses
    import sys

    monkeypatch.setitem(sys.modules, "lmdb", None)  # force ImportError
    cfg = dataclasses.replace(fake_davis, lmdb_index="/nonexistent/index.lmdb")
    with pytest.raises(ImportError, match="lmdb"):
        build_clips(cfg, "train")
