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


@pytest.fixture(scope="module")
def fake_ytvi(tmp_path_factory):
    """Three inpainting streams (the YTVI training config: ``scripts/
    train_youtube.sh`` feeds SEQUENCES/SEQUENCES2/SEQUENCES3)."""
    import dataclasses

    root = tmp_path_factory.mktemp("ytvi")
    seqs = {"vid0": 5, "vid1": 4}
    rng = np.random.default_rng(7)
    # distinct per-stream pixel content so stream ordering is checkable
    for si, stream in enumerate(("ff", "eg2", "isvi")):
        for name, n in seqs.items():
            d = root / stream / name
            d.mkdir(parents=True)
            for i in range(n):
                arr = rng.integers(0, 255, size=(32, 48, 3), dtype=np.uint8)
                arr[..., 0] = 40 * si + 10  # stream fingerprint in channel 0
                Image.fromarray(arr).save(d / f"{i:05d}.jpg", quality=100)
    for name, n in seqs.items():
        d = root / "annot" / name
        d.mkdir(parents=True)
        for i in range(n):
            m = np.zeros((32, 48), np.uint8)
            m[8:16, 8:24] = 255
            Image.fromarray(m).save(d / f"{i:05d}.png")
    return DataConfig(
        dataset="youtubevos",
        sequences=str(root / "ff"),
        sequences2=str(root / "eg2"),
        sequences3=str(root / "isvi"),
        annotations=str(root / "annot"),
        db_info=None,
        input_res=(16, 16),
        batch_size=2,
        length_clip=3,
        frame_ext="jpg",
        augment=False,  # ordering checks need raw pixels
    )


def test_triple_stream_collate(fake_ytvi):
    """3-stream batches follow ``collate_fn_triple`` (``universaldataset.py:
    175-203``): images = cat([s1, s2, s3]) on batch, masks duplicated x3,
    stream order preserved."""
    ds = ClipDataset(fake_ytvi, "train")
    assert len(ds.stream_roots) == 3
    loader = DataLoader(ds, batch_size=2, shuffle=True, drop_last=True, seed=0)
    batch = next(iter(loader))
    assert batch["image"].shape == (6, 3, 16, 16, 3)
    assert batch["mask"].shape == (6, 16 * 16)
    # masks duplicated across all three stream blocks
    np.testing.assert_array_equal(batch["mask"][:2], batch["mask"][2:4])
    np.testing.assert_array_equal(batch["mask"][:2], batch["mask"][4:6])
    # stream blocks keep the root order: undo normalization on channel 0 and
    # recover each stream's fingerprint (40*si + 10)
    from mumpy_tpu.configs.data_config import MEAN, STD

    ch0 = batch["image"][..., 0] * STD[0] + MEAN[0]
    for si in range(3):
        block = ch0[2 * si : 2 * si + 2]
        expect = (40 * si + 10) / 255.0
        # JPEG chroma subsampling shifts the per-channel mean a little;
        # half the 40/255 stream spacing still separates the streams
        assert abs(float(block.mean()) - expect) < 0.078, (si, block.mean())


def test_triple_stream_augment_consistent(fake_ytvi):
    """With augmentation on, the same clip-consistent transform applies to all
    three streams and the mask (one RandAugment draw per clip, ``randaugment.py``
    usage at ``universaldataset.py:58-61``)."""
    import dataclasses

    cfg = dataclasses.replace(fake_ytvi, augment=True)
    ds = ClipDataset(cfg, "train")
    streams, mask, _, _ = ds.load_clip(0, np.random.default_rng(3))
    assert len(streams) == 3
    assert all(s.shape == (3, 16, 16, 3) for s in streams)
    assert set(np.unique(mask)) <= {0.0, 1.0}
    # fingerprints survive any geometric augment (channel 0 is constant per
    # stream), proving no cross-stream mixing happened
    from mumpy_tpu.configs.data_config import MEAN, STD

    for si, s in enumerate(streams):
        ch0 = s[..., 0] * STD[0] + MEAN[0]
        assert abs(float(ch0.mean()) - (40 * si + 10) / 255.0) < 0.078


def test_triple_stream_test_split_uses_primary(fake_ytvi):
    """The test split serves the PRIMARY stream only (``universaldataset.py``
    test path), even when three roots are configured."""
    ds = ClipDataset(fake_ytvi, "test")
    assert len(ds.stream_roots) == 1
    loader = DataLoader(ds, batch_size=1, shuffle=False, drop_last=False)
    batch = next(iter(loader))
    assert batch["image"].shape == (1, 3, 16, 16, 3)


def test_triple_stream_worker_loader_identical(fake_ytvi):
    """Process workers reproduce the serial 3-stream batches byte-for-byte."""
    ds = ClipDataset(fake_ytvi, "train")
    a = list(DataLoader(ds, 2, shuffle=True, drop_last=True, seed=5))
    ds2 = ClipDataset(fake_ytvi, "train")
    b = list(DataLoader(ds2, 2, shuffle=True, drop_last=True, seed=5,
                        num_workers=2))
    assert len(a) == len(b) > 0
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x["image"], y["image"])
        np.testing.assert_array_equal(x["mask"], y["mask"])


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
