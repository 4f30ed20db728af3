"""Data pipeline tests: sources, downsampling, prefetch, prepare-data."""

import numpy as np
import pytest

from ganlab_tpu.data import (
    ArraySource,
    NpySource,
    Prefetcher,
    SyntheticSource,
    make_source,
    prepare_dataset,
)
from ganlab_tpu.data.pipeline import box_downsample
from ganlab_tpu.config import DataConfig


def test_box_downsample_exact_mean():
    x = np.arange(4 * 4, dtype=np.uint8).reshape(1, 4, 4, 1)
    y = box_downsample(x, 2)
    assert y.shape == (1, 2, 2, 1)
    # Independent oracle: mean of each 2x2 block, round-half-up.
    expected = np.empty((2, 2, 1), np.uint8)
    for i in range(2):
        for j in range(2):
            block = x[0, 2 * i:2 * i + 2, 2 * j:2 * j + 2, 0]
            expected[i, j, 0] = int(block.astype(np.float32).mean() + 0.5)
    np.testing.assert_array_equal(y[0], expected)


def test_synthetic_source_deterministic_and_shaped():
    s1 = SyntheticSource(32, num_images=16, seed=3)
    s2 = SyntheticSource(32, num_images=16, seed=3)
    b1, b2 = s1.batch(4, 32), s2.batch(4, 32)
    assert b1.shape == (4, 32, 32, 3) and b1.dtype == np.uint8
    np.testing.assert_array_equal(b1, b2)
    # Lower-resolution serving.
    assert s1.batch(4, 8).shape == (4, 8, 8, 3)


def test_array_source_multi_res():
    imgs = np.random.RandomState(0).randint(0, 255, (10, 16, 16, 3),
                                            dtype=np.uint8)
    src = ArraySource(imgs)
    assert src.batch(3, 16).shape == (3, 16, 16, 3)
    assert src.batch(3, 4).shape == (3, 4, 4, 3)
    with pytest.raises(AssertionError):
        src.batch(3, 32)


def test_prepare_dataset_and_npy_source(tmp_path):
    from PIL import Image

    src_dir = tmp_path / "raw"
    src_dir.mkdir()
    rng = np.random.RandomState(1)
    for i in range(5):
        arr = rng.randint(0, 255, (40, 30, 3), dtype=np.uint8)
        Image.fromarray(arr).save(src_dir / f"img{i}.png")

    out = tmp_path / "prepared"
    written = prepare_dataset(str(src_dir), str(out), max_res=16)
    assert sorted(written) == [4, 8, 16]

    src = NpySource(str(out))
    b16 = src.batch(2, 16)
    b8 = src.batch(2, 8)
    assert b16.shape == (2, 16, 16, 3)
    assert b8.shape == (2, 8, 8, 3)
    # The 8px shard is exactly the box-downsampled 16px shard.
    a16 = np.load(out / "images_16.npy")
    a8 = np.load(out / "images_8.npy")
    np.testing.assert_array_equal(a8, box_downsample(a16, 2))


def test_prefetcher_delivers_and_stops():
    src = SyntheticSource(16, num_images=8)
    seen = []
    with Prefetcher(src, 4, 16, place=lambda b: b + 0) as pf:
        for _ in range(5):
            seen.append(pf.next())
    assert all(b.shape == (4, 16, 16, 3) for b in seen)


def test_make_source_dispatch():
    assert isinstance(make_source(DataConfig(dataset="synthetic"), 32),
                      SyntheticSource)
    with pytest.raises(ValueError):
        make_source(DataConfig(dataset="bogus"), 32)
    with pytest.raises(ValueError):
        make_source(DataConfig(dataset="cifar10"), 32)  # needs data_dir


def test_grain_image_folder_source(tmp_path):
    from PIL import Image

    from ganlab_tpu.data.grain_source import GrainImageFolderSource

    src_dir = tmp_path / "gimgs"
    src_dir.mkdir()
    rng = np.random.RandomState(5)
    for i in range(6):
        Image.fromarray(rng.randint(0, 255, (24, 20, 3), dtype=np.uint8)
                        ).save(src_dir / f"{i}.png")

    src = GrainImageFolderSource(str(src_dir), resolution=16, seed=1,
                                 num_workers=0)
    b = src.batch(4, 16)
    assert b.shape == (4, 16, 16, 3) and b.dtype == np.uint8
    # Lower resolution serving rebuilds the pipeline at that res.
    b8 = src.batch(4, 8)
    assert b8.shape == (4, 8, 8, 3)
    # Streaming repeats forever.
    for _ in range(3):
        assert src.batch(4, 16).shape == (4, 16, 16, 3)


def test_cifar10_source_from_pickles(tmp_path):
    """Cifar10Source reads the standard python pickle batch format."""
    import pickle

    from ganlab_tpu.data import Cifar10Source

    d = tmp_path / "cifar-10-batches-py"
    d.mkdir()
    rng = np.random.RandomState(0)
    for i in range(1, 6):
        data = rng.randint(0, 256, (20, 3 * 32 * 32), dtype=np.uint8)
        with open(d / f"data_batch_{i}", "wb") as f:
            pickle.dump({b"data": data, b"labels": [0] * 20}, f)

    src = Cifar10Source(str(tmp_path))
    assert src.num_images == 100 and src.resolution == 32
    b = src.batch(8, 32)
    assert b.shape == (8, 32, 32, 3) and b.dtype == np.uint8
    assert src.batch(4, 16).shape == (4, 16, 16, 3)

    # make_source rejects a resolution the source cannot serve.
    from ganlab_tpu.config import DataConfig
    from ganlab_tpu.data import make_source

    with pytest.raises(ValueError, match="serves up to"):
        make_source(DataConfig(dataset="cifar10", data_dir=str(tmp_path)),
                    64)


class TestEllipsesSource:
    """Procedural structured source (r3): deterministic per (seed, idx),
    effectively infinite pool, resolution-independent rendering."""

    def test_deterministic_per_index(self):
        from ganlab_tpu.data import EllipsesSource
        a = EllipsesSource(64, seed=3)
        b = EllipsesSource(64, seed=3)
        idx = np.array([0, 1, 7, 123456789])
        np.testing.assert_array_equal(a.render(idx, 64), b.render(idx, 64))
        # different seed -> different images
        c = EllipsesSource(64, seed=4)
        assert (a.render(idx, 64) != c.render(idx, 64)).any()

    def test_batch_shape_dtype_and_diversity(self):
        from ganlab_tpu.data import EllipsesSource
        s = EllipsesSource(64, seed=0)
        x = s.batch(16, 64)
        assert x.shape == (16, 64, 64, 3) and x.dtype == np.uint8
        # images are distinct (infinite pool) and structured (an ellipse
        # brightens part of the frame above the dark background)
        flat = x.reshape(16, -1)
        assert len({f.tobytes() for f in flat}) == 16
        # structured, not flat noise: every frame has an ellipse standing
        # out from its background (nontrivial spatial variance), and the
        # frame is mostly background (median stays in the dark bg range)
        assert (flat.astype(np.float32).std(axis=1) > 10.0).all()
        assert (np.median(flat, axis=1) < 130).all()

    def test_multi_resolution_consistent_distribution(self):
        from ganlab_tpu.data import EllipsesSource
        s = EllipsesSource(256, seed=1)
        idx = np.arange(8)
        hi = s.render(idx, 256)
        lo = s.render(idx, 32)
        assert lo.shape == (8, 32, 32, 3)
        # same underlying scene: 8x box-downsample of the hi render matches
        # the direct lo render up to the soft-edge difference
        down = box_downsample(hi, 8).astype(np.int32)
        assert np.abs(down - lo.astype(np.int32)).mean() < 8.0

    def test_small_pool_repeats(self):
        from ganlab_tpu.data import EllipsesSource
        s = EllipsesSource(32, num_images=4, seed=0)
        x = s.batch(64, 32)
        uniq = {f.tobytes() for f in x.reshape(64, -1)}
        assert len(uniq) <= 4                            # pool is honored

    def test_factory_wiring(self):
        from ganlab_tpu.data import EllipsesSource
        s = make_source(DataConfig(dataset="ellipses"), 64)
        assert isinstance(s, EllipsesSource) and s.num_images == 1 << 30
        s = make_source(DataConfig(dataset="ellipses", num_images=256), 64)
        assert s.num_images == 256
        s = make_source(DataConfig(dataset="synthetic", num_images=512), 32)
        assert s.num_images == 512
