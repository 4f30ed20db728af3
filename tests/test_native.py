"""Native C++ gather kernels vs the numpy reference (bit-exact parity)."""

import numpy as np
import pytest

from ganlab_tpu.data import native
from ganlab_tpu.data.pipeline import box_downsample


@pytest.fixture(scope="module")
def lib_available():
    if not native.available():
        pytest.skip("native library unavailable (no g++)")
    return True


def test_builds_and_loads(lib_available):
    assert native.get_lib() is not None


def test_gather_parity(lib_available):
    rng = np.random.RandomState(0)
    src = rng.randint(0, 256, (32, 16, 16, 3), dtype=np.uint8)
    idx = rng.randint(0, 32, size=11).astype(np.int64)
    out = native.gather(src, idx)
    np.testing.assert_array_equal(out, src[idx])


def test_gather_downsample_parity(lib_available):
    rng = np.random.RandomState(1)
    src = rng.randint(0, 256, (16, 32, 32, 3), dtype=np.uint8)
    idx = rng.randint(0, 16, size=7).astype(np.int64)
    for factor in (2, 4, 8):
        out = native.gather(src, idx, factor)
        ref = box_downsample(np.ascontiguousarray(src[idx]), factor)
        np.testing.assert_array_equal(out, ref)


def test_gather_from_memmap(lib_available, tmp_path):
    rng = np.random.RandomState(2)
    src = rng.randint(0, 256, (8, 8, 8, 3), dtype=np.uint8)
    path = tmp_path / "imgs.npy"
    np.save(path, src)
    mm = np.load(path, mmap_mode="r")
    idx = np.array([7, 0, 3], dtype=np.int64)
    out = native.gather(mm, idx, 2)
    ref = box_downsample(np.ascontiguousarray(src[idx]), 2)
    np.testing.assert_array_equal(out, ref)


def test_pipeline_uses_same_values_either_path(lib_available):
    """Source batches are identical whether or not the native path is used
    (same RNG stream, bit-equal gather)."""
    from ganlab_tpu.data import SyntheticSource

    s1 = SyntheticSource(32, num_images=16, seed=3)
    b_native = s1.batch(4, 16)

    s2 = SyntheticSource(32, num_images=16, seed=3)
    idx = s2._rng.integers(0, 16, size=4)
    ref = box_downsample(np.ascontiguousarray(s2._images[idx]), 2)
    np.testing.assert_array_equal(b_native, ref)
