"""grain-based streaming image-folder source (decode on the fly).

For datasets too large to preload (FFHQ-scale at 1024^2), this source
decodes/crops/resizes with a pool of grain worker processes instead of
materializing a uint8 array up front (``ImageFolderSource``) or requiring a
prepared shard (``NpySource``). Serves the same ``batch(batch_size, res)``
interface; a grain ``MapDataset`` pipeline is (re)built lazily per
(batch_size, resolution) — once per progressive phase.
"""

from __future__ import annotations

import os
from typing import Iterator

import numpy as np

import grain

from ganlab_tpu.data.pipeline import _center_crop_square


class _DecodeResize(grain.transforms.Map):
    def __init__(self, resolution: int):
        self.resolution = resolution

    def map(self, path: str) -> np.ndarray:
        from PIL import Image

        img = Image.open(path).convert("RGB")
        img = _center_crop_square(img)
        img = img.resize((self.resolution, self.resolution), Image.LANCZOS)
        return np.asarray(img, np.uint8)


class GrainImageFolderSource:
    """Streaming folder source with parallel decode workers."""

    EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".webp")

    def __init__(self, data_dir: str, resolution: int, seed: int = 0,
                 num_workers: int = 8):
        self._paths = [os.path.join(data_dir, n)
                       for n in sorted(os.listdir(data_dir))
                       if n.lower().endswith(self.EXTS)]
        if not self._paths:
            raise FileNotFoundError(f"no images in {data_dir}")
        self.resolution = resolution
        self.num_images = len(self._paths)
        self._seed = seed
        self._workers = num_workers
        self._iters: dict[tuple[int, int], Iterator] = {}

    def _make_iter(self, batch_size: int, res: int) -> Iterator:
        ds = (
            grain.MapDataset.source(self._paths)
            .shuffle(seed=self._seed)
            .repeat()
            .map(_DecodeResize(res))
            .batch(batch_size)
        )
        it = ds.to_iter_dataset()
        if self._workers > 1:
            it = it.mp_prefetch(grain.MultiprocessingOptions(
                num_workers=self._workers))
        return iter(it)

    def batch(self, batch_size: int, res: int) -> np.ndarray:
        assert res <= self.resolution
        key = (batch_size, res)
        if key not in self._iters:
            # One live pipeline at a time: progressive phases supersede each
            # other, and each mp_prefetch iterator owns a worker-process
            # pool that must not accumulate across phases.
            for old in self._iters.values():
                close = getattr(old, "close", None)
                if close is not None:
                    close()
            self._iters = {key: self._make_iter(batch_size, res)}
        out = next(self._iters[key])
        return np.asarray(out, np.uint8)
