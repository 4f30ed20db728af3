"""Dataset preparation: the reference's ``data_config`` entry (SURVEY.md 3.5).

``prepare_dataset`` decodes an image folder once, center-crops to square,
Lanczos-resizes to the maximum resolution, and writes per-resolution uint8
``images_<res>.npy`` shards (each exactly 2x-downsampled from the previous),
so the training pipeline serves every progressive phase from a memory-mapped
exact-resolution file with zero per-batch resampling.
"""

from __future__ import annotations

import os

import numpy as np

from ganlab_tpu.config import res_to_log2
from ganlab_tpu.data.pipeline import ImageFolderSource, box_downsample


def prepare_dataset(src_dir: str, out_dir: str, max_res: int,
                    min_res: int = 4, limit: int | None = None) -> dict:
    """Returns {resolution: path} of the written shards."""
    res_to_log2(max_res)
    os.makedirs(out_dir, exist_ok=True)
    src = ImageFolderSource(src_dir, max_res, limit=limit)
    imgs = src._images  # (N, R, R, 3) uint8

    written = {}
    res = max_res
    cur = imgs
    while res >= min_res:
        path = os.path.join(out_dir, f"images_{res}.npy")
        np.save(path, cur)
        written[res] = path
        res //= 2
        if res >= min_res:
            cur = _bulk_downsample_2x(cur)
    return written


def _bulk_downsample_2x(imgs: np.ndarray) -> np.ndarray:
    """2x box-downsample the whole array; the threaded native kernel when
    built (identity gather + fused downsample), numpy otherwise."""
    from ganlab_tpu.data import native

    idx = np.arange(imgs.shape[0], dtype=np.int64)
    out = native.gather(imgs, idx, 2)
    return out if out is not None else box_downsample(imgs, 2)
