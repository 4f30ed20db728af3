"""Input pipeline: uint8 image streams with per-resolution serving.

Replaces the reference's torchvision transform stacks + DataLoader
(``gan_lab/utils/data_utils.py``, SURVEY.md 2.2), TPU-first:

* the host serves raw **uint8** batches (1 byte/pixel over PCIe/ICI);
  normalization to [-1, 1] and random horizontal flips happen **on device
  inside the jitted train step** (see ``train/steps._preprocess``) — the
  reference does all of this on the CPU in float32;
* per-resolution serving for progressive growing: sources either load
  pre-resized shards (``ganlab prepare-data``) or box-downsample from the
  max resolution on the fly (exact mean-pool for power-of-two factors);
* a background-thread prefetcher keeps the next batches ready and
  device-put so the step never waits on the host.
"""

from ganlab_tpu.data.pipeline import (
    EllipsesSource,
    SyntheticSource,
    ArraySource,
    NpySource,
    Cifar10Source,
    ImageFolderSource,
    Prefetcher,
    make_source,
)
from ganlab_tpu.data.prepare import prepare_dataset
