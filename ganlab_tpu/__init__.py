"""ganlab_tpu — a TPU-native JAX framework for adversarial image synthesis.

A from-scratch rebuild of the capability surface of ``sidward14/gan-lab``
(ResNet-GAN / ProGAN / StyleGAN training with progressive growing, equalized
learning rate, R1 / WGAN-GP penalties, generator EMA, truncation-trick
sampling), designed TPU-first:

* NHWC tensor layout and bfloat16-friendly compute so convs tile onto the MXU.
* One jit-compiled alternating G/D train step per progressive phase; the full
  max-resolution parameter pytree is materialized at init so progressive
  growth never mutates module structure (see ``ganlab_tpu.train``).
* Data parallelism over a ``jax.sharding.Mesh`` via ``shard_map`` with
  ``psum`` gradient reduction over ICI (see ``ganlab_tpu.parallel``).
* Hot composite ops (equalized-LR conv, pixelnorm, minibatch-stddev, AdaIN,
  fade-in upsample/downsample with FIR blur) as fused XLA/Pallas kernels
  (see ``ganlab_tpu.ops``).

The reference is a pure-Python PyTorch package with no native code and no
distribution layer (SURVEY.md section 2); everything here is a new design,
not a translation.
"""

__version__ = "0.1.0"

_API = {
    "Config": "ganlab_tpu.config",
    "get_config": "ganlab_tpu.config",
    "load_config": "ganlab_tpu.config",
    "Trainer": "ganlab_tpu.train.loop",
    "Learner": "ganlab_tpu.learners",
    "ResNetGANLearner": "ganlab_tpu.learners",
    "ProGANLearner": "ganlab_tpu.learners",
    "StyleGANLearner": "ganlab_tpu.learners",
    "build_models": "ganlab_tpu.models",
    "BatchSampler": "ganlab_tpu.serve",
    "ExportedSampler": "ganlab_tpu.export",
    "export_sampler": "ganlab_tpu.export",
}


def __getattr__(name):
    """Lazy top-level API (PEP 562): ``ganlab_tpu.Trainer`` etc. without
    importing jax/flax at package-import time."""
    if name in _API:
        import importlib

        return getattr(importlib.import_module(_API[name]), name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
