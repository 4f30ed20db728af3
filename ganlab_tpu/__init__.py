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
