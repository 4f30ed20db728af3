"""ResNet-GAN generator/discriminator (fixed-resolution, CIFAR-scale).

Rebuild of ``gan_lab/resnetgan/architectures.py`` (SURVEY.md 2.2): the
WGAN-GP-style ResNet architecture (Gulrajani et al.) — a dense stem to 4x4
followed by residual up-blocks in G, and residual down-blocks with a mean
pooled head in D. Fixed resolution (BASELINE.json config 1: 32x32), no
progressive machinery. NHWC layout; batch-norm-free D (gradient penalties
forbid batch statistics), batch-norm-free G using equalized convs like the
rest of the framework.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
from flax import linen as nn

from ganlab_tpu.config import ModelConfig
from ganlab_tpu.models.layers import EqualConv, EqualDense
from ganlab_tpu.ops import upsample_nearest_2x, downsample_avg_2x
from ganlab_tpu.ops.equalized import leaky_relu


class ResUpBlock(nn.Module):
    """Residual block with 2x upsampling (generator)."""

    features: int

    @nn.compact
    def __call__(self, x):
        skip = upsample_nearest_2x(x)
        if skip.shape[-1] != self.features:
            skip = EqualConv(self.features, 1, gain=1.0, use_bias=False,
                             name="skip")(skip)
        h = leaky_relu(x)
        h = upsample_nearest_2x(h)
        h = leaky_relu(EqualConv(self.features, 3, name="conv0")(h))
        h = EqualConv(self.features, 3, name="conv1")(h)
        return (skip + h) * jnp.asarray(1.0 / math.sqrt(2.0), x.dtype)


class ResDownBlock(nn.Module):
    """Residual block with 2x average-pool downsampling (discriminator)."""

    features: int
    downsample: bool = True

    @nn.compact
    def __call__(self, x):
        skip = x
        if self.downsample:
            skip = downsample_avg_2x(skip)
        if skip.shape[-1] != self.features:
            skip = EqualConv(self.features, 1, gain=1.0, use_bias=False,
                             name="skip")(skip)
        h = leaky_relu(EqualConv(self.features, 3, name="conv0")(x))
        h = EqualConv(self.features, 3, name="conv1")(h)
        if self.downsample:
            h = downsample_avg_2x(h)
        return (skip + h) * jnp.asarray(1.0 / math.sqrt(2.0), x.dtype)


class ResNetGenerator(nn.Module):
    cfg: ModelConfig

    @nn.compact
    def __call__(self, z, res_log2: int | None = None, alpha=1.0):
        # res_log2/alpha accepted for API uniformity; fixed-res model.
        cfg = self.cfg
        n_up = cfg.res_log2 - 2
        ch = cfg.base_channels
        x = EqualDense(4 * 4 * ch, name="dense")(z)
        x = x.reshape(x.shape[0], 4, 4, ch)
        for i in range(n_up):
            x = ResUpBlock(ch, name=f"up{i}")(x)
        x = leaky_relu(x)
        x = EqualConv(cfg.img_channels, 3, gain=1.0, name="torgb")(x)
        return jnp.tanh(x)

    def init_all(self, rng, batch: int = 1, dtype=jnp.float32):
        z = jnp.zeros((batch, self.cfg.latent_dim), dtype)
        return self.init(rng, z)


class ResNetDiscriminator(nn.Module):
    cfg: ModelConfig

    @nn.compact
    def __call__(self, img, res_log2: int | None = None, alpha=1.0):
        cfg = self.cfg
        n_down = cfg.res_log2 - 2
        ch = cfg.base_channels
        x = EqualConv(ch, 3, name="fromrgb")(img)
        for i in range(n_down):
            x = ResDownBlock(ch, name=f"down{i}")(x)
        x = ResDownBlock(ch, downsample=False, name="final")(x)
        x = leaky_relu(x)
        x = jnp.mean(x, axis=(1, 2))          # global average pool
        x = EqualDense(1, gain=1.0, name="score")(x)
        return x[:, 0]

    def init_all(self, rng, batch: int = 2, dtype=jnp.float32):
        img = jnp.zeros((batch, self.cfg.resolution, self.cfg.resolution,
                         self.cfg.img_channels), dtype)
        return self.init(rng, img)
