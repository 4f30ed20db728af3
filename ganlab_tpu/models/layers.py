"""Equalized-LR building-block layers (flax linen).

The reference's ``Conv2dEx`` / ``LinearEx`` / noise / style layers from
``gan_lab/utils/custom_layers.py`` (SURVEY.md 2.2), rebuilt as thin linen
wrappers over the pure ops in ``ganlab_tpu.ops``. Weights are stored
N(0, 1/lr_mult)-initialized and rescaled at call time (equalized learning
rate, ProGAN sec. 4.1); XLA folds the scalar into the conv/GEMM.
"""

from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

from ganlab_tpu.ops import equalized as eq


def _scaled_normal(lr_mult: float) -> Callable:
    std = 1.0 / lr_mult

    def init(key, shape, dtype=jnp.float32):
        return jax.random.normal(key, shape, dtype) * std

    return init


class EqualDense(nn.Module):
    """Equalized-LR fully connected layer (reference ``LinearEx``)."""

    features: int
    gain: float = math.sqrt(2.0)
    lr_mult: float = 1.0
    use_bias: bool = True
    bias_init: float = 0.0

    @nn.compact
    def __call__(self, x):
        w = self.param("w", _scaled_normal(self.lr_mult),
                       (x.shape[-1], self.features))
        b = None
        if self.use_bias:
            b = self.param(
                "b", lambda k, s: jnp.full(s, self.bias_init, jnp.float32),
                (self.features,))
        return eq.equalized_dense(x, w.astype(x.dtype),
                                  None if b is None else b.astype(x.dtype),
                                  gain=self.gain, lr_mult=self.lr_mult)


class EqualConv(nn.Module):
    """Equalized-LR conv (reference ``Conv2dEx``), NHWC/HWIO.

    ``up2`` fuses a preceding 2x upsample into this conv as ONE composed
    lhs-dilated convolution (``ops.upfirdn.up2_conv2d``): "nearest" for the
    plain ProGAN G resampling, "blur" for StyleGAN's nearest+FIR. Exact to
    the two-op form (boundary-ring corrected); the weight stays the
    ordinary (k, k, I, O) tensor, so checkpoints are interchangeable with
    the unfused path.
    """

    features: int
    kernel: int = 3
    stride: int = 1
    gain: float = math.sqrt(2.0)
    lr_mult: float = 1.0
    use_bias: bool = True
    padding: str | int = "SAME"
    up2: str | None = None             # None | 'nearest' | 'blur'
    up2_form: str = "dilated"          # 'dilated' | 'poly' | 'hybrid'
    fold: bool = False                 # x is width-folded (ops/folded.py)

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        if self.fold:
            from ganlab_tpu.ops import folded as fd

            in_ch = in_ch // fd.FOLD
        w = self.param("w", _scaled_normal(self.lr_mult),
                       (self.kernel, self.kernel, in_ch, self.features))
        b = None
        if self.use_bias:
            b = self.param("b", nn.initializers.zeros, (self.features,))
        if self.fold:
            assert self.stride == 1 and self.padding == "SAME" \
                and self.up2 is None, self
            return eq.equalized_conv2d_folded(
                x, w.astype(x.dtype),
                None if b is None else b.astype(x.dtype),
                gain=self.gain, lr_mult=self.lr_mult)
        if self.up2 is not None:
            assert self.stride == 1 and self.padding == "SAME", self
            return eq.equalized_conv2d_up2(
                x, w.astype(x.dtype),
                None if b is None else b.astype(x.dtype),
                taps=None if self.up2 == "nearest" else (1.0, 2.0, 1.0),
                form=self.up2_form,
                gain=self.gain, lr_mult=self.lr_mult)
        return eq.equalized_conv2d(x, w.astype(x.dtype),
                                   None if b is None else b.astype(x.dtype),
                                   stride=self.stride, padding=self.padding,
                                   gain=self.gain, lr_mult=self.lr_mult)


class NoiseInjection(nn.Module):
    """StyleGAN per-layer noise: x + scale_c * noise (Karras et al. 2018).

    ``scale`` is a learned per-channel weight initialized to zero; the noise
    image is single-channel, broadcast over channels, fresh per call via the
    provided RNG (or an explicit noise input for deterministic sampling).
    """

    fold: bool = False                 # x is width-folded (ops/folded.py)

    @nn.compact
    def __call__(self, x, noise=None, *, rng=None):
        if self.fold:
            from ganlab_tpu.ops import folded as fd

            scale = self.param("scale", nn.initializers.zeros,
                               (x.shape[-1] // fd.FOLD,))
            assert noise is None, "explicit noise unsupported when folded"
            if rng is None:
                rng = self.make_rng("noise")
            return fd.noise_folded(x, scale, rng)
        scale = self.param("scale", nn.initializers.zeros, (x.shape[-1],))
        if noise is None:
            if rng is None:
                rng = self.make_rng("noise")
            noise = jax.random.normal(
                rng, (x.shape[0], x.shape[1], x.shape[2], 1), x.dtype)
        return x + scale.astype(x.dtype) * noise


class StyleAffine(nn.Module):
    """The learned affine "A": w -> (y_scale, y_bias) for AdaIN.

    The scale head's bias initializes to 1 so modulation starts as identity
    (StyleGAN appendix; reference uses the equivalent 1+gamma form).
    """

    channels: int

    @nn.compact
    def __call__(self, w):
        ys = EqualDense(self.channels, gain=1.0, bias_init=1.0,
                        name="scale")(w)
        yb = EqualDense(self.channels, gain=1.0, name="bias")(w)
        return ys, yb


class ConstInput(nn.Module):
    """StyleGAN's learned constant 4x4 input tensor."""

    channels: int
    size: int = 4

    @nn.compact
    def __call__(self, batch: int, dtype=jnp.float32):
        c = self.param("const", nn.initializers.ones,
                       (1, self.size, self.size, self.channels))
        return jnp.broadcast_to(c.astype(dtype),
                                (batch, self.size, self.size, self.channels))
