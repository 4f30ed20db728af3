"""StyleGAN2-style G/D pair (Karras et al. 2019) — a capability EXTENSION
beyond the gan-lab reference (which covers ResNetGAN/ProGAN/StyleGAN1;
SURVEY.md 2.2). Shares the framework's mapping network, resample ops,
trainer, EMA/truncation/mixing plumbing, losses and eval stack.

Differences from the StyleGAN1 generator (models/stylegan.py):

* AdaIN is replaced by weight (de)modulation — ``ops.modulated_conv2d``
  (activation-side formulation: one shared-weight conv on the MXU).
* Skip architecture: every resolution emits RGB via a modulated 1x1
  toRGB (demodulate=False) and the upsampled RGBs accumulate — no
  progressive fade-in, no per-phase heads. ``alpha`` is accepted for
  trainer-API compatibility and ignored (the preset trains fixed-res,
  ``schedule.progressive=False``).
* The discriminator is the ProGAN/StyleGAN one with FIR-blurred
  resampling, optionally with residual blocks (``ModelConfig.d_resnet``,
  the paper's resnet D): skip = 1x1-conv + blur-down, scaled 1/sqrt(2).

Style indexing: ``ws`` keeps the (N, L, w_dim) layout with
L = 2*(res_log2 - 1) (models/stylegan.py::num_style_layers), so style
mixing and truncation work unchanged. Conv layers consume indices
0..L-2 and each resolution's toRGB consumes the NEXT index (the official
StyleGAN2 scheme: toRGB shares the dlatent of the following conv; the
top toRGB takes L-1), so every style row is live.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from ganlab_tpu.config import ModelConfig
from ganlab_tpu.models.layers import EqualDense, NoiseInjection, ConstInput
from ganlab_tpu.models.stylegan import MappingNetwork, num_style_layers
from ganlab_tpu.ops import upsample_blur_2x
from ganlab_tpu.ops.equalized import leaky_relu
from ganlab_tpu.ops.modulated import modulated_conv2d


def noise_shapes(res_log2: int) -> list:
    """(H, W) of each explicit noise map, in noise-layer order: one 4x4
    map (conv4), then two maps per resolution 8..2^res_log2 (conv0/conv1
    of each skip block). toRGB layers take no noise (activate=False)."""
    return [(4, 4)] + [
        (2 ** lg, 2 ** lg)
        for lg in range(3, res_log2 + 1) for _ in range(2)]


class ModulatedLayer(nn.Module):
    """Style affine -> modulated conv (+demod) -> noise -> bias -> lrelu.

    Gain bookkeeping (ADVICE r2): under demodulation the He sqrt(2)
    folded into the conv weight is exactly cancelled (scaling the weight
    scales the demod factor by the inverse), so the official recipe's
    per-layer gain must come from the activation instead — the
    ``fused_bias_act`` lrelu gain sqrt(2), applied post-activation here.
    The non-demodulated toRGB path passes ``gain=1.0`` so its output
    scale matches this codebase's (and the official) toRGB convention.
    """

    features: int
    kernel: int = 3
    demodulate: bool = True
    activate: bool = True
    gain: float = math.sqrt(2.0)

    @nn.compact
    def __call__(self, x, w_vec, noise=None):
        ci = x.shape[-1]
        s = EqualDense(ci, gain=1.0, bias_init=1.0, name="affine")(w_vec)
        wk = self.param(
            "w", nn.initializers.normal(1.0),
            (self.kernel, self.kernel, ci, self.features))
        y = modulated_conv2d(x, wk.astype(x.dtype), s,
                             demodulate=self.demodulate, gain=self.gain)
        if self.activate:
            y = NoiseInjection(name="noise")(y, noise=noise)
        b = self.param("b", nn.initializers.zeros, (self.features,))
        y = y + b.astype(y.dtype)
        if self.activate:
            return leaky_relu(y) * jnp.asarray(math.sqrt(2.0), y.dtype)
        return y


class ToRGB(nn.Module):
    """Modulated 1x1 conv to image channels, no demodulation (paper)."""

    img_channels: int = 3

    @nn.compact
    def __call__(self, x, w_vec):
        return ModulatedLayer(self.img_channels, kernel=1,
                              demodulate=False, activate=False,
                              gain=1.0, name="conv")(x, w_vec)


class Synthesis2Block(nn.Module):
    """up(+blur) -> modconv/epilogue x2 (one resolution of the skip G)."""

    features: int

    @nn.compact
    def __call__(self, x, w_a, w_b, noise_a=None, noise_b=None):
        x = upsample_blur_2x(x)
        x = ModulatedLayer(self.features, name="conv0")(x, w_a, noise=noise_a)
        x = ModulatedLayer(self.features, name="conv1")(x, w_b, noise=noise_b)
        return x


class Synthesis2Network(nn.Module):
    """Skip-architecture synthesis: per-res toRGB, upsampled accumulation."""

    cfg: ModelConfig

    def setup(self):
        cfg = self.cfg
        max_lg = cfg.res_log2
        self.const = ConstInput(cfg.nf(1), name="const")
        self.conv4 = ModulatedLayer(cfg.nf(1), name="conv4")
        self.blocks = tuple(
            Synthesis2Block(cfg.nf(lg - 1), name=f"block{2 ** lg}")
            for lg in range(3, max_lg + 1))
        self.torgb = tuple(
            ToRGB(cfg.img_channels, name=f"torgb{2 ** lg}")
            for lg in range(2, max_lg + 1))

    def __call__(self, ws, res_log2: int | None = None, alpha=1.0,
                 noises=None):
        """ws: (N, L, w_dim); alpha accepted and ignored (skip arch).

        ``noises``: optional explicit noise maps in noise-layer order
        (:func:`noise_shapes` — one 4x4 map, then two per resolution);
        None draws from the 'noise' RNG stream."""
        del alpha
        lg = self.cfg.res_log2 if res_log2 is None else res_log2
        assert 2 <= lg <= self.cfg.res_log2

        x = self.const(ws.shape[0], ws.dtype)
        x = self.conv4(x, ws[:, 0],
                       noise=None if noises is None else noises[0])
        # Each toRGB consumes the NEXT style index (the official StyleGAN2
        # indexing: toRGB shares the dlatent of the following conv layer;
        # the top one takes the final index L-1) — every one of the
        # L = 2*(lg-1) style rows is consumed.
        rgb = self.torgb[0](x, ws[:, 1])
        for i in range(lg - 2):
            if noises is None:
                x = self.blocks[i](x, ws[:, 2 * i + 1], ws[:, 2 * i + 2])
            else:
                x = self.blocks[i](x, ws[:, 2 * i + 1], ws[:, 2 * i + 2],
                                   noises[2 * i + 1], noises[2 * i + 2])
            rgb = upsample_blur_2x(rgb) + \
                self.torgb[i + 1](x, ws[:, 2 * i + 3])
        return rgb

    def touch_all(self, ws):
        return jnp.sum(self(ws))


class StyleGAN2Generator(nn.Module):
    """Mapping + skip synthesis; same public surface as StyleGenerator
    (map_latents / synthesize / mixing via z2+crossover / touch_all)."""

    cfg: ModelConfig

    def setup(self):
        self.mapping = MappingNetwork(self.cfg, name="mapping")
        self.synthesis = Synthesis2Network(self.cfg, name="synthesis")

    def map_latents(self, z):
        return self.mapping(z)

    def synthesize(self, ws, res_log2: int | None = None, alpha=1.0,
                   noises=None):
        return self.synthesis(ws, res_log2, alpha, noises)

    def __call__(self, z, res_log2: int | None = None, alpha=1.0,
                 z2=None, crossover=None):
        from ganlab_tpu.models.stylegan import mix_styles

        lg = self.cfg.res_log2 if res_log2 is None else res_log2
        nl = num_style_layers(lg)
        w1 = self.mapping(z)
        if z2 is None:
            ws = jnp.repeat(w1[:, None, :], nl, axis=1)
        else:
            w2 = self.mapping(z2)
            cross = nl if crossover is None else crossover
            ws = mix_styles(w1, w2, cross, nl)
        return self.synthesis(ws, lg, alpha)

    def touch_all(self, z):
        w = self.mapping(z)
        ws = jnp.repeat(w[:, None, :], num_style_layers(self.cfg.res_log2),
                        axis=1)
        return self.synthesis.touch_all(ws)

    def init_all(self, rng, batch: int = 1, dtype=jnp.float32):
        z = jnp.zeros((batch, self.cfg.latent_dim), dtype)
        return self.init(rng, z, method=StyleGAN2Generator.touch_all)
