"""ProGAN generator/discriminator (Karras et al. 2017).

Rebuild of ``gan_lab/progan/architectures.py`` (SURVEY.md 2.2), TPU-first:

* The reference grows modules in place (``increase_scale()``); under XLA's
  static shapes we instead materialize EVERY resolution block and every
  toRGB/fromRGB head at init, and make the current resolution a *static*
  call argument (``res_log2``). Each progressive phase is then its own
  jitted program over an unchanged parameter pytree (SURVEY.md 3.3).
  Initialization runs the dedicated ``touch_all`` method, which exercises
  every block and head in a single trace so the full pytree exists up front.
* ``alpha`` is a traced scalar: during fade-in the output blends the new
  head with the upsampled previous head (``ops.fade_in``), so a whole fade
  phase is one compiled program.
* Layout NHWC; upsampling is nearest-2x (optionally fused with FIR blur for
  the StyleGAN discriminator variant), downsampling avg-pool-2x.

Channel counts follow the ProGAN rule nf(stage) = min(fmap_base / 2^stage,
fmap_max) via ``ModelConfig.nf``.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from ganlab_tpu.config import ModelConfig
from ganlab_tpu.models.layers import EqualConv, EqualDense
from ganlab_tpu.ops import (
    pixel_norm,
    minibatch_stddev,
    fade_in,
    upsample_nearest_2x,
    downsample_avg_2x,
    upsample_blur_2x,
    blur_downsample_2x,
)
from ganlab_tpu.ops.equalized import leaky_relu


def static_stable(alpha) -> bool:
    """True when ``alpha`` is the static Python constant 1.0 (stabilize
    phase). The fade branch is then skipped ENTIRELY at trace time: XLA
    cannot DCE ``0 * old_head`` itself (NaN semantics), so tracing it would
    pay the old head's compute and activation memory in every stabilize
    phase — at 1024^2 that dead branch alone is tens of MB of HBM."""
    return isinstance(alpha, (int, float)) and float(alpha) == 1.0


class GBlock(nn.Module):
    """One generator resolution block: upsample -> 2x (conv3x3 + lrelu + PN)."""

    features: int
    blur: bool = False
    # Fuse the upsample into conv0 (exact; see layers.EqualConv.up2):
    # True = lhs-dilated form, "poly"/"hybrid" = alternate forms,
    # False = two-op (measured fastest on v5e — config.ModelConfig).
    fused_up: bool | str = False
    fold: bool = False   # width-folded evaluation (ops/folded.py; exact)

    @nn.compact
    def __call__(self, x):
        if self.fold:
            from ganlab_tpu.ops import folded as fd

            x = fd.upsample_blur_2x_folded(x, blur=self.blur)
            x = EqualConv(self.features, 3, fold=True, name="conv0")(x)
            x = fd.pixel_norm_folded(fd.leaky_relu_folded(x))
            x = EqualConv(self.features, 3, fold=True, name="conv1")(x)
            x = fd.pixel_norm_folded(fd.leaky_relu_folded(x))
            return fd.unfold_w(x)
        if self.fused_up:
            form = self.fused_up if isinstance(self.fused_up, str) \
                else "dilated"
            x = EqualConv(self.features, 3,
                          up2="blur" if self.blur else "nearest",
                          up2_form=form,
                          name="conv0")(x)
        else:
            x = upsample_blur_2x(x) if self.blur else upsample_nearest_2x(x)
            x = EqualConv(self.features, 3, name="conv0")(x)
        x = pixel_norm(leaky_relu(x))
        x = EqualConv(self.features, 3, name="conv1")(x)
        x = pixel_norm(leaky_relu(x))
        return x


class GInputBlock(nn.Module):
    """4x4 input block: latent -> dense(4*4*nf) -> conv3x3 (ProGAN tab. 2)."""

    features: int

    @nn.compact
    def __call__(self, z):
        x = pixel_norm(z)  # latent normalization (ProGAN sec. 4.2)
        x = EqualDense(self.features * 16, gain=math.sqrt(2.0) / 4.0,
                       name="dense")(x)
        x = x.reshape(x.shape[0], 4, 4, self.features)
        x = pixel_norm(leaky_relu(x))
        x = EqualConv(self.features, 3, name="conv")(x)
        x = pixel_norm(leaky_relu(x))
        return x


class DBlock(nn.Module):
    """One discriminator block: 2x (conv3x3 + lrelu) -> downsample.

    ``fold``: evaluate width-folded (ops/folded.py; exact) — the fold is a
    reshape on entry, and the 2x downsample lands back on the unfolded
    width, so the output is unfolded either way.
    """

    features_in: int
    features_out: int
    blur: bool = False
    fold: bool = False
    # Residual variant (StyleGAN2 resnet D, an extension beyond the
    # reference): skip = 1x1 conv (no bias, gain 1) + downsample; the sum
    # is scaled by 1/sqrt(2). 1x1-then-downsample commutes exactly with
    # downsample-then-1x1, matching the official combined layer.
    resnet: bool = False

    @nn.compact
    def __call__(self, x):
        if self.resnet:
            assert not self.fold, "resnet DBlock does not implement fold"
            skip = EqualConv(self.features_out, 1, use_bias=False,
                             gain=1.0, name="skip")(x)
            skip = (blur_downsample_2x(skip) if self.blur
                    else downsample_avg_2x(skip))
            y = leaky_relu(EqualConv(self.features_in, 3, name="conv0")(x))
            y = leaky_relu(EqualConv(self.features_out, 3, name="conv1")(y))
            y = blur_downsample_2x(y) if self.blur else downsample_avg_2x(y)
            return (y + skip) * jnp.asarray(0.7071067811865476, y.dtype)
        if self.fold:
            from ganlab_tpu.ops import folded as fd

            x = fd.fold_w(x)
            x = fd.leaky_relu_folded(
                EqualConv(self.features_in, 3, fold=True, name="conv0")(x))
            x = fd.leaky_relu_folded(
                EqualConv(self.features_out, 3, fold=True, name="conv1")(x))
            return fd.blur_downsample_2x_folded(x, blur=self.blur)
        x = leaky_relu(EqualConv(self.features_in, 3, name="conv0")(x))
        x = leaky_relu(EqualConv(self.features_out, 3, name="conv1")(x))
        x = blur_downsample_2x(x) if self.blur else downsample_avg_2x(x)
        return x


class DOutputBlock(nn.Module):
    """Final 4x4 block: mbstd -> conv3x3 -> dense -> score."""

    features: int
    mbstd_group_size: int | None = None

    @nn.compact
    def __call__(self, x):
        x = minibatch_stddev(x, self.mbstd_group_size)
        x = leaky_relu(EqualConv(self.features, 3, name="conv")(x))
        x = x.reshape(x.shape[0], -1)
        x = leaky_relu(EqualDense(self.features, name="dense")(x))
        x = EqualDense(1, gain=1.0, name="score")(x)
        return x[:, 0]


class ProGenerator(nn.Module):
    """Progressive generator. Call with static ``res_log2`` and traced alpha.

    ``__call__(z, res_log2=k, alpha=a)`` produces a (N, 2^k, 2^k, C) image
    in [-1, 1]-ish range (no output activation, as in the reference).
    """

    cfg: ModelConfig
    blur: bool = False  # blur after upsample (StyleGAN-style G resampling)

    def setup(self):
        cfg = self.cfg
        max_lg = cfg.res_log2
        # cfg.remat: recompute each resolution block in the backward pass
        # instead of keeping its activations — trades FLOPs for HBM so the
        # 1024^2 config fits (SURVEY.md 7, B:11).
        block_cls = nn.remat(GBlock) if cfg.remat else GBlock
        self.input_block = GInputBlock(cfg.nf(1), name="block4")
        self.blocks = tuple(
            block_cls(cfg.nf(stage - 1), blur=self.blur,
                      fused_up=cfg.fused_up_conv,
                      fold=cfg.fold_block(stage),
                      name=f"block{2 ** stage}")
            for stage in range(3, max_lg + 1))
        self.torgb = tuple(
            EqualConv(cfg.img_channels, 1, gain=1.0, name=f"torgb{2 ** lg}")
            for lg in range(2, max_lg + 1))

    def __call__(self, z, res_log2: int | None = None, alpha=1.0):
        lg = self.cfg.res_log2 if res_log2 is None else res_log2
        assert 2 <= lg <= self.cfg.res_log2, (lg, self.cfg.res_log2)

        x = self.input_block(z)
        if lg == 2:
            return self.torgb[0](x)
        prev = None
        for stage in range(3, lg + 1):
            prev = x
            x = self.blocks[stage - 3](x)
        new_rgb = self.torgb[lg - 2](x)
        if static_stable(alpha):
            return new_rgb
        old_rgb = upsample_nearest_2x(self.torgb[lg - 3](prev))
        return fade_in(alpha, new_rgb, old_rgb)

    def touch_all(self, z):
        """Run every block and head once — used only under ``init`` so the
        FULL parameter pytree is materialized regardless of starting phase."""
        x = self.input_block(z)
        out = jnp.sum(self.torgb[0](x))
        for i, block in enumerate(self.blocks):
            x = block(x)
            out = out + jnp.sum(self.torgb[i + 1](x))
        return out

    def init_all(self, rng, batch: int = 1, dtype=jnp.float32):
        z = jnp.zeros((batch, self.cfg.latent_dim), dtype)
        return self.init(rng, z, method=ProGenerator.touch_all)


class ProDiscriminator(nn.Module):
    """Progressive discriminator; mirror of the generator.

    ``blur_resample=True`` enables the StyleGAN variant where each
    downsample is preceded by the FIR blur (fused into one strided
    depthwise conv).
    """

    cfg: ModelConfig
    blur_resample: bool = False

    def setup(self):
        cfg = self.cfg
        max_lg = cfg.res_log2
        block_cls = nn.remat(DBlock) if cfg.remat else DBlock
        self.fromrgb = tuple(
            EqualConv(cfg.nf(lg - 1), 1, name=f"fromrgb{2 ** lg}")
            for lg in range(2, max_lg + 1))
        self.blocks = tuple(
            block_cls(cfg.nf(lg - 1), cfg.nf(lg - 2),
                      blur=self.blur_resample,
                      fold=cfg.fold_block(lg) and not cfg.d_resnet,
                      resnet=cfg.d_resnet,
                      name=f"block{2 ** lg}")
            for lg in range(3, max_lg + 1))
        self.out_block = DOutputBlock(cfg.nf(1), cfg.mbstd_group_size,
                                      name="block4_out")

    def __call__(self, img, res_log2: int | None = None, alpha=1.0):
        lg = self.cfg.res_log2 if res_log2 is None else res_log2
        assert 2 <= lg <= self.cfg.res_log2, (lg, self.cfg.res_log2)

        if lg == 2:
            x = leaky_relu(self.fromrgb[0](img))
        else:
            x = leaky_relu(self.fromrgb[lg - 2](img))
            x = self.blocks[lg - 3](x)
            if not static_stable(alpha):
                # Fade-in: blend with the previous head on a downsampled
                # image (skipped entirely in stabilize phases).
                img_lo = downsample_avg_2x(img)
                x_old = leaky_relu(self.fromrgb[lg - 3](img_lo))
                x = fade_in(alpha, x, x_old)
            for lg2 in range(lg - 1, 2, -1):
                x = self.blocks[lg2 - 3](x)
        return self.out_block(x)

    def touch_all(self, img):
        """Init-only: run every fromRGB head and block once (single trace)."""
        max_lg = self.cfg.res_log2
        imgs = {max_lg: img}
        for lg in range(max_lg - 1, 1, -1):
            imgs[lg] = downsample_avg_2x(imgs[lg + 1])
        x = leaky_relu(self.fromrgb[max_lg - 2](imgs[max_lg]))
        acc = jnp.float32(0.0)
        for lg in range(max_lg, 2, -1):
            x = self.blocks[lg - 3](x)
            x_skip = leaky_relu(self.fromrgb[lg - 3](imgs[lg - 1]))
            x = x + 0.0 * x_skip  # touch the head without changing stats
        return jnp.sum(self.out_block(x)) + acc

    def init_all(self, rng, batch: int = 2, dtype=jnp.float32):
        img = jnp.zeros((batch, self.cfg.resolution, self.cfg.resolution,
                         self.cfg.img_channels), dtype)
        return self.init(rng, img, method=ProDiscriminator.touch_all)
