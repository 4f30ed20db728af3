"""StyleGAN generator (Karras et al. 2018, "A Style-Based Generator...").

Rebuild of ``gan_lab/stylegan/architectures.py`` (SURVEY.md 2.2):

* ``MappingNetwork``: pixelnorm(z) -> 8-layer equalized MLP (lr_mult 0.01,
  the paper's lambda' = 0.01 * lambda) -> w.
* ``SynthesisNetwork``: learned constant 4x4 input; per-layer noise
  injection, bias, LeakyReLU, AdaIN style modulation; 2 style layers per
  resolution; progressive fade-in identical to ProGAN.
* Style mixing and the truncation trick operate on the per-layer W tensor
  ``ws (N, L, w_dim)`` with *traced* crossover/cutoff indices (jnp.where
  over layer indices), so mixing regularization and truncated sampling both
  run inside a single jitted program — no recompilation per crossover point
  (TPU-first; SURVEY.md 3.4).

The discriminator is the ProGAN one with blurred resampling
(``ProDiscriminator(blur_resample=True)``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ganlab_tpu.config import ModelConfig
from ganlab_tpu.models.layers import (
    EqualConv,
    EqualDense,
    NoiseInjection,
    StyleAffine,
    ConstInput,
)
from ganlab_tpu.models.progan import static_stable
from ganlab_tpu.ops import (
    pixel_norm,
    adain,
    fade_in,
    upsample_nearest_2x,
    upsample_blur_2x,
)
from ganlab_tpu.ops.equalized import leaky_relu


def num_style_layers(res_log2: int) -> int:
    """Two AdaIN layers per resolution from 4x4 up: L = 2*(res_log2 - 1)."""
    return 2 * (res_log2 - 1)


def noise_shapes(res_log2: int) -> list:
    """(H, W) of each explicit noise map, in style-layer index order:
    two 4x4 maps, then two maps per resolution 8..2^res_log2."""
    return [(4, 4), (4, 4)] + [
        (2 ** lg, 2 ** lg)
        for lg in range(3, res_log2 + 1) for _ in range(2)]


class MappingNetwork(nn.Module):
    """Z -> W: pixelnorm then 8 equalized FC+LeakyReLU layers (lr_mult 0.01)."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, z):
        x = pixel_norm(z)
        for i in range(self.cfg.mapping_layers):
            x = leaky_relu(
                EqualDense(self.cfg.latent_dim,
                           lr_mult=self.cfg.mapping_lr_mult,
                           name=f"fc{i}")(x))
        return x


class StyleLayer(nn.Module):
    """Noise -> bias -> LeakyReLU -> AdaIN ("layer epilogue"), after a conv.

    The conv (if any) is applied by the caller without bias; the bias lives
    here so XLA fuses noise-add + bias + lrelu + instance-norm + style affine
    into one elementwise epilogue on the conv output. With ``fold`` the
    whole epilogue runs on the width-folded representation (ops/folded.py)
    — same parameters, exact same math.
    """

    channels: int
    fold: bool = False

    @nn.compact
    def __call__(self, x, w, noise=None):
        x = NoiseInjection(name="noise", fold=self.fold)(x, noise=noise)
        b = self.param("bias", nn.initializers.zeros, (self.channels,))
        ys, yb = StyleAffine(self.channels, name="style")(w)
        if self.fold:
            from ganlab_tpu.ops import folded as fd

            x = leaky_relu(fd.bias_folded(x, b))
            return fd.adain_folded(x, ys, yb)
        x = leaky_relu(x + b.astype(x.dtype))
        return adain(x, ys.astype(x.dtype), yb.astype(x.dtype))


class SynthesisBlock(nn.Module):
    """One synthesis resolution block: up(+blur) -> conv/epilogue x2.

    A standalone module so ``model.remat`` can rematerialize whole blocks
    in the backward pass (1024^2 HBM fit, SURVEY.md 7 B:11).

    ``fold``: evaluate the whole block WIDTH-FOLDED (ops/folded.py) —
    exact same math and parameters, but the low-channel high-res tensors
    fill the TPU's 128-lane tiles. Input and output stay unfolded
    (fold/unfold are reshapes).
    """

    features: int
    blur: bool = True
    # Fuse the upsample into conv0 (exact; see layers.EqualConv.up2):
    # True = lhs-dilated form, "poly"/"hybrid" = alternate forms,
    # False = two-op (measured fastest on v5e — config.ModelConfig).
    fused_up: bool | str = False
    fold: bool = False

    @nn.compact
    def __call__(self, x, w_a, w_b, noise_a=None, noise_b=None):
        if self.fold:
            from ganlab_tpu.ops import folded as fd

            assert noise_a is None and noise_b is None, \
                "explicit noise unsupported when folded"
            x = fd.upsample_blur_2x_folded(x, blur=self.blur)
            x = EqualConv(self.features, 3, use_bias=False, fold=True,
                          name="conv0")(x)
            x = StyleLayer(self.features, fold=True, name="style0")(x, w_a)
            x = EqualConv(self.features, 3, use_bias=False, fold=True,
                          name="conv1")(x)
            x = StyleLayer(self.features, fold=True, name="style1")(x, w_b)
            return fd.unfold_w(x)
        if self.fused_up:
            form = self.fused_up if isinstance(self.fused_up, str) \
                else "dilated"
            x = EqualConv(self.features, 3, use_bias=False,
                          up2="blur" if self.blur else "nearest",
                          up2_form=form,
                          name="conv0")(x)
        else:
            x = upsample_blur_2x(x) if self.blur else upsample_nearest_2x(x)
            x = EqualConv(self.features, 3, use_bias=False, name="conv0")(x)
        x = StyleLayer(self.features, name="style0")(x, w_a, noise=noise_a)
        x = EqualConv(self.features, 3, use_bias=False, name="conv1")(x)
        x = StyleLayer(self.features, name="style1")(x, w_b, noise=noise_b)
        return x


class SynthesisNetwork(nn.Module):
    """The style-based synthesis network g(w); progressive like ProGAN."""

    cfg: ModelConfig
    blur: bool = True  # FIR blur fused into each upsample (paper app. C)

    def setup(self):
        cfg = self.cfg
        max_lg = cfg.res_log2
        self.const = ConstInput(cfg.nf(1), name="const")
        # Resolution 4: [epilogue on const, conv3x3 + epilogue].
        self.conv4 = EqualConv(cfg.nf(1), 3, use_bias=False, name="conv4")
        self.style4_0 = StyleLayer(cfg.nf(1), name="style4_0")
        self.style4_1 = StyleLayer(cfg.nf(1), name="style4_1")
        # Resolutions 8..max: one SynthesisBlock each (remat-wrapped when
        # cfg.remat — activations recomputed in backward).
        block_cls = nn.remat(SynthesisBlock) if cfg.remat else SynthesisBlock
        self.blocks = tuple(
            block_cls(cfg.nf(lg - 1), blur=self.blur,
                      fused_up=cfg.fused_up_conv,
                      fold=cfg.fold_block(lg),
                      name=f"block{2 ** lg}")
            for lg in range(3, max_lg + 1))
        self.torgb = tuple(
            EqualConv(cfg.img_channels, 1, gain=1.0, name=f"torgb{2 ** lg}")
            for lg in range(2, max_lg + 1))

    def _block4(self, ws, batch, dtype, noises=None):
        x = self.const(batch, dtype)
        x = self.style4_0(x, ws[:, 0],
                          noise=None if noises is None else noises[0])
        x = self.conv4(x)
        x = self.style4_1(x, ws[:, 1],
                          noise=None if noises is None else noises[1])
        return x

    def _block(self, i, x, ws, noises=None):
        """Block for resolution 2**(i+3); consumes style layers 2i+2, 2i+3."""
        if noises is None:
            return self.blocks[i](x, ws[:, 2 * i + 2], ws[:, 2 * i + 3])
        return self.blocks[i](x, ws[:, 2 * i + 2], ws[:, 2 * i + 3],
                              noises[2 * i + 2], noises[2 * i + 3])

    def __call__(self, ws, res_log2: int | None = None, alpha=1.0,
                 noises=None):
        """ws: (N, L, w_dim) per-layer styles; returns (N, 2^lg, 2^lg, C).

        ``noises``: optional per-style-layer explicit noise maps (sequence
        of (N, H_l, W_l, 1), one per style layer in index order — the
        shapes of :func:`noise_shapes`). None draws fresh noise from the
        'noise' RNG stream; explicit maps make synthesis a deterministic
        function of its inputs (the projector optimizes them)."""
        lg = self.cfg.res_log2 if res_log2 is None else res_log2
        assert 2 <= lg <= self.cfg.res_log2

        x = self._block4(ws, ws.shape[0], ws.dtype, noises)
        if lg == 2:
            return self.torgb[0](x)
        prev = None
        for i in range(lg - 2):
            prev = x
            x = self._block(i, x, ws, noises)
        new_rgb = self.torgb[lg - 2](x)
        if static_stable(alpha):
            # Stabilize phase: skip the dead fade branch at trace time
            # (XLA cannot DCE 0*old_rgb; see models/progan.py).
            return new_rgb
        old_rgb = upsample_nearest_2x(self.torgb[lg - 3](prev))
        return fade_in(alpha, new_rgb, old_rgb)

    def touch_all(self, ws):
        """Init-only single trace exercising every conv/style/toRGB param."""
        x = self._block4(ws, ws.shape[0], ws.dtype)
        out = jnp.sum(self.torgb[0](x))
        for i in range(self.cfg.res_log2 - 2):
            x = self._block(i, x, ws)
            out = out + jnp.sum(self.torgb[i + 1](x))
        return out


def mix_styles(w1, w2, crossover, num_layers: int):
    """Broadcast two w vectors into per-layer ws with a traced crossover.

    Layers < crossover take w1, layers >= crossover take w2 (StyleGAN
    mixing regularization). ``crossover`` may be a traced int; passing
    ``num_layers`` disables mixing.
    """
    idx = jnp.arange(num_layers)[None, :, None]          # (1, L, 1)
    cross = jnp.asarray(crossover)
    cross = cross.reshape(-1, 1, 1) if cross.ndim else cross[None, None, None]
    return jnp.where(idx < cross, w1[:, None, :], w2[:, None, :])


def truncate_ws(ws, w_avg, psi, cutoff: int | jax.Array):
    """Truncation trick: w <- w_avg + psi*(w - w_avg) for layers < cutoff."""
    idx = jnp.arange(ws.shape[1])[None, :, None]
    psi_per_layer = jnp.where(idx < jnp.asarray(cutoff),
                              jnp.asarray(psi, ws.dtype),
                              jnp.ones((), ws.dtype))
    return w_avg[None, None, :] + psi_per_layer * (ws - w_avg[None, None, :])


class StyleGenerator(nn.Module):
    """Mapping + synthesis, with style mixing plumbing.

    ``__call__(z, res_log2, alpha, z2=None, crossover=None)``:
    * z2/crossover implement mixing regularization; both may be traced.
    * returns the image; use ``map_latents`` / ``synthesize`` for the pieces
      (e.g. truncation-trick sampling operates on ws between the two).
    """

    cfg: ModelConfig
    blur: bool = True

    def setup(self):
        self.mapping = MappingNetwork(self.cfg, name="mapping")
        self.synthesis = SynthesisNetwork(self.cfg, blur=self.blur,
                                          name="synthesis")

    def map_latents(self, z):
        return self.mapping(z)

    def synthesize(self, ws, res_log2: int | None = None, alpha=1.0,
                   noises=None):
        return self.synthesis(ws, res_log2, alpha, noises)

    def __call__(self, z, res_log2: int | None = None, alpha=1.0,
                 z2=None, crossover=None):
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
        return self.init(rng, z, method=StyleGenerator.touch_all)
