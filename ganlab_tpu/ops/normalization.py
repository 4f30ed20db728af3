"""Normalization ops: pixelnorm, instance norm, AdaIN (NHWC).

Replaces the reference's torch elementwise composites (SURVEY.md 2.1):
``NormalizeLayer``-style pixelnorm and the StyleGAN AdaIN modulation
(instance-norm + per-style affine). All single-pass formulations so XLA
fuses them into the neighbouring conv epilogues.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pixel_norm(x: jax.Array, eps: float = 1e-8) -> jax.Array:
    """x * rsqrt(mean(x^2, channel) + eps).

    Channel axis is the last axis (NHWC); also used on (N, latent) vectors at
    the top of the mapping network (ProGAN sec. 4.2). Dispatches to the
    single-pass Pallas kernel when that backend is enabled.
    """
    from ganlab_tpu.ops import pallas as plops

    if plops.use_pallas():
        return plops.pixel_norm_pallas(x, eps)
    ms = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
    return x * jax.lax.rsqrt(ms + jnp.asarray(eps, x.dtype))


def instance_norm(x: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Per-sample, per-channel spatial normalization (no learned affine).

    x: (N, H, W, C). Matches torch InstanceNorm2d(affine=False) with
    biased variance.
    """
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=(1, 2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + jnp.asarray(eps, x.dtype))


def adain(x: jax.Array, style_scale: jax.Array, style_bias: jax.Array,
          eps: float = 1e-8) -> jax.Array:
    """Adaptive instance normalization (StyleGAN, Karras et al. 2018 eq. 1).

    AdaIN(x, y) = y_s * instance_norm(x) + y_b.

    x: (N, H, W, C); style_scale/style_bias: (N, C) — the outputs of the
    learned affine "A" on w (the scale affine's bias is initialized to 1 in
    the model so y_s starts at 1). With the Pallas backend enabled this
    dispatches to the one-pass fused kernel when a per-image tile fits VMEM.
    """
    from ganlab_tpu.ops import pallas as plops

    if plops.use_pallas():
        from ganlab_tpu.ops.pallas.adain import adain_pallas, fits_vmem

        n, h, w, c = x.shape
        if fits_vmem(h, w, c):
            return adain_pallas(x, style_scale, style_bias, eps)
    y = instance_norm(x, eps)
    return y * style_scale[:, None, None, :] + style_bias[:, None, None, :]
