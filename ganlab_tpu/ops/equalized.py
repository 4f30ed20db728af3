"""Equalized learning rate ops (ProGAN sec. 4.1; Karras et al. 2017).

The reference implements this as ``Conv2dEx`` / ``LinearEx`` torch wrappers
that multiply the weight by the He constant at every forward pass
(SURVEY.md section 2.2, ``gan_lab/utils/custom_layers.py``). Here the runtime
scale is a scalar multiplication that XLA folds directly into the convolution
/ matmul, so the MXU sees a single scaled GEMM — no extra memory pass.

Conventions:
* weights are stored N(0, 1/lr_mult)-initialized; the effective weight is
  ``w * he_constant(fan_in, gain) * lr_mult``.
* ``lr_mult`` implements StyleGAN's reduced mapping-network learning rate
  (lambda' = 0.01 * lambda, Karras et al. 2018 appendix) without touching the
  optimizer: scaling the parameter down at init and up at runtime multiplies
  the effective per-parameter step size by ``lr_mult``.
* conv layout is NHWC / HWIO (TPU-native).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

CONV_DIMS = ("NHWC", "HWIO", "NHWC")


def he_constant(fan_in: int, gain: float = math.sqrt(2.0)) -> float:
    """Runtime weight scale c = gain / sqrt(fan_in) (He init constant)."""
    return gain / math.sqrt(float(fan_in))


def equalized_dense(
    x: jax.Array,
    w: jax.Array,
    b: jax.Array | None = None,
    *,
    gain: float = math.sqrt(2.0),
    lr_mult: float = 1.0,
) -> jax.Array:
    """y = x @ (w * c * lr_mult) + b * lr_mult, with c = gain/sqrt(fan_in).

    ``w`` has shape (in_features, out_features). The scale is applied to the
    *weight*, not the activations, to match the reference semantics exactly
    (it changes gradient magnitudes relative to scaling x).
    """
    fan_in = w.shape[0]
    scale = he_constant(fan_in, gain) * lr_mult
    y = jnp.dot(x, w * jnp.asarray(scale, w.dtype), preferred_element_type=x.dtype)
    if b is not None:
        y = y + (b * jnp.asarray(lr_mult, b.dtype)).astype(y.dtype)
    return y


def equalized_conv2d(
    x: jax.Array,
    w: jax.Array,
    b: jax.Array | None = None,
    *,
    stride: int = 1,
    padding: str | int = "SAME",
    gain: float = math.sqrt(2.0),
    lr_mult: float = 1.0,
) -> jax.Array:
    """Equalized-LR 2D convolution, NHWC/HWIO.

    ``w`` has shape (kh, kw, in_ch, out_ch); fan_in = kh*kw*in_ch.
    """
    kh, kw, in_ch, _ = w.shape
    scale = he_constant(kh * kw * in_ch, gain) * lr_mult
    if isinstance(padding, int):
        pad = [(padding, padding), (padding, padding)]
    else:
        pad = padding
    y = lax.conv_general_dilated(
        x,
        (w * jnp.asarray(scale, w.dtype)).astype(x.dtype),
        window_strides=(stride, stride),
        padding=pad,
        dimension_numbers=CONV_DIMS,
    )
    if b is not None:
        y = y + (b * jnp.asarray(lr_mult, b.dtype)).astype(y.dtype)
    return y


def equalized_conv2d_up2(
    x: jax.Array,
    w: jax.Array,
    b: jax.Array | None = None,
    *,
    taps=(1.0, 2.0, 1.0),
    form: str = "dilated",
    gain: float = math.sqrt(2.0),
    lr_mult: float = 1.0,
) -> jax.Array:
    """Fused ``equalized_conv2d(upsample[_blur]_2x(x), w)`` in one conv.

    The He constant is computed from the ORIGINAL (kh, kw, in_ch) fan-in —
    the fusion is a pure evaluation-order change, not a semantics change
    (parity-tested against the two-op form). ``taps=None`` = nearest-up
    (ProGAN G); default taps = nearest-up + FIR blur (StyleGAN G).
    ``form``: 'dilated' | 'poly' | 'hybrid' (fused fwd, two-op bwd).
    """
    from ganlab_tpu.ops.upfirdn import up2_conv2d, up2_conv2d_hybrid

    kh, kw, in_ch, _ = w.shape
    scale = he_constant(kh * kw * in_ch, gain) * lr_mult
    ws = w * jnp.asarray(scale, w.dtype)
    if form == "hybrid":
        if taps is None:
            raise ValueError(
                "form='hybrid' supports only the blur taps (nearest-up "
                "has no hybrid variant) — use form='dilated' or 'poly'")
        y = up2_conv2d_hybrid(x, ws)
    else:
        y = up2_conv2d(x, ws, taps=taps, polyphase=form == "poly")
    if b is not None:
        y = y + (b * jnp.asarray(lr_mult, b.dtype)).astype(y.dtype)
    return y


def equalized_conv2d_folded(
    x_f: jax.Array,
    w: jax.Array,
    b: jax.Array | None = None,
    *,
    gain: float = math.sqrt(2.0),
    lr_mult: float = 1.0,
) -> jax.Array:
    """Equalized-LR SAME conv evaluated on a WIDTH-FOLDED activation.

    ``w`` is the ordinary logical (kh, kw, in_ch, out_ch) weight — the
    folded kernel is built at call time (ops/folded.py), so parameters and
    checkpoints are identical to the unfolded path. The He constant uses
    the logical fan-in: pure evaluation-order change, parity-tested.
    """
    from ganlab_tpu.ops import folded as fd

    kh, kw, in_ch, _ = w.shape
    scale = he_constant(kh * kw * in_ch, gain) * lr_mult
    y = fd.conv2d_folded(x_f, (w * jnp.asarray(scale, w.dtype)))
    if b is not None:
        y = fd.bias_folded(y, b * jnp.asarray(lr_mult, b.dtype))
    return y


def leaky_relu(x: jax.Array, slope: float = 0.2) -> jax.Array:
    """LeakyReLU(0.2), the activation used throughout ProGAN/StyleGAN."""
    return jnp.where(x >= 0, x, x * jnp.asarray(slope, x.dtype))
