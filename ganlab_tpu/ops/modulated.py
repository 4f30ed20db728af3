"""Modulated convolution with weight demodulation (StyleGAN2, Karras et
al. 2019 sec. 2.2) — a capability EXTENSION beyond the gan-lab reference
(which implements StyleGAN1's AdaIN; SURVEY.md 2.1).

TPU-native formulation: instead of materializing per-sample weights
(N, kh, kw, Ci, Co) and running grouped convs (the reference-style CUDA
approach), modulate the ACTIVATIONS, run ONE shared-weight conv on the
MXU, and demodulate the outputs:

    conv(x * s_i, W)[n, o] * d[n, o]
      == conv(x, W * s_i * d_o)[n]          (linearity)
    d[n, o] = rsqrt(sum_{k,i} (W[k,i,o] * s[n,i])^2 + eps)

The demod factor needs only sum_k W^2 (Ci, Co) — a tiny GEMM against the
squared styles. Exact to the per-sample-weight form (oracle-tested).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax import lax

from ganlab_tpu.ops.equalized import he_constant
from ganlab_tpu.ops.upfirdn import CONV_DIMS


def modulated_conv2d(
    x: jax.Array,
    w: jax.Array,
    styles: jax.Array,
    *,
    demodulate: bool = True,
    gain: float = math.sqrt(2.0),
    lr_mult: float = 1.0,
    eps: float = 1e-8,
) -> jax.Array:
    """Equalized-LR style-modulated conv. x: (N,H,W,Ci); w: (kh,kw,Ci,Co)
    shared weights; styles: (N, Ci) per-sample per-input-channel scales.

    The He constant (logical fan-in, as everywhere in this codebase)
    scales the weight BEFORE modulation/demodulation, matching the
    official implementation's runtime-scaling order.
    """
    kh, kw, ci, co = w.shape
    scale = he_constant(kh * kw * ci, gain) * lr_mult
    ws = (w * jnp.asarray(scale, w.dtype)).astype(x.dtype)
    s = styles.astype(x.dtype)
    y = lax.conv_general_dilated(
        x * s[:, None, None, :], ws, (1, 1), "SAME",
        dimension_numbers=CONV_DIMS)
    if demodulate:
        ww = jnp.sum(jnp.square(ws.astype(jnp.float32)), axis=(0, 1))
        d = lax.rsqrt(
            jnp.square(s.astype(jnp.float32)) @ ww + eps)
        y = y * d.astype(y.dtype)[:, None, None, :]
    return y
