"""FIR blur and fused resampling ops (upfirdn-style), NHWC.

ProGAN/StyleGAN use nearest-neighbour 2x upsampling and 2x average-pool
downsampling; StyleGAN additionally low-pass filters with a separable
binomial [1,2,1] kernel after each upsample (G) and before each downsample
(D) (Karras et al. 2018 app. C). The reference composes these from
``F.interpolate`` / ``avg_pool2d`` and a depthwise blur conv
(SURVEY.md 2.1).

TPU-native design: the fused paths express upsample+blur as ONE depthwise
transposed convolution and blur+downsample as ONE strided depthwise
convolution, so each is a single HBM pass instead of two. Depthwise convs of
tiny kernels are VPU work; XLA fuses the surrounding elementwise ops into
them.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

CONV_DIMS = ("NHWC", "HWIO", "NHWC")


def binomial_kernel(taps=(1.0, 2.0, 1.0)) -> np.ndarray:
    """Normalized separable 2D FIR kernel from 1D taps, shape (k, k)."""
    t = np.asarray(taps, dtype=np.float32)
    k = np.outer(t, t)
    return k / k.sum()


def _depthwise(kernel_2d: np.ndarray, channels: int, dtype) -> jax.Array:
    """(k, k) -> HWIO depthwise filter (k, k, 1, channels) for group conv."""
    k = jnp.asarray(kernel_2d, dtype=dtype)
    return jnp.tile(k[:, :, None, None], (1, 1, 1, channels))


def blur2d(x: jax.Array, taps=(1.0, 2.0, 1.0)) -> jax.Array:
    """Depthwise FIR blur, SAME padding. x: (N, H, W, C)."""
    c = x.shape[-1]
    filt = _depthwise(binomial_kernel(taps), c, x.dtype)
    return lax.conv_general_dilated(
        x, filt, window_strides=(1, 1), padding="SAME",
        dimension_numbers=CONV_DIMS, feature_group_count=c,
    )


def upsample_nearest_2x(x: jax.Array) -> jax.Array:
    """Nearest-neighbour 2x upsampling (ProGAN G path)."""
    n, h, w, c = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (n, h, 2, w, 2, c))
    return x.reshape(n, h * 2, w * 2, c)


def downsample_avg_2x(x: jax.Array) -> jax.Array:
    """2x2 average-pool downsampling (ProGAN D path)."""
    return lax.reduce_window(
        x, 0.0, lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    ) * jnp.asarray(0.25, x.dtype)


def _default_taps(taps) -> bool:
    return tuple(float(t) for t in taps) == (1.0, 2.0, 1.0)


def upsample_blur_2x_poly(x: jax.Array) -> jax.Array:
    """Polyphase fused nearest-2x-upsample + [1,2,1] blur, pure elementwise.

    Per axis (derivation in ops/pallas/resample.py):
        out[2i]   = 0.25 x[i-1] + 0.75 x[i]
        out[2i+1] = 0.75 x[i]   + 0.25 x[i+1]
    Two shifted lerps per axis + an interleave — XLA fuses the whole thing
    into one VPU pass, with no depthwise-conv machinery at all.
    """
    n, h, w, c = x.shape

    def up_axis(v, axis):
        size = v.shape[axis]
        pad = [(0, 0)] * v.ndim
        pad[axis] = (1, 1)
        vp = jnp.pad(v, pad)
        prev = lax.slice_in_dim(vp, 0, size, axis=axis)
        cur = lax.slice_in_dim(vp, 1, size + 1, axis=axis)
        nxt = lax.slice_in_dim(vp, 2, size + 2, axis=axis)
        even = 0.25 * prev + 0.75 * cur
        odd = 0.75 * cur + 0.25 * nxt
        inter = jnp.stack([even, odd], axis=axis + 1)
        new_shape = list(v.shape)
        new_shape[axis] = 2 * size
        return inter.reshape(new_shape)

    dt = x.dtype
    y = up_axis(x.astype(jnp.float32), 1)
    y = up_axis(y, 2)
    return y.astype(dt)


def blur_downsample_2x_poly(x: jax.Array) -> jax.Array:
    """Polyphase fused [1,2,1] blur + 2x avg-pool, pure elementwise.

    Per axis: out[i] = 0.125 x[2i-1] + 0.375 x[2i] + 0.375 x[2i+1]
                      + 0.125 x[2i+2].
    """
    def down_axis(v, axis):
        size = v.shape[axis] // 2
        pad = [(0, 0)] * v.ndim
        pad[axis] = (1, 1)
        vp = jnp.pad(v, pad)

        def ph(start):
            sl = lax.slice_in_dim(vp, start, start + 2 * size, axis=axis)
            shape = list(sl.shape)
            shape[axis] = size
            shape.insert(axis + 1, 2)
            return sl.reshape(shape)

        p0 = ph(0)   # pairs (x[2i-1], x[2i])
        p1 = ph(2)   # pairs (x[2i+1], x[2i+2])
        a = lax.index_in_dim(p0, 0, axis + 1, keepdims=False)
        b = lax.index_in_dim(p0, 1, axis + 1, keepdims=False)
        cc = lax.index_in_dim(p1, 0, axis + 1, keepdims=False)
        d = lax.index_in_dim(p1, 1, axis + 1, keepdims=False)
        return 0.125 * a + 0.375 * b + 0.375 * cc + 0.125 * d

    dt = x.dtype
    y = down_axis(x.astype(jnp.float32), 1)
    y = down_axis(y, 2)
    return y.astype(dt)


def upsample_blur_2x(x: jax.Array, taps=(1.0, 2.0, 1.0)) -> jax.Array:
    """Fused nearest-2x-upsample + FIR blur in one transposed depthwise conv.

    Equivalent to ``blur2d(upsample_nearest_2x(x))`` (parity-tested): nearest
    upsampling is zero-insertion convolved with the box [1,1]; composing box
    and blur taps gives one kernel applied by a stride-2 transposed conv.

    The Pallas polyphase kernels in ``ops/pallas/resample.py`` are kept as
    interpreter-validated reference implementations ONLY: their horizontal
    phase slices the tiled sublane dim at unaligned offsets (Mosaic rejects
    it on real TPUs), and this depthwise-conv form measured fastest on the
    v5e anyway (BASELINE.md) — so there is deliberately NO TPU dispatch to
    them ("only keep wins", SURVEY.md step 8).
    """
    if _default_taps(taps):
        from ganlab_tpu.ops import pallas as plops

        if plops.use_pallas() and plops.interpret_mode():
            return plops.upsample_blur_2x_pallas(x)
    t = np.asarray(taps, dtype=np.float32)
    # nearest-up = zero-stuff * box([1,1]);  then blur(t)  =>  t (*) [1,1]
    t2 = np.convolve(t, [1.0, 1.0])
    k2 = np.outer(t2, t2)
    k2 = k2 / (t.sum() ** 2)  # blur kernel is normalized; box is not
    c = x.shape[-1]
    filt = _depthwise(k2, c, x.dtype)
    kh = k2.shape[0]
    # Zero-stuffed (lhs-dilated) conv with SAME-style padding chosen so the
    # output is exactly (2H, 2W) and aligns with blur(nearest_up(x)).
    pad_lo = (kh - 1) // 2
    pad_hi = kh - 1 - pad_lo
    return lax.conv_general_dilated(
        x, filt,
        window_strides=(1, 1),
        padding=[(pad_lo + 1, pad_hi), (pad_lo + 1, pad_hi)],
        lhs_dilation=(2, 2),
        dimension_numbers=CONV_DIMS,
        feature_group_count=c,
    )


def blur_downsample_2x(x: jax.Array, taps=(1.0, 2.0, 1.0)) -> jax.Array:
    """Fused FIR blur + 2x average-pool in one strided depthwise conv.

    Equivalent to ``downsample_avg_2x(blur2d(x))`` (parity-tested): the
    average pool is a stride-2 conv with box([1,1])/2 per axis; composing
    gives one stride-2 kernel. No TPU dispatch to the Pallas kernel — see
    ``upsample_blur_2x``.
    """
    if _default_taps(taps):
        from ganlab_tpu.ops import pallas as plops

        if plops.use_pallas() and plops.interpret_mode():
            return plops.blur_downsample_2x_pallas(x)
    t = np.asarray(taps, dtype=np.float32)
    t2 = np.convolve(t, [0.5, 0.5])
    k2 = np.outer(t2, t2)
    k2 = k2 / (t.sum() ** 2)
    c = x.shape[-1]
    filt = _depthwise(k2, c, x.dtype)
    kh = k2.shape[0]
    pad_lo = (kh - 2) // 2
    pad_hi = kh - 2 - pad_lo
    return lax.conv_general_dilated(
        x, filt,
        window_strides=(2, 2),
        padding=[(pad_lo, pad_hi), (pad_lo, pad_hi)],
        dimension_numbers=CONV_DIMS,
        feature_group_count=c,
    )
