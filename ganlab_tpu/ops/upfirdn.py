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


def _up2_fir(taps) -> tuple[np.ndarray, tuple[int, int]]:
    """(K, pad) of the 2x zero-stuff resampling FIR as a correlation.

    ``taps=None`` is nearest-neighbour upsampling (zero-stuff * box [1,1]);
    otherwise nearest-up + FIR blur (zero-stuff * (box conv taps)). Both
    kernels are flip-symmetric, so correlation == convolution and kernel
    composition below needs no flips.
    """
    if taps is None:
        k1 = np.asarray([1.0, 1.0], dtype=np.float32)
        pad = (1, 1)
    else:
        t = np.asarray(taps, dtype=np.float32)
        k1 = np.convolve(t, [1.0, 1.0]) / t.sum()
        lo = (len(k1) - 1) // 2
        pad = (lo + 1, len(k1) - 1 - lo)
    return np.outer(k1, k1).astype(np.float32), pad


def compose_up2_kernel(w: jax.Array, taps=(1.0, 2.0, 1.0)) -> jax.Array:
    """Compose a (kh, kw, I, O) conv kernel with the 2x upsampling FIR.

    Returns the (kh+kK-1, kw+kK-1, I, O) kernel C with
    ``conv(C, zero_stuff_2x(x)) == conv(w, upsample[_blur]_2x(x))``:
    C[s, t] = sum_{r, q} w[r, q] * K[s - r, t - q] (true 2D convolution of
    the kernels; K symmetric, see ``_up2_fir``). Built from kh*kw static
    shifted adds. (A conv-over-reshaped-weights form was tried and HUNG the
    TPU compiler — batch=I*O tiny-image convs; keep the shifted adds.)
    """
    K, _ = _up2_fir(taps)
    kk = K.shape[0]
    kh, kw, ci, co = w.shape
    c = jnp.zeros((kh + kk - 1, kw + kk - 1, ci, co), w.dtype)
    Kd = jnp.asarray(K, w.dtype)
    for r in range(kh):
        for q in range(kw):
            c = c.at[r:r + kk, q:q + kk].add(
                w[r, q][None, None] * Kd[:, :, None, None])
    return c


def _up1d_ext(z: jax.Array, k1: np.ndarray) -> jax.Array:
    """1D zero-ext blur-upsample of (N, L, C) -> (N, 2L+2, C), WITH tails.

    Positions -1 and 2L of the zero-EXTENDED (not zero-padded) upsampled
    signal carry the FIR tails k1[-1]*z[0] and k1[0]*z[-1]; the interior
    matches the ordinary padded upsample. Only valid for 4-tap k1.
    """
    assert len(k1) == 4
    k1 = [float(t) for t in k1]  # weak Python floats: keep z's dtype
    n, size, c = z.shape
    pad = jnp.zeros((n, 1, c), z.dtype)
    zp = jnp.concatenate([pad, z, pad], axis=1)
    prev = zp[:, :-2]   # z[i-1]
    cur = zp[:, 1:-1]   # z[i]
    nxt = zp[:, 2:]     # z[i+1]
    even = k1[0] * prev + k1[2] * cur     # out[2i] (k1 taps at even offsets)
    odd = k1[1] * cur + k1[3] * nxt       # out[2i+1]
    inter = jnp.stack([even, odd], axis=2).reshape(n, 2 * size, c)
    head = k1[3] * z[:, :1]               # position -1 tail
    tail = k1[0] * z[:, -1:]              # position 2L tail
    return jnp.concatenate([head, inter, tail], axis=1)


def _shifted_matmul_1d(v: jax.Array, wk: jax.Array, pad: tuple[int, int]):
    """Correlate (N, L, I) with (K, I, O) taps -> (N, L+pad0+pad1-K+1, O)."""
    k = wk.shape[0]
    if pad != (0, 0):
        z = jnp.zeros((v.shape[0], 1, v.shape[2]), v.dtype)
        parts = [z] * pad[0] + [v] + [z] * pad[1]
        v = jnp.concatenate(parts, axis=1)
    out_len = v.shape[1] - k + 1
    y = None
    for d in range(k):
        t = jnp.einsum("nli,io->nlo", v[:, d:d + out_len], wk[d])
        y = t if y is None else y + t
    return y


def _up2_blur_ring_correction(x: jax.Array, w: jax.Array, y: jax.Array,
                              k1: np.ndarray) -> jax.Array:
    """Subtract the FIR-tail contributions so the fused conv equals the
    two-op form's zero-padded-intermediate semantics exactly.

    The composed conv implicitly reads the zero-EXTENDED upsampled signal,
    whose only nonzero values outside the [0,2H)x[0,2W) window are a 1-px
    frame of blur tails (``_up1d_ext``); the 3x3 conv reaches 1 px, so only
    the output ring is affected. Each frame side is removed with one thin
    1-D correlation against the matching row/column of ``w``.
    """
    n, h, wd, _ = x.shape
    # Frame values. Top/bottom rows include the corners (full ext along W);
    # left/right columns exclude them (interior H positions only).
    k3, k0 = float(k1[3]), float(k1[0])
    top = k3 * _up1d_ext(x[:, 0], k1)            # (N, 2W+2, I) at m=-1
    bot = k0 * _up1d_ext(x[:, -1], k1)           # (N, 2W+2, I) at m=2H
    lcol = k3 * _up1d_ext(x[:, :, 0], k1)[:, 1:-1]   # (N, 2H, I) n=-1
    rcol = k0 * _up1d_ext(x[:, :, -1], k1)[:, 1:-1]  # (N, 2H, I) n=2W
    # Output row p reads u rows p-1..p+1; row -1 affects only p=0 via
    # w[0, :], row 2H only p=2H-1 via w[2, :]. Frame vectors span
    # -1..2W, so a VALID correlation yields outputs 0..2W-1.
    y = y.at[:, 0].add(-_shifted_matmul_1d(top, w[0], (0, 0)))
    y = y.at[:, -1].add(-_shifted_matmul_1d(bot, w[-1], (0, 0)))
    # Column -1 affects output col 0 via w[:, 0]; frame covers rows
    # 0..2H-1 and is zero beyond (corners belong to top/bot), so SAME pad.
    y = y.at[:, :, 0].add(-_shifted_matmul_1d(lcol, w[:, 0], (1, 1)))
    y = y.at[:, :, -1].add(-_shifted_matmul_1d(rcol, w[:, -1], (1, 1)))
    return y


def up2_conv2d(x: jax.Array, w: jax.Array, taps=(1.0, 2.0, 1.0),
               polyphase: bool = False) -> jax.Array:
    """conv3x3(upsample[_blur]_2x(x)) fused into ONE dense conv.

    The resampling FIR and the conv kernel compose exactly
    (``compose_up2_kernel``), so the 4x-sized upsampled intermediate is
    never materialized — the single biggest activation in every G block
    (SURVEY.md 2.1 fade-in row). Two equivalent evaluation forms:

    * default: one lhs-dilated (transposed-style) conv — the same op class
      XLA already emits for every strided-conv input gradient;
    * ``polyphase=True``: 4 ordinary 3x3 convs at input resolution (one per
      output-pixel parity class) + an interleave, guaranteed zero-waste on
      the MXU.

    ``taps=None`` fuses plain nearest-up (ProGAN G); otherwise nearest-up +
    FIR blur (StyleGAN G). ``w`` is the ordinary (kh, kw, I, O) kernel —
    callers keep storing/learning 3x3 weights (checkpoint-compatible).
    """
    _, kpad = _up2_fir(taps)
    c = compose_up2_kernel(w, taps).astype(x.dtype)
    kh = w.shape[0]
    cpad_lo = (kh - 1) // 2
    cpad_hi = kh - 1 - cpad_lo
    pad_lo = kpad[0] + cpad_lo
    pad_hi = kpad[1] + cpad_hi

    def _finish(y):
        if taps is None:
            return y  # box kernel has no tails outside the window: exact
        t = np.asarray(taps, dtype=np.float32)
        k1 = (np.convolve(t, [1.0, 1.0]) / t.sum()).astype(np.float32)
        return _up2_blur_ring_correction(x, w.astype(x.dtype), y, k1)

    if not polyphase:
        return _finish(lax.conv_general_dilated(
            x, c,
            window_strides=(1, 1),
            padding=[(pad_lo, pad_hi), (pad_lo, pad_hi)],
            lhs_dilation=(2, 2),
            dimension_numbers=CONV_DIMS,
        ))
    # Polyphase: y[2a+da, 2b+db] only reads x taps where the zero-stuffed
    # index is even; those taps form the kernel slice c[off::2, off::2]
    # with off = (pad_lo + da + 1) % 2 ... derived for pad_lo odd/even.
    n, h, wdt, _ = x.shape
    co = c.shape[-1]
    phases = []
    for da in (0, 1):
        row = []
        for db in (0, 1):
            # s ranges over taps with (da + s - pad_lo) even.
            s0 = (pad_lo + da) % 2
            t0 = (pad_lo + db) % 2
            ck = c[s0::2, t0::2]
            # x index for tap s: a + (da + s - pad_lo) // 2; lowest tap
            # (s = s0) maps to offset (da + s0 - pad_lo) // 2.
            olo = -((da + s0 - pad_lo) // 2)
            khp, kwp = ck.shape[0], ck.shape[1]
            plo_h = olo
            phi_h = khp - 1 - olo
            olo_t = -((db + t0 - pad_lo) // 2)
            row.append(lax.conv_general_dilated(
                x, ck,
                window_strides=(1, 1),
                padding=[(plo_h, phi_h), (olo_t, kwp - 1 - olo_t)],
                dimension_numbers=CONV_DIMS,
            ))
        phases.append(row)
    top = jnp.stack([phases[0][0], phases[0][1]], axis=3)    # (N,H,W,2,C)
    bot = jnp.stack([phases[1][0], phases[1][1]], axis=3)
    y = jnp.stack([top, bot], axis=2)                        # (N,H,2,W,2,C)
    return _finish(y.reshape(n, 2 * h, 2 * wdt, co))


@jax.custom_vjp
def up2_conv2d_hybrid(x: jax.Array, w: jax.Array) -> jax.Array:
    """``up2_conv2d`` forward (no 4x intermediate) with the TWO-OP backward.

    The backward of the composed conv is mathematically the same linear
    map as the two-op backward, but XLA generates much slower code for the
    composed form's weight-gradient; this variant pairs the fused forward
    with the two-op gradient formulas (rematerializing the upsampled
    intermediate only in the backward). Default blur taps only.
    """
    return up2_conv2d(x, w)


def _up2_hybrid_fwd(x, w):
    return up2_conv2d(x, w), (x, w)


def _up2_hybrid_bwd(res, g):
    x, w = res

    def two_op(x, w):
        return lax.conv_general_dilated(
            upsample_blur_2x(x), w, (1, 1), "SAME",
            dimension_numbers=CONV_DIMS)

    _, vjp = jax.vjp(two_op, x, w)
    return vjp(g)


up2_conv2d_hybrid.defvjp(_up2_hybrid_fwd, _up2_hybrid_bwd)


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
