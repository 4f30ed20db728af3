"""Width-folded (space-to-depth along W) evaluation of low-channel layers.

TPU tensors are tiled (8, 128): a (N, H, W, 64) activation wastes HALF of
every 128-lane memory tile and fills half the MXU lanes. The high-res
low-channel layers of ProGAN/StyleGAN (C = 64 at 256^2 in the judged
config) therefore run far below the chip's ceiling — profiling shows the
256^2/64ch ops are ~45% of the whole train step (BASELINE.md round-2
profile). The fix: represent those layers' activations WIDTH-FOLDED,

    (N, H, W, C)  ->  (N, H, W/2, 2C)      [phase-major: ch = p*C + c]

so lanes and tiles are full, and evaluate every op of the block in folded
space with EXACT logical-zero-pad semantics:

* conv3x3: one conv with a (3, 3, 2C, 2C') kernel built from the logical
  (3, 3, C, C') weights; out-of-support slots are structurally zero, so
  plain SAME cell padding reproduces logical zero padding exactly. 2x the
  MACs of the logical conv, but measured 1.4-1.9x FASTER at C=64 on the
  v5e (scripts/bench_fold.py) because lanes/tiles go from half to full.
* conv1x1 (toRGB/fromRGB): block-diagonal (1, 1, 2C, 2C') kernel.
* nearest-up(+FIR blur) producing folded output, and (blur+)avg-down
  consuming folded input: the W-axis phases become channel groups
  (polyphase identities); the H-axis stays an ordinary depthwise resample.
* elementwise epilogues (noise/bias/LeakyReLU) and the normalizations
  (pixelnorm, AdaIN instance stats) via (…, 2, C) reshape views — exact
  because the stats' reduction sets are unchanged.

Everything here is a pure evaluation-order change of the same math;
``tests/test_folded.py`` asserts fwd+grad equality with the logical ops.
Reference semantics (gan_lab composes these from stock torch ops,
SURVEY.md 2.1-2.2) are untouched.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ganlab_tpu.ops.upfirdn import CONV_DIMS

FOLD = 2  # width fold factor (phase count)


def fold_w(x: jax.Array) -> jax.Array:
    """(N, H, W, C) -> (N, H, W/2, 2C), phase-major (ch = p*C + c)."""
    n, h, w, c = x.shape
    assert w % FOLD == 0, (w, FOLD)
    return x.reshape(n, h, w // FOLD, FOLD * c)


def unfold_w(x: jax.Array) -> jax.Array:
    """Inverse of ``fold_w``."""
    n, h, wf, fc = x.shape
    assert fc % FOLD == 0, fc
    return x.reshape(n, h, wf * FOLD, fc // FOLD)


def fold_conv_kernel(w: jax.Array) -> jax.Array:
    """Logical (kh, 3, Ci, Co) SAME-conv kernel -> folded (kh, 3, 2Ci, 2Co).

    Output phase q at cell b reads logical px 2b + q + dw - 1 for W taps
    dw in 0..2; that px lives at cell b + floor(d/2), phase d mod 2 with
    d = q + dw - 1. Slots no tap maps to stay zero, which is exactly what
    makes SAME cell-padding equal logical zero-padding.
    """
    kh, kw, ci, co = w.shape
    assert kw == 3, "folded conv implemented for 3-tap W kernels"
    blocks = {}  # (cell_ofs, p, q) -> (kh, Ci, Co) slab
    for q in range(FOLD):
        for dw in range(3):
            d = q + dw - 1
            cell, p = d // FOLD, d % FOLD
            blocks[(cell, p, q)] = w[:, dw]
    zero = jnp.zeros((kh, ci, co), w.dtype)
    cells = []
    for cell in (-1, 0, 1):
        # assemble (kh, 2Ci, 2Co): rows = input phase p, cols = out phase q
        cols = []
        for q in range(FOLD):
            rows = [blocks.get((cell, p, q), zero) for p in range(FOLD)]
            cols.append(jnp.concatenate(rows, axis=1))      # (kh, 2Ci, Co)
        cells.append(jnp.concatenate(cols, axis=2))         # (kh, 2Ci, 2Co)
    return jnp.stack(cells, axis=1)                         # (kh, 3, 2Ci, 2Co)


def fold_conv1x1_kernel(w: jax.Array) -> jax.Array:
    """Logical (1, 1, Ci, Co) kernel -> block-diagonal (1, 1, 2Ci, 2Co)."""
    kh, kw, ci, co = w.shape
    assert kh == kw == 1, (kh, kw)
    zero = jnp.zeros((1, 1, ci, co), w.dtype)
    cols = []
    for q in range(FOLD):
        rows = [w if p == q else zero for p in range(FOLD)]
        cols.append(jnp.concatenate(rows, axis=2))
    return jnp.concatenate(cols, axis=3)


def conv2d_folded(x_f: jax.Array, w: jax.Array) -> jax.Array:
    """SAME conv of the LOGICAL kernel ``w`` on a width-folded input.

    ``w`` is the ordinary (kh, kw, Ci, Co) weight (kw in {1, 3}); the
    folded kernel is built at call time (tiny vs the conv itself).
    """
    if w.shape[1] == 1:
        wf = fold_conv1x1_kernel(w)
        pad = [((w.shape[0] - 1) // 2,) * 2, (0, 0)]
    else:
        wf = fold_conv_kernel(w)
        pad = [(1, 1), (1, 1)]
    return lax.conv_general_dilated(
        x_f, wf, window_strides=(1, 1), padding=pad,
        dimension_numbers=CONV_DIMS)


def _phase_view(x_f: jax.Array) -> jax.Array:
    """(N, H, Wf, 2C) -> (N, H, Wf, 2, C) reshape view."""
    n, h, wf, fc = x_f.shape
    return x_f.reshape(n, h, wf, FOLD, fc // FOLD)


# LeakyReLU is shape-agnostic elementwise — the logical op works on
# folded tensors as-is; aliased here so folded call sites read uniformly.
from ganlab_tpu.ops.equalized import leaky_relu as leaky_relu_folded  # noqa: E402,F401


def bias_folded(x_f: jax.Array, b: jax.Array) -> jax.Array:
    """Add a per-logical-channel bias (C,) to a folded tensor."""
    return x_f + jnp.tile(b.astype(x_f.dtype), FOLD)


def pixel_norm_folded(x_f: jax.Array, eps: float = 1e-8) -> jax.Array:
    """PixelNorm over LOGICAL channels: per phase, over its C group.

    Same compute dtype as ops.normalization.pixel_norm (stats in x.dtype).
    """
    v = _phase_view(x_f)
    ms = jnp.mean(jnp.square(v), axis=-1, keepdims=True)
    y = v * lax.rsqrt(ms + jnp.asarray(eps, x_f.dtype))
    return y.reshape(x_f.shape)


def adain_folded(x_f: jax.Array, ys: jax.Array, yb: jax.Array,
                 eps: float = 1e-8) -> jax.Array:
    """AdaIN with instance stats over logical (H, W) per channel.

    ys/yb: (N, C) style scale/bias. The reduction set {H} x {Wf x phases}
    equals the logical {H, W}, so stats are exact; compute dtype matches
    ops.normalization.adain.
    """
    v = _phase_view(x_f)                                # (N,H,Wf,2,C)
    mean = jnp.mean(v, axis=(1, 2, 3), keepdims=True)
    var = jnp.mean(jnp.square(v - mean), axis=(1, 2, 3), keepdims=True)
    norm = (v - mean) * lax.rsqrt(var + jnp.asarray(eps, x_f.dtype))
    out = norm * ys.astype(x_f.dtype)[:, None, None, None, :] \
        + yb.astype(x_f.dtype)[:, None, None, None, :]
    return out.reshape(x_f.shape)


def noise_folded(x_f: jax.Array, scale: jax.Array, rng) -> jax.Array:
    """StyleGAN noise injection on a folded tensor.

    The single-channel logical noise image is drawn in LOGICAL shape and
    folded, so fold=True/False consume the identical random field for a
    given key (sample parity at matched seeds).
    """
    n, h, wf, fc = x_f.shape
    noise = jax.random.normal(rng, (n, h, wf * FOLD, 1), x_f.dtype)
    nf = noise.reshape(n, h, wf, FOLD, 1)
    v = _phase_view(x_f)
    out = v + scale.astype(x_f.dtype) * nf
    return out.reshape(x_f.shape)


def upsample_blur_2x_folded(x: jax.Array, blur: bool = True) -> jax.Array:
    """Nearest-2x upsample (+[1,2,1] FIR) with FOLDED output.

    Input (N, H, W, C) unfolded; output (N, 2H, W, 2C) = fold_w of the
    logical (N, 2H, 2W, C) result. W-axis phases are computed as channel
    groups via the polyphase identities (ops/upfirdn.py::
    upsample_blur_2x_poly); the H axis is an ordinary depthwise resample.
    """
    if not blur:
        n, h, w, c = x.shape
        up = x[:, :, None, :, None, :]
        up = jnp.broadcast_to(up, (n, h, 2, w, 1, c)).reshape(n, 2 * h, w, c)
        return jnp.concatenate([up, up], axis=-1)
    f32 = x.astype(jnp.float32)

    def up_axis_h(v):
        n, h, w, c = v.shape
        vp = jnp.pad(v, ((0, 0), (1, 1), (0, 0), (0, 0)))
        prev, cur, nxt = vp[:, :-2], vp[:, 1:-1], vp[:, 2:]
        even = 0.25 * prev + 0.75 * cur
        odd = 0.75 * cur + 0.25 * nxt
        return jnp.stack([even, odd], axis=2).reshape(n, 2 * h, w, c)

    y = up_axis_h(f32)
    # W axis -> phase channel groups (phase-major).
    vp = jnp.pad(y, ((0, 0), (0, 0), (1, 1), (0, 0)))
    prev, cur, nxt = vp[:, :, :-2], vp[:, :, 1:-1], vp[:, :, 2:]
    even = 0.25 * prev + 0.75 * cur
    odd = 0.75 * cur + 0.25 * nxt
    return jnp.concatenate([even, odd], axis=-1).astype(x.dtype)


def blur_downsample_2x_folded(x_f: jax.Array, blur: bool = True) -> jax.Array:
    """([1,2,1] FIR +) 2x avg-pool consuming a FOLDED input.

    Input (N, H, Wf, 2C) folded; output (N, H/2, Wf, C) unfolded (the
    downsample undoes the fold: logical W = 2*Wf halves back to Wf).
    """
    n, h, wf, fc = x_f.shape
    c = fc // FOLD
    v = x_f.astype(jnp.float32)
    p0, p1 = v[..., :c], v[..., c:]          # logical px 2b, 2b+1
    if not blur:
        y = 0.5 * (p0 + p1)                  # W-axis avg within each cell
        y = y.reshape(n, h // 2, 2, wf, c)
        return (0.5 * (y[:, :, 0] + y[:, :, 1])).astype(x_f.dtype)
    # W axis: out[b] = x[2b-1]/8 + 3 x[2b]/8 + 3 x[2b+1]/8 + x[2b+2]/8
    #               = p1[b-1]/8 + 3 p0[b]/8 + 3 p1[b]/8 + p0[b+1]/8.
    p1m = jnp.pad(p1, ((0, 0), (0, 0), (1, 0), (0, 0)))[:, :, :-1]
    p0p = jnp.pad(p0, ((0, 0), (0, 0), (0, 1), (0, 0)))[:, :, 1:]
    y = 0.125 * p1m + 0.375 * p0 + 0.375 * p1 + 0.125 * p0p
    # H axis: out[i] = y[2i-1]/8 + 3 y[2i]/8 + 3 y[2i+1]/8 + y[2i+2]/8.
    yp = jnp.pad(y, ((0, 0), (1, 1), (0, 0), (0, 0)))
    a = yp[:, 0:-3:2]
    b = yp[:, 1:-2:2]
    cc = yp[:, 2:-1:2]
    d = yp[:, 3::2]
    out = 0.125 * a + 0.375 * b + 0.375 * cc + 0.125 * d
    return out.astype(x_f.dtype)
