"""Differentiable image augmentation for ADA (StyleGAN2-ADA, Karras et
al. 2020) — TPU-native rebuild, an extension beyond the reference (the
reference trains without augmentation; SURVEY.md lists no equivalent).

Why it exists here: measured in r3, the 256-image ``synthetic`` pool
shows the paper's exact small-dataset failure — FID falls to an early
minimum then RISES as the discriminator memorizes the pool. ADA fixes
this by augmenting every image the discriminator sees (reals and fakes,
in both the D and G losses) with a strength ``p`` that adapts to a
measured overfitting heuristic.

TPU-first design — everything is static-shaped, in-jit, and collapses
to two cheap device ops regardless of how many transforms fire:

* **blit transforms** (x-flip, 90° rotations, integer translation) are
  composed on the *sampling coordinates* (integer index arithmetic, no
  image touched) and applied as ONE reflect-padded gather;
* **color transforms** (brightness, contrast, luma flip, hue rotation,
  saturation) are composed into ONE per-sample 3x3 matrix + bias
  (official ADA does the same) and applied as a single einsum the MXU
  eats for free.

Per-sample Bernoulli(p) gates every transform, so ``p`` is a TRACED
scalar: adapting it never recompiles, and ``p = 0`` is the exact
identity. Gradients flow through both the gather and the einsum, which
is what lets the G loss backpropagate through augmented fakes.

* **geometric transforms** (isotropic/anisotropic scaling, arbitrary
  rotation, fractional translation) compose into ONE per-sample inverse
  affine, applied as a conditioning quarter-turn + TWO axis-separated
  shear passes (Catmull–Smith), each a 2-tap linear resample executed
  as a one-hot einsum on the MXU (`_apply_geom` — no 2-D gather, no
  scatter-add in the VJP). Linear resampling at integer coordinates is
  exact, so samples whose geometric gates don't fire (and all blit-only
  samples) are untouched bit-for-bit by the upgrade.

Deviation from the official pipeline: the official implementation
resamples through orthonormal wavelet filtering to keep the augmented
distribution alias-free; here geometric sampling is separable two-pass
linear interpolation. The drawn scale factors are mild (2^N(0,0.2) ~
[0.7, 1.4] at 2 sigma), where the interpolation error is small; the
trade is documented rather than hidden.
* **image-space filtering** ("f"): amplify/attenuate one of four
  octave frequency bands. The official 4-band sym2 wavelet filter bank
  is composed with per-sample band gains into ONE per-sample separable
  FIR, applied as two grouped depthwise convs (batch folded into the
  channel axis, so per-sample kernels cost one conv per axis, no
  gather). The bank rows sum to a unit impulse, so all-gates-off
  samples are returned untouched (selected bit-exactly).
* **additive noise** ("n"): per-sample gated RGB noise, std drawn
  |N(0, 0.1)| — one fused add.
* **cutout** ("u" — "c" is taken by color): zero a half-resolution
  square at a uniform random center — a rank-1 mask multiply, no
  gather.

The ``categories`` string accepts any non-empty subset of "bcgfnu"
(default "bc" — per the paper's ablation, blit+color carries most of
the benefit). Pipeline order matches the official ADA pipeline:
blit -> geom -> color -> filter -> noise -> cutout.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# ITU-style luma axis used by official ADA ([1,1,1]/sqrt(3)): luma flip,
# hue rotation, and saturation all act around this axis in RGB space.
_LUMA = (1.0 / math.sqrt(3.0),) * 3

BRIGHTNESS_STD = 0.2
CONTRAST_STD = 0.5 * math.log(2.0)
SATURATION_STD = 1.0 * math.log(2.0)
MAX_TRANSLATE = 0.125          # fraction of the resolution, official value
# Row-block the shear passes when the one-hot tensor would exceed this
# (tests patch it to force the blocked path at tiny shapes).
ONEHOT_BYTES_LIMIT = 512 * 1024 * 1024
SCALE_STD_LOG2 = 0.2           # iso scale ~ 2^N(0, std), official value
ANISO_STD_LOG2 = 0.2           # aniso ratio ~ 2^N(0, std), official value
FRAC_TRANSLATE_STD = 0.125     # fractional translate ~ N(0, std*res)
IMGFILTER_STD = 1.0            # band gain ~ 2^N(0, std), official value
NOISE_STD = 0.1                # noise sigma ~ |N(0, std)|, official value
CUTOUT_SIZE = 0.5              # cutout square side / resolution, official


def _build_filter_bank() -> np.ndarray:
    """The official ADA 4-band frequency filter bank (octave bands).

    sym2 analysis lowpass -> quadrature highpass; the zero-phase product
    filters ``lo2 = conv(lo, lo[::-1])/2`` and ``hi2`` satisfy
    ``lo2 + hi2 = delta`` (orthogonal wavelet power complementarity), so
    the three-level cascade below yields rows that sum EXACTLY to a unit
    impulse: unit band gains mean identity filtering. Row i isolates the
    octave around Nyquist/2^(3-i).
    """
    lo = np.array([-0.12940952255092145, 0.22414386804185735,
                   0.836516303737469, 0.48296291314469025])
    hi = lo * ((-1.0) ** np.arange(lo.size))
    lo2 = np.convolve(lo, lo[::-1]) / 2.0
    hi2 = np.convolve(hi, hi[::-1]) / 2.0
    fb = np.eye(4, 1)                       # (bands, taps), taps grows
    for i in range(1, 4):
        # upsample rows x2 (zero interleave), lowpass, add band i's
        # highpass at the center — the standard wavelet-packet cascade.
        fb = np.dstack([fb, np.zeros_like(fb)]).reshape(4, -1)[:, :-1]
        fb = np.stack([np.convolve(row, lo2) for row in fb])
        c = (fb.shape[1] - hi2.size) // 2
        fb[i, c:c + hi2.size] += hi2
    return fb


_HZ_FBANK = _build_filter_bank()           # (4, 43), rows sum to delta
FILTER_TAPS = _HZ_FBANK.shape[1]

# Expected per-band power of natural images (~1/f spectrum): the low band
# carries 10/13 of the energy. The official imgfilter normalizes each
# band-gain draw so the EXPECTED output power is preserved under THIS
# spectrum, not uniformly (ADVICE r3). Weights sum to 1, so the all-ones
# (no gate fired) gain vector is a fixed point — identity stays exact.
_FILTER_EXPECTED_POWER = np.array([10.0, 1.0, 1.0, 1.0]) / 13.0


def _normalize_filter_gain(t: jax.Array) -> jax.Array:
    """Normalize a (B, 4) band-gain vector to unit expected output power."""
    ep = jnp.asarray(_FILTER_EXPECTED_POWER, t.dtype)
    return t / jnp.sqrt(jnp.sum(ep * jnp.square(t), axis=1, keepdims=True))


class AugParams(NamedTuple):
    """Per-sample transform draws (all (B,) or (B, ...) arrays).

    Built by ``sample_params``; ``apply_augment`` is a pure function of
    these, so tests can force specific transforms deterministically.
    """
    flip: jax.Array            # bool: apply x-flip
    rot_k: jax.Array           # int32 0..3: number of 90° CCW turns
    trans: jax.Array           # int32 (B, 2): (ty, tx) pixel shifts
    color_mat: jax.Array       # f32 (B, 3, 3)
    color_bias: jax.Array      # f32 (B, 3)
    # Geometric category: per-sample INVERSE affine (B, 2, 3) mapping
    # centered output (y, x) to centered input coords; None = the exact
    # integer-gather path (no bilinear anywhere in the program).
    geom: jax.Array | None = None
    # Filter category: per-sample separable FIR (B, FILTER_TAPS) — the
    # band-gain-weighted sum of _HZ_FBANK rows — plus the per-sample
    # "any band gate fired" flag (non-fired samples bypass the convs
    # bit-exactly).
    filt: jax.Array | None = None
    filt_active: jax.Array | None = None
    # Noise category: pre-scaled additive field (B, res, res, C).
    noise: jax.Array | None = None
    # Cutout category: (B, 3) = (center_y, center_x, size), all in
    # units of the resolution; size 0 = no cut.
    cutout: jax.Array | None = None


def _rotation_about_luma(theta: jax.Array) -> jax.Array:
    """Rodrigues rotation matrices (B,3,3) about the luma axis."""
    v = jnp.asarray(_LUMA, jnp.float32)
    K = jnp.array([[0.0, -v[2], v[1]],
                   [v[2], 0.0, -v[0]],
                   [-v[1], v[0], 0.0]], jnp.float32)
    vv = jnp.outer(v, v)
    eye = jnp.eye(3, dtype=jnp.float32)
    c = jnp.cos(theta)[:, None, None]
    s = jnp.sin(theta)[:, None, None]
    return eye * c + K * s + vv * (1.0 - c)


def _geom_inverse(key: jax.Array, batch: int, res: int,
                  p: jax.Array) -> jax.Array:
    """Per-sample inverse affines (B, 2, 3) for the geometric category.

    Forward transform (about the image center, (y, x) basis):
    ``A = R(theta) @ diag(r, 1/r) * s`` plus a fractional pixel
    translation ``t`` — isotropic scale, rotation, anisotropic ratio and
    translation each gated by Bernoulli(p) with the official ADA draw
    distributions. Returned is the analytic inverse
    ``[A^-1 | -A^-1 t]`` so the sampler maps output to input coords.
    """
    k_si, k_siv, k_r, k_rv, k_a, k_av, k_t, k_tv = jax.random.split(key, 8)

    def gate(k):
        return jax.random.bernoulli(k, p, (batch,))

    s = jnp.where(gate(k_si),
                  jnp.exp2(jax.random.normal(k_siv, (batch,))
                           * SCALE_STD_LOG2), 1.0)
    theta = jnp.where(gate(k_r),
                      jax.random.uniform(k_rv, (batch,), minval=-jnp.pi,
                                         maxval=jnp.pi), 0.0)
    r = jnp.where(gate(k_a),
                  jnp.exp2(jax.random.normal(k_av, (batch,))
                           * ANISO_STD_LOG2), 1.0)
    t = jnp.where(gate(k_t)[:, None],
                  jax.random.normal(k_tv, (batch, 2))
                  * (FRAC_TRANSLATE_STD * res), 0.0)
    c, sn = jnp.cos(theta), jnp.sin(theta)
    # A^-1 = diag(1/r, r) @ R(-theta) / s
    row0 = jnp.stack([c / r, sn / r], axis=-1)
    row1 = jnp.stack([-sn * r, c * r], axis=-1)
    a_inv = jnp.stack([row0, row1], axis=1) / s[:, None, None]
    b = -jnp.einsum("bij,bj->bi", a_inv, t)
    return jnp.concatenate([a_inv, b[:, :, None]], axis=-1)


def _filter_params(key: jax.Array, batch: int,
                   p: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-sample composed FIR (B, taps) + any-gate-fired flag (B,).

    Official semantics: each band independently draws gain
    ``2^N(0, IMGFILTER_STD)`` gated by Bernoulli(p); each draw's gain
    vector is normalized so the EXPECTED output power is preserved under
    natural images' ~1/f spectrum — band powers weighted [10,1,1,1]/13
    (low band carries 10/13 of the energy), not uniformly (ADVICE r3).
    The composed gains weight the bank rows. All gates off gives exactly
    the unit-impulse row sum (identity filter: the expected-power weights
    sum to 1, so the all-ones gain vector normalizes to itself).
    """
    bank = jnp.asarray(_HZ_FBANK, jnp.float32)
    g = jnp.ones((batch, bank.shape[0]), jnp.float32)
    active = jnp.zeros((batch,), bool)
    keys = jax.random.split(key, 2 * bank.shape[0])
    for i in range(bank.shape[0]):
        fired = jax.random.bernoulli(keys[2 * i], p, (batch,))
        t_i = jnp.where(fired,
                        jnp.exp2(jax.random.normal(keys[2 * i + 1],
                                                   (batch,))
                                 * IMGFILTER_STD), 1.0)
        t = jnp.ones((batch, bank.shape[0])).at[:, i].set(t_i)
        t = _normalize_filter_gain(t)
        g = g * t
        active = active | fired
    return g @ bank, active


def sample_params(key: jax.Array, batch: int, res: int, p: jax.Array,
                  categories: str = "bc", channels: int = 3) -> AugParams:
    """Draw per-sample transforms, each gated by Bernoulli(p)."""
    p = jnp.asarray(p, jnp.float32)
    (k_f, k_r, k_rk, k_t, k_tv, k_b, k_bv, k_c, k_cv, k_l, k_h, k_hv,
     k_s, k_sv) = jax.random.split(key, 14)

    use_blit = "b" in categories
    use_color = "c" in categories

    def gate(k, shape=(batch,)):
        return jax.random.bernoulli(k, p, shape)

    zero_i = jnp.zeros((batch,), jnp.int32)
    if use_blit:
        flip = gate(k_f)
        rot_k = jnp.where(gate(k_r),
                          jax.random.randint(k_rk, (batch,), 0, 4), 0)
        max_t = max(int(round(res * MAX_TRANSLATE)), 1)
        trans = jnp.where(
            gate(k_t)[:, None],
            jax.random.randint(k_tv, (batch, 2), -max_t, max_t + 1), 0)
    else:
        flip, rot_k = jnp.zeros((batch,), bool), zero_i
        trans = jnp.zeros((batch, 2), jnp.int32)

    eye = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (batch, 3, 3))
    bias = jnp.zeros((batch, 3), jnp.float32)
    mat = eye
    if use_color:
        # Composed in the official order: brightness, contrast, luma
        # flip, hue, saturation. Each factor is I unless its gate fires.
        b = jnp.where(gate(k_b),
                      jax.random.normal(k_bv, (batch,)) * BRIGHTNESS_STD,
                      0.0)
        bias = bias + b[:, None]                       # acts on [-1,1] RGB
        c = jnp.where(gate(k_c),
                      jnp.exp(jax.random.normal(k_cv, (batch,))
                              * CONTRAST_STD), 1.0)
        mat = mat * c[:, None, None]
        bias = bias * c[:, None]

        v = jnp.asarray(_LUMA, jnp.float32)
        lumaflip = jnp.eye(3) - 2.0 * jnp.outer(v, v)
        flip_m = jnp.where(gate(k_l)[:, None, None], lumaflip, jnp.eye(3))
        mat = flip_m @ mat
        bias = jnp.einsum("bij,bj->bi", flip_m, bias)

        theta = jnp.where(gate(k_h),
                          jax.random.uniform(k_hv, (batch,),
                                             minval=-jnp.pi,
                                             maxval=jnp.pi), 0.0)
        rot = _rotation_about_luma(theta)
        mat = rot @ mat
        bias = jnp.einsum("bij,bj->bi", rot, bias)

        s = jnp.where(gate(k_s),
                      jnp.exp(jax.random.normal(k_sv, (batch,))
                              * SATURATION_STD), 1.0)
        vv = jnp.outer(v, v)
        sat = vv[None] + (jnp.eye(3) - vv)[None] * s[:, None, None]
        mat = sat @ mat
        bias = jnp.einsum("bij,bj->bi", sat, bias)

    # Keys for the later categories derive from fold_ins so enabling
    # any of "gfnu" leaves the blit/color streams (and every existing
    # test oracle) unchanged.
    geom = _geom_inverse(jax.random.fold_in(key, 0x9E0), batch, res, p) \
        if "g" in categories else None

    filt = filt_active = None
    if "f" in categories:
        filt, filt_active = _filter_params(
            jax.random.fold_in(key, 0x9E1), batch, p)

    noise = None
    if "n" in categories:
        k_g, k_s, k_v = jax.random.split(jax.random.fold_in(key, 0x9E2), 3)
        sigma = jnp.where(
            gate(k_g),
            jnp.abs(jax.random.normal(k_s, (batch,))) * NOISE_STD, 0.0)
        noise = (jax.random.normal(k_v, (batch, res, res, channels))
                 * sigma[:, None, None, None])

    cutout = None
    if "u" in categories:
        k_g, k_c = jax.random.split(jax.random.fold_in(key, 0x9E3))
        size = jnp.where(gate(k_g), jnp.float32(CUTOUT_SIZE), 0.0)
        center = jax.random.uniform(k_c, (batch, 2))
        cutout = jnp.concatenate([center, size[:, None]], axis=-1)

    return AugParams(flip=flip, rot_k=rot_k, trans=trans,
                     color_mat=mat, color_bias=bias, geom=geom,
                     filt=filt, filt_active=filt_active, noise=noise,
                     cutout=cutout)


def _reflect(idx: jax.Array, res: int) -> jax.Array:
    """Reflect out-of-range indices into [0, res) (period 2*res)."""
    t = jnp.mod(idx, 2 * res)
    return jnp.where(t >= res, 2 * res - 1 - t, t)


def _apply_blit(x: jax.Array, params: AugParams, res: int) -> jax.Array:
    """Blit transforms as whole-tensor ops — NO elementwise 2-D gather.

    An image-space gather with (B, H, W) index arrays is the slowest
    thing you can ask a TPU to do (measured: it cost 43% of the 256²
    train step). The same math decomposes into lane-friendly ops:

    * x-flip: one reverse + per-sample select;
    * rot90:  the three rotated tensors (transpose+reverse) + selects;
    * integer translate: two AXIS-SEPARATED 1-D ``take_along_axis``
      gathers (reflect-padded indices vary along one axis each).

    Forward order matches the coordinate formulation this replaces:
    flip -> rot90 -> translate (bit-identical results, tested).
    """
    f = params.flip[:, None, None, None]
    out = jnp.where(f, x[:, :, ::-1, :], x)
    k = params.rot_k[:, None, None, None]
    # our k counts quarter-turns with out[y,x] = in[res-1-x, y] at k=1,
    # which is numpy's rot90(..., k=-1) in the (H, W) plane
    out = jnp.where(k == 1, jnp.rot90(out, k=-1, axes=(1, 2)),
                    jnp.where(k == 2, jnp.rot90(out, k=2, axes=(1, 2)),
                              jnp.where(k == 3,
                                        jnp.rot90(out, k=1, axes=(1, 2)),
                                        out)))
    o = jnp.arange(res)
    iy = _reflect(o[None, :] - params.trans[:, 0, None], res)
    ix = _reflect(o[None, :] - params.trans[:, 1, None], res)
    out = jnp.take_along_axis(out, iy[:, :, None, None], axis=1)
    out = jnp.take_along_axis(out, ix[:, None, :, None], axis=2)
    return out


def _resample_pass(x: jax.Array, f: jax.Array, res: int,
                   axis: int) -> jax.Array:
    """1-D linear resample of NHWC ``x`` along H (axis=1) or W (axis=2).

    ``f`` is the (B, H, W) float source coordinate along ``axis``. The
    2-tap interpolation is expressed as a ONE-HOT EINSUM instead of a
    gather: the tent weights over an iota ride the MXU as a matmul, and
    its transpose (the VJP) is just the mirrored einsum. Measured on the
    v5-lite at (32, 256, 256, 3): 9.0 ms fwd / 14.2 ms fwd+bwd for two
    passes in the r4 channel-transposed form (scripts/bench_warp.py;
    9.5 / 17.8 for the straight einsum), vs 59.6 / 409 ms for the 4-tap
    gather it replaces (the gather's scatter-add backward is the
    catastrophic part).

    Exactness: integer coordinates give weights {0, 1}, so the einsum
    reduces to an exact copy — identity affines stay bit-identical.
    """
    i0 = jnp.floor(f).astype(jnp.int32)
    w = (f - jnp.floor(f)).astype(jnp.float32)
    i0r, i1r = _reflect(i0, res), _reflect(i0 + 1, res)
    s = jnp.arange(res, dtype=jnp.int32)

    def interp(w_, i0_, i1_, src):
        weights = ((1.0 - w_)[..., None] * (s == i0_[..., None])
                   + w_[..., None] * (s == i1_[..., None])).astype(src.dtype)
        # Channel-as-M transposed contraction (measured r4, scripts/
        # bench_warp.py): the straight einsum's batched matmul has
        # N = C = 3 output lanes — 3/128 of the MXU lane width; putting
        # C on the M side makes the res-wide output dim the lane dim and
        # pads only M (3 -> 8 sublanes). Same per-tap arithmetic; -20%
        # fwd+bwd at (32, 256^2, 3) vs the straight form.
        if axis == 2:
            xt = jnp.moveaxis(src, -1, -2)            # (b, y, c, s)
            out = jnp.einsum("bycs,byxs->bycx", xt, weights)
            return jnp.moveaxis(out, -2, -1)
        xt = jnp.transpose(src, (0, 2, 3, 1))         # (b, x, c, s)
        out = jnp.einsum("bxcs,byxs->bxcy", xt, weights)
        return jnp.transpose(out, (0, 3, 1, 2))

    # The one-hot tensor is (B, H, W, res); above ~512^2 its residency
    # (if XLA materializes the fusion) threatens HBM, so scan over
    # output-row blocks. For the x-pass each output row reads only its
    # own input row, so the source blocks along with the weights; for
    # the y-pass every output row may read any input row, so the source
    # stays whole and only weights/outputs are blocked.
    b = x.shape[0]
    if b * res ** 3 * x.dtype.itemsize <= ONEHOT_BYTES_LIMIT:
        return interp(w, i0r, i1r, x)
    blk = max(ONEHOT_BYTES_LIMIT // (b * res * res * x.dtype.itemsize), 1)
    blk = next(bk for bk in range(blk, 0, -1) if res % bk == 0)
    nb = res // blk

    resh = lambda t: t.reshape(b, nb, blk, res).swapaxes(0, 1)
    if axis == 2:
        xs = (resh(w), resh(i0r), resh(i1r),
              x.reshape(b, nb, blk, res, -1).swapaxes(0, 1))
        body = lambda _, ws: (None, interp(*ws))
    else:
        xs = (resh(w), resh(i0r), resh(i1r))
        body = lambda _, ws: (None, interp(*ws, x))  # x closed over, whole
    _, out = jax.lax.scan(body, None, xs)
    # out: (nb, B, blk, res, C) -> (B, res, res, C)
    return out.swapaxes(0, 1).reshape(b, res, res, x.shape[-1])


def _apply_geom(x: jax.Array, geom: jax.Array, res: int) -> jax.Array:
    """Per-sample affine warp as TWO axis-separated resampling passes.

    A direct bilinear warp needs a 2-D gather (and a scatter-add in the
    VJP) — the slowest ops a TPU has. Instead the inverse affine
    ``F(o) = G o + t`` is factored (Catmull–Smith two-pass resampling)
    into an exact per-sample quarter-turn (whole-tensor rot90 + select,
    chosen so the residual is well-conditioned even at ±90° rotations)
    followed by an x-shear pass and a y-shear pass, each a 2-tap 1-D
    resample executed as a one-hot einsum on the MXU (`_resample_pass`).

    With P0 = quarter turn, P1 = x-pass (a, b, g), P2 = y-pass (h, i, j)
    applied in that order, the composed inverse map is
    ``M0(M1(M2(o)))`` with M1: x' = a·x + b·y + g and M2: y' = h·y +
    i·x + j, giving ``G' = Q⁻¹G = [[h, i], [bh, a+bi]]`` — solved in
    closed form below. Each 1-D linear interpolation is exact on images
    affine in the coordinates, so the two-pass result matches direct
    bilinear exactly on linear ramps (tested) and at all integer
    landings; on general images it is a different (separable) linear
    filter — the same family the official ADA's wavelet resampling
    deviation note already covers.
    """
    g00, g01, ty = geom[:, 0, 0], geom[:, 0, 1], geom[:, 0, 2]
    g10, g11, tx = geom[:, 1, 0], geom[:, 1, 1], geom[:, 1, 2]
    # Conditioning: the pair solve divides by h = G'00; pick the
    # quarter turn (k=1 blit rotation, inverse linear map Q =
    # [[0,-1],[1,0]] in centered coords) whenever it enlarges |h|.
    # det G > 0 for every drawn affine, so |h| bounded away from 0
    # keeps the x-pass scale a = det/h bounded too.
    use_rot = jnp.abs(g10) > jnp.abs(g00)
    x0 = jnp.where(use_rot[:, None, None, None],
                   jnp.rot90(x, k=-1, axes=(1, 2)), x)
    # residual [G'|t'] = Q^-1 [G|t] (Q^-1 = [[0,1],[-1,0]]) when rotated
    h = jnp.where(use_rot, g10, g00)
    i = jnp.where(use_rot, g11, g01)
    j = jnp.where(use_rot, tx, ty)
    bb = jnp.where(use_rot, -g00, g10) / h
    a = jnp.where(use_rot, -g01, g11) - bb * i
    gg = jnp.where(use_rot, -ty, tx) - bb * j

    o = jnp.arange(res, dtype=jnp.float32)
    c0 = jnp.float32((res - 1) / 2.0)
    vy = (o - c0)[None, :, None]
    vx = (o - c0)[None, None, :]
    fx = a[:, None, None] * vx + bb[:, None, None] * vy \
        + gg[:, None, None] + c0
    out = _resample_pass(x0, fx, res, axis=2)
    fy = h[:, None, None] * vy + i[:, None, None] * vx \
        + j[:, None, None] + c0
    return _resample_pass(out, fy, res, axis=1)


def _sep_filter_pass(x: jax.Array, w: jax.Array, axis: int) -> jax.Array:
    """Per-sample 1-D FIR along H (axis=1) or W (axis=2) of NHWC ``x``.

    Per-sample kernels would naively need B separate convs; folding the
    batch into the channel axis turns it into ONE depthwise grouped conv
    (feature_group_count = B*C) with reflect padding — no gather, one
    MXU-adjacent op, and the VJP is the mirrored conv. The bank rows are
    symmetric palindromes so correlation == convolution.
    """
    b, h, wid, c = x.shape
    taps = w.shape[1]
    pad = taps // 2
    padcfg = [(0, 0)] * 4
    padcfg[axis] = (pad, pad)
    xp = jnp.pad(x, padcfg, mode="reflect")
    xp = jnp.transpose(xp, (1, 2, 0, 3)).reshape(
        1, xp.shape[1], xp.shape[2], b * c)
    k = jnp.broadcast_to(w.T[:, None, :, None],
                         (taps, 1, b, c)).reshape(taps, 1, 1, b * c)
    if axis == 2:
        k = jnp.transpose(k, (1, 0, 2, 3))
    out = jax.lax.conv_general_dilated(
        xp, k.astype(x.dtype), window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=b * c)
    return jnp.transpose(out.reshape(h, wid, b, c), (2, 0, 1, 3))


def _apply_filter(x: jax.Array, filt: jax.Array,
                  active: jax.Array) -> jax.Array:
    y = _sep_filter_pass(x, filt, axis=1)
    y = _sep_filter_pass(y, filt, axis=2)
    # Unit gains make the kernel a delta only up to float rounding; the
    # select keeps non-fired samples bit-identical (p=0 exact identity).
    return jnp.where(active[:, None, None, None], y, x)


def _cutout_mask(cut: jax.Array, res: int, dtype) -> jax.Array:
    """(B, res, res, 1) keep-mask: zero inside the per-sample square.

    Official semantics: pixel centers at (i + 0.5)/res; a pixel is cut
    when BOTH axis distances to the center are < size/2 (rank-1 mask,
    no gather).
    """
    cy, cx, size = cut[:, 0], cut[:, 1], cut[:, 2]
    coord = (jnp.arange(res, dtype=jnp.float32) + 0.5) / res
    keep_y = jnp.abs(coord[None, :] - cy[:, None]) >= size[:, None] / 2
    keep_x = jnp.abs(coord[None, :] - cx[:, None]) >= size[:, None] / 2
    keep = jnp.logical_or(keep_y[:, :, None], keep_x[:, None, :])
    return keep[..., None].astype(dtype)


def apply_augment(x: jax.Array, params: AugParams) -> jax.Array:
    """Apply sampled transforms to NHWC images in [-1, 1].

    Whole-tensor blit ops (+ a two-pass shear warp on the MXU when the
    geometric category is active) + one einsum (color); differentiable
    wrt ``x``.
    """
    res = x.shape[1]
    assert x.shape[1] == x.shape[2], "square images only"

    out = _apply_blit(x, params, res)
    if params.geom is not None:
        # Forward pipeline is blit -> geom -> color: warp the blitted
        # image by the inverse affine on centered coords. Identity
        # affines resolve to exact integer resamples, so samples whose
        # geometric gates don't fire stay bit-identical.
        out = _apply_geom(out, params.geom, res)

    # --- color: one per-sample 3x3 + bias.
    mat = params.color_mat.astype(out.dtype)
    bias = params.color_bias.astype(out.dtype)
    out = jnp.einsum("bhwc,bdc->bhwd", out, mat) + bias[:, None, None, :]

    if params.filt is not None:
        out = _apply_filter(out, params.filt, params.filt_active)
    if params.noise is not None:
        # sigma = 0 adds an exact zero field, so p=0 stays bit-exact.
        out = out + params.noise.astype(out.dtype)
    if params.cutout is not None:
        # size = 0 keeps every pixel (multiply by exact 1.0).
        out = out * _cutout_mask(params.cutout, res, out.dtype)
    return out


def augment(x: jax.Array, p: jax.Array, key: jax.Array,
            categories: str = "bc") -> jax.Array:
    """ADA pipeline: per-sample transforms at strength ``p`` (traced)."""
    params = sample_params(key, x.shape[0], x.shape[1], p, categories,
                           channels=x.shape[-1])
    return apply_augment(x, params)
