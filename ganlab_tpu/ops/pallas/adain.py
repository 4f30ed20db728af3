"""Fused AdaIN: instance-norm + style affine in one VMEM pass per image.

SURVEY.md 2.1 row 4: "fuse instance-norm + style affine". The XLA composite
makes two passes over x (statistics, then normalize+modulate); this kernel
computes both in one VMEM residency per (image, channel-tile). Falls back to
the XLA op when a per-image channel-tile cannot fit VMEM (the dispatch
wrapper in ops.normalization handles that).

Backward is plain-XLA analytic math (arbitrary-order differentiable; AdaIN
sits in G, which the gradient penalties never double-differentiate, but
keeping the bwd XLA costs nothing and keeps AD unrestricted):

    xh = (x - mu) * r,  r = rsqrt(var + eps),  y = s * xh + b
    dxh = g * s
    dx  = r * (dxh - mean_hw(dxh) - xh * mean_hw(dxh * xh))
    ds  = sum_hw(g * xh),   db = sum_hw(g)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 10 * 1024 * 1024


def fits_vmem(h: int, w: int, c: int) -> bool:
    # x tile f32 + output + slack.
    return h * w * c * 4 * 3 <= _VMEM_BUDGET


def _kernel(eps: float, x_ref, s_ref, b_ref, o_ref):
    x = x_ref[0].astype(jnp.float32)              # (H, W, C)
    mean = jnp.mean(x, axis=(0, 1), keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=(0, 1), keepdims=True)
    r = jax.lax.rsqrt(var + eps)
    s = s_ref[0, 0].astype(jnp.float32)           # (C,)
    b = b_ref[0, 0].astype(jnp.float32)
    y = (x - mean) * r * s[None, None, :] + b[None, None, :]
    o_ref[0] = y.astype(o_ref.dtype)


def _impl(x, style_scale, style_bias, eps, interpret):
    if interpret is None:
        from ganlab_tpu.ops.pallas import interpret_mode

        interpret = interpret_mode()
    n, h, w, c = x.shape
    # Mosaic requires sublane-aligned (multiple-of-8) block rows; a (1, C)
    # style block has sublane 1, so broadcast styles to (N, 8, C) — a few
    # KB — and read row 0 in-kernel.
    ss = jnp.broadcast_to(style_scale[:, None, :], (n, 8, c))
    bb = jnp.broadcast_to(style_bias[:, None, :], (n, 8, c))
    return pl.pallas_call(
        functools.partial(_kernel, eps),
        out_shape=jax.ShapeDtypeStruct((n, h, w, c), x.dtype),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, ss, bb)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def adain_pallas(x, style_scale, style_bias, eps: float = 1e-8,
                 interpret: bool | None = None):
    """x: (N,H,W,C); style_scale/style_bias: (N,C) -> (N,H,W,C)."""
    return _impl(x, style_scale, style_bias, eps, interpret)


def _fwd(x, s, b, eps, interpret):
    return adain_pallas(x, s, b, eps, interpret), (x, s)


def _bwd(eps, interpret, res, g):
    x, s = res
    xf = x.astype(jnp.float32)
    gf = g.astype(jnp.float32)
    sf = s.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 2), keepdims=True)
    r = jax.lax.rsqrt(var + eps)
    xh = (xf - mean) * r
    dxh = gf * sf[:, None, None, :]
    dx = r * (dxh
              - jnp.mean(dxh, axis=(1, 2), keepdims=True)
              - xh * jnp.mean(dxh * xh, axis=(1, 2), keepdims=True))
    ds = jnp.sum(gf * xh, axis=(1, 2))
    db = jnp.sum(gf, axis=(1, 2))
    return (dx.astype(x.dtype), ds.astype(s.dtype), db.astype(s.dtype))


adain_pallas.defvjp(_fwd, _bwd)
