"""PixelNorm as a single-pass Pallas kernel with analytic custom VJP.

Replaces the reference's torch composite (SURVEY.md 2.1 row 2): one VMEM
pass computing x * rsqrt(mean(x^2, C) + eps) over row-tiles of the flattened
(N*H*W, C) view. The backward kernel recomputes the cheap rsqrt instead of
saving it (rematerialization: HBM traffic beats FLOPs on TPU).

    y = x * r,            r = rsqrt(mean(x^2) + eps)
    dx = r * (g - x * mean(g * x) * r^2)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fwd_kernel(eps: float, x_ref, o_ref):
    x = x_ref[:].astype(jnp.float32)
    ms = jnp.mean(x * x, axis=-1, keepdims=True)
    r = jax.lax.rsqrt(ms + eps)
    o_ref[:] = (x * r).astype(o_ref.dtype)


def _bwd_kernel(eps: float, x_ref, g_ref, dx_ref):
    x = x_ref[:].astype(jnp.float32)
    g = g_ref[:].astype(jnp.float32)
    ms = jnp.mean(x * x, axis=-1, keepdims=True)
    r = jax.lax.rsqrt(ms + eps)
    prod = jnp.mean(g * x, axis=-1, keepdims=True)
    dx = r * (g - x * prod * (r * r))
    dx_ref[:] = dx.astype(dx_ref.dtype)


def _rows_call(kernel, eps, out_dtype, *arrays, interpret):
    """Run a row-tiled kernel over the (R, C) flattening of the inputs."""
    shape = arrays[0].shape
    c = shape[-1]
    rows = 1
    for d in shape[:-1]:
        rows *= d
    flat = [a.reshape(rows, c) for a in arrays]
    tile = min(rows, max(8, 4096 // max(c // 128, 1)))
    grid = pl.cdiv(rows, tile)
    out = pl.pallas_call(
        functools.partial(kernel, eps),
        out_shape=jax.ShapeDtypeStruct((rows, c), out_dtype),
        grid=(grid,),
        in_specs=[pl.BlockSpec((tile, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)
                  for _ in flat],
        out_specs=pl.BlockSpec((tile, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*flat)
    return out.reshape(shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def pixel_norm_pallas(x, eps: float = 1e-8, interpret: bool | None = None):
    if interpret is None:
        from ganlab_tpu.ops.pallas import interpret_mode

        interpret = interpret_mode()
    return _rows_call(_fwd_kernel, eps, x.dtype, x, interpret=interpret)


def _pn_fwd(x, eps, interpret):
    return pixel_norm_pallas(x, eps, interpret), x


def _pn_bwd(eps, interpret, x, g):
    # Plain-XLA backward (same math as _bwd_kernel): keeps the op
    # differentiable to arbitrary order for the gradient-penalty
    # grad-of-grad, and XLA fuses this elementwise chain into one pass
    # anyway. The Pallas win is the forward (sampling/inference) pass.
    xf = x.astype(jnp.float32)
    gf = g.astype(jnp.float32)
    ms = jnp.mean(xf * xf, axis=-1, keepdims=True)
    r = jax.lax.rsqrt(ms + eps)
    prod = jnp.mean(gf * xf, axis=-1, keepdims=True)
    dx = r * (gf - xf * prod * (r * r))
    return (dx.astype(x.dtype),)


pixel_norm_pallas.defvjp(_pn_fwd, _pn_bwd)
