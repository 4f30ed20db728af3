"""Minibatch-stddev as one Pallas kernel (SURVEY.md 2.1 row 3).

The op runs once per D forward on the final 4x4 block, so the whole input
fits VMEM; a single program computes the cross-batch statistic and writes
the concatenated output in one pass (whole-batch ProGAN formulation; the
grouped variant falls back to the XLA op).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(eps: float, c: int, x_ref, o_ref):
    x = x_ref[:].astype(jnp.float32)               # (N, H, W, C)
    mean = jnp.mean(x, axis=0, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=0)   # (H, W, C)
    stat = jnp.mean(jnp.sqrt(var + eps))           # scalar
    o_ref[:, :, :, 0:c] = x.astype(o_ref.dtype)
    o_ref[:, :, :, c:] = jnp.full(
        (x.shape[0], x.shape[1], x.shape[2], 1), stat, o_ref.dtype)


def _impl(x, eps, interpret):
    if interpret is None:
        from ganlab_tpu.ops.pallas import interpret_mode

        interpret = interpret_mode()
    n, h, w, c = x.shape
    return pl.pallas_call(
        functools.partial(_kernel, eps, c),
        out_shape=jax.ShapeDtypeStruct((n, h, w, c + 1), x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def minibatch_stddev_pallas(x, eps: float = 1e-8,
                            interpret: bool | None = None):
    """(N, H, W, C) -> (N, H, W, C+1); whole-per-device-batch statistic.

    Differentiable: the backward combines the pass-through gradient with the
    analytic gradient of the batch statistic
        s = mean_{h,w,c} sqrt(var_n(x) + eps)
        ds/dx[n,h,w,c] = (x - mean_n x) / (N * H * W * C * std[h,w,c]).
    The bwd is tiny elementwise math over the 4x4 final block, left to XLA.
    """
    return _impl(x, eps, interpret)


def _mb_fwd(x, eps, interpret):
    # Wrapped call (not _impl): keeps nested AD inside the custom_vjp.
    return minibatch_stddev_pallas(x, eps, interpret), x


def _mb_bwd(eps, interpret, x, g):
    n, h, w, c = x.shape
    xf = x.astype(jnp.float32)
    gx = g[..., :c]
    gs = jnp.sum(g[..., c].astype(jnp.float32))       # grad wrt the stat
    mean = jnp.mean(xf, axis=0, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=0, keepdims=True)
    std = jnp.sqrt(var + eps)
    scale = gs / (h * w * c)
    dx = gx.astype(jnp.float32) + scale * (xf - mean) / (n * std)
    return (dx.astype(x.dtype),)


minibatch_stddev_pallas.defvjp(_mb_fwd, _mb_bwd)
