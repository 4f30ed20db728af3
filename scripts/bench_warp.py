"""Microbench: per-sample affine warp variants on TPU.

Variants (B=32, R=256, C=3, bf16):
  gather4       -- current 4-tap flattened take_along_axis (2-D gather)
  twopass_taa   -- x-shear + y-shear passes, 2-tap take_along_axis each
  twopass_onehot-- x-shear + y-shear passes, one-hot einsum (MXU)

Times fwd and fwd+bwd (grad wrt x). Chains outputs through iterations and
fetches a scalar at the end (the only reliable barrier on the relay).
"""
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/ganlab_jax_cache")

B, R, C = 32, 256, 3
DTYPE = jnp.bfloat16


def _reflect(idx, res):
    t = jnp.mod(idx, 2 * res)
    return jnp.where(t >= res, 2 * res - 1 - t, t)


def make_coords(key):
    # representative residual affine: rotation +-45deg, scale ~1
    k1, k2, k3 = jax.random.split(key, 3)
    th = jax.random.uniform(k1, (B,), minval=-0.7, maxval=0.7)
    s = jnp.exp2(jax.random.normal(k2, (B,)) * 0.2)
    t = jax.random.normal(k3, (B, 2)) * 8.0
    c, sn = jnp.cos(th) / s, jnp.sin(th) / s
    return c, sn, t


def fy_fx(x_unused, c, sn, t):
    o = jnp.arange(R, dtype=jnp.float32)
    c0 = (R - 1) / 2.0
    vy = (o - c0)[None, :, None]
    vx = (o - c0)[None, None, :]
    fy = c[:, None, None] * vy + sn[:, None, None] * vx \
        + t[:, 0, None, None] + c0
    fx = -sn[:, None, None] * vy + c[:, None, None] * vx \
        + t[:, 1, None, None] + c0
    return fy, fx


def gather4(x, c, sn, t):
    fy, fx = fy_fx(x, c, sn, t)
    y0f, x0f = jnp.floor(fy), jnp.floor(fx)
    wy = (fy - y0f).astype(x.dtype)[..., None]
    wx = (fx - x0f).astype(x.dtype)[..., None]
    y0 = y0f.astype(jnp.int32)
    x0 = x0f.astype(jnp.int32)
    y0r, y1r = _reflect(y0, R), _reflect(y0 + 1, R)
    x0r, x1r = _reflect(x0, R), _reflect(x0 + 1, R)
    src = x.reshape(B, R * R, C)

    def tap(yi, xi):
        idx = (yi * R + xi).reshape(B, R * R)[..., None]
        return jnp.take_along_axis(src, idx, axis=1).reshape(x.shape)

    return (tap(y0r, x0r) * (1 - wy) * (1 - wx)
            + tap(y0r, x1r) * (1 - wy) * wx
            + tap(y1r, x0r) * wy * (1 - wx)
            + tap(y1r, x1r) * wy * wx)


def _pass_taa(x, f, axis):
    # f: (B, R, R) float source coord along `axis`
    i0 = jnp.floor(f).astype(jnp.int32)
    w = (f - jnp.floor(f)).astype(x.dtype)[..., None]
    i0r, i1r = _reflect(i0, R), _reflect(i0 + 1, R)
    t0 = jnp.take_along_axis(x, i0r[..., None], axis=axis)
    t1 = jnp.take_along_axis(x, i1r[..., None], axis=axis)
    return t0 * (1 - w) + t1 * w


def _shear_coords(c, sn, t):
    # x-pass: fx[b,y,x] = a*x + bb*y + g ; y-pass: fy[b,y,x] = h*y + i*x + j
    o = jnp.arange(R, dtype=jnp.float32)
    c0 = (R - 1) / 2.0
    vy = (o - c0)[None, :, None]
    vx = (o - c0)[None, None, :]
    # contrived but representative shear fields
    fx = c[:, None, None] * vx + sn[:, None, None] * vy \
        + t[:, 1, None, None] + c0
    fy = c[:, None, None] * vy + sn[:, None, None] * vx \
        + t[:, 0, None, None] + c0
    return fy, fx


def twopass_taa(x, c, sn, t):
    fy, fx = _shear_coords(c, sn, t)
    out = _pass_taa(x, fx, axis=2)
    out = _pass_taa(out, fy, axis=1)
    return out


def _pass_onehot(x, f, axis):
    i0 = jnp.floor(f).astype(jnp.int32)
    w = (f - jnp.floor(f)).astype(jnp.float32)
    i0r, i1r = _reflect(i0, R), _reflect(i0 + 1, R)
    s = jnp.arange(R, dtype=jnp.int32)
    # W[..., s] = (1-w)*[s==i0r] + w*[s==i1r]
    W = ((1.0 - w)[..., None] * (s == i0r[..., None])
         + w[..., None] * (s == i1r[..., None])).astype(x.dtype)
    if axis == 2:
        return jnp.einsum("byxs,bysc->byxc", W, x)
    else:
        return jnp.einsum("bysx,bsxc->byxc",
                          jnp.moveaxis(W, -1, 2), x)


def twopass_onehot(x, c, sn, t):
    fy, fx = _shear_coords(c, sn, t)
    out = _pass_onehot(x, fx, axis=2)
    out = _pass_onehot(out, fy, axis=1)
    return out


def _pass_onehot_t(x, f, axis):
    """Transposed one-hot einsum (VERDICT r3 #6 attempt): the straight
    einsum's batched matmul is (R_out x R_in) @ (R_in x C) with N = C = 3
    output lanes — 3/128 of the MXU lane width. Contracting with the
    CHANNEL dim as M instead ((C x R_in) @ (R_in x R_out)) makes the
    256-wide spatial dim the lane dim and pads only M: 3 -> 8 sublanes.
    Same arithmetic values (f32-exact per tap), two cheap transposes."""
    i0 = jnp.floor(f).astype(jnp.int32)
    w = (f - jnp.floor(f)).astype(jnp.float32)
    i0r, i1r = _reflect(i0, R), _reflect(i0 + 1, R)
    s = jnp.arange(R, dtype=jnp.int32)
    W = ((1.0 - w)[..., None] * (s == i0r[..., None])
         + w[..., None] * (s == i1r[..., None])).astype(x.dtype)
    if axis == 2:
        xt = jnp.moveaxis(x, 3, 2)                # (b, y, c, s=x_in)
        out = jnp.einsum("bycs,byxs->bycx", xt, W)
        return jnp.moveaxis(out, 2, 3)
    xt = jnp.transpose(x, (0, 2, 3, 1))           # (b, x, c, s=y_in)
    out = jnp.einsum("bxcs,byxs->bxcy", xt, W)
    return jnp.transpose(out, (0, 3, 1, 2))


def twopass_onehot_t(x, c, sn, t):
    fy, fx = _shear_coords(c, sn, t)
    out = _pass_onehot_t(x, fx, axis=2)
    out = _pass_onehot_t(out, fy, axis=1)
    return out


VARIANTS = {"gather4": gather4, "twopass_taa": twopass_taa,
            "twopass_onehot": twopass_onehot,
            "twopass_onehot_t": twopass_onehot_t}


def main():
    names = sys.argv[1:] or list(VARIANTS)
    key = jax.random.PRNGKey(0)
    c, sn, t = make_coords(key)
    x0 = jax.random.normal(jax.random.PRNGKey(1), (B, R, R, C), DTYPE)
    results = {}
    for name in names:
        fn = VARIANTS[name]

        @jax.jit
        def fwd(x):
            return fn(x, c, sn, t)

        @jax.jit
        def fwdbwd(x):
            g = jax.grad(lambda xx: jnp.sum(fn(xx, c, sn, t)
                                            .astype(jnp.float32) ** 2))(x)
            return g

        for tag, f in (("fwd", fwd), ("fwdbwd", fwdbwd)):
            y = f(x0)
            np.asarray(jax.device_get(y[0, 0, 0, 0]))  # warm + barrier
            n = 30
            t0 = time.perf_counter()
            y = x0
            for _ in range(n):
                y = f(y)
            np.asarray(jax.device_get(y[0, 0, 0, 0]))
            dt = (time.perf_counter() - t0) / n * 1e3
            results[f"{name}.{tag}"] = round(dt, 3)
            print(json.dumps({f"{name}.{tag}_ms": round(dt, 3)}),
                  flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
