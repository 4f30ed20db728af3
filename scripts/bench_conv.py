"""Per-layer conv microbenchmark: MXU efficiency of the StyleGAN-256 stack.

Measures every distinct (resolution, cin, cout) 3x3 conv of the judged
config — forward, grad-input, grad-weight — in bf16 at the judged batch,
and reports achieved TFLOP/s vs the chip's bf16 peak. This is the roofline
evidence for VERDICT r1 task 2: which layers XLA already saturates and which
leave MXU idle (low-channel high-resolution layers pad lanes).

Usage: python scripts/bench_conv.py [BATCH]
"""

from __future__ import annotations

import json
import sys
import time

V5E_BF16_PEAK_TFLOPS = 197.0

# (res, cin, cout) of every 3x3 conv in the StyleGAN-256 G+D stacks
# (fmap_base 8192, fmap_max 512; G synthesis pairs + D pairs).
LAYERS = [
    (4, 512, 512), (8, 512, 512), (16, 512, 512), (32, 512, 512),
    (64, 512, 256), (64, 256, 256), (64, 256, 512),
    (128, 256, 128), (128, 128, 128), (128, 128, 256),
    (256, 128, 64), (256, 64, 64), (256, 64, 128),
]


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    jax.config.update("jax_compilation_cache_dir", "/tmp/ganlab_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    def conv(x, w):
        return lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def time_fn(fn, *args, iters=30):
        # Barrier = host fetch (block_until_ready unreliable on this relay);
        # chain through a scalar so the whole loop must execute.
        acc = fn(*args)
        float(np.asarray(jnp.sum(acc[..., :1, :1].astype(jnp.float32))))
        t0 = time.perf_counter()
        for _ in range(iters):
            acc = fn(*args)
        float(np.asarray(jnp.sum(acc[..., :1, :1].astype(jnp.float32))))
        return (time.perf_counter() - t0) / iters

    rows = []
    for res, cin, cout in LAYERS:
        kx = jax.random.PRNGKey(0)
        x = jax.random.normal(kx, (batch, res, res, cin), jnp.bfloat16)
        w = jax.random.normal(kx, (3, 3, cin, cout), jnp.bfloat16)
        g = jax.random.normal(kx, (batch, res, res, cout), jnp.bfloat16)

        fwd = jax.jit(conv)
        # grad wrt input and weight as separate compiled programs
        gx = jax.jit(lambda x_, w_, g_: jax.vjp(conv, x_, w_)[1](g_)[0])
        gw = jax.jit(lambda x_, w_, g_: jax.vjp(conv, x_, w_)[1](g_)[1])

        flops = 2 * 9 * cin * cout * res * res * batch
        out = {}
        for name, fn, args in (("fwd", fwd, (x, w)),
                               ("grad_x", gx, (x, w, g)),
                               ("grad_w", gw, (x, w, g))):
            dt = time_fn(fn, *args)
            out[name] = round(flops / dt / 1e12, 1)
        rows.append({"res": res, "cin": cin, "cout": cout,
                     "tflops": out,
                     "mxu_pct": {k: round(100 * v / V5E_BF16_PEAK_TFLOPS, 1)
                                 for k, v in out.items()}})
        print(json.dumps(rows[-1]), flush=True)

    total = sum(2 * 9 * ci * co * r * r * batch for r, ci, co in LAYERS)
    print(json.dumps({"summary": "per-layer conv roofline",
                      "batch": batch,
                      "stack_gflop_per_img": round(total / batch / 1e9, 1)}),
          flush=True)


if __name__ == "__main__":
    main()
