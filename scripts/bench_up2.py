"""Microbenchmark: fused up2_conv2d forms vs the two-op path, per shape.

Times forward+backward of just conv(upsample_blur(x)) at the judged
StyleGAN-256 G-block shapes, isolating the fusion candidates from the rest
of the train step. One JSON line per (shape, mode).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_compilation_cache_dir", "/tmp/ganlab_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from ganlab_tpu.ops.upfirdn import (CONV_DIMS, up2_conv2d,
                                        upsample_blur_2x)

    # (in_res, in_ch, out_ch) of every blurred G up-conv in StyleGAN-256.
    shapes = [(4, 512, 512), (8, 512, 512), (16, 512, 512),
              (32, 512, 256), (64, 256, 128), (128, 128, 64)]
    batch = 16
    dt = jnp.bfloat16

    def two_op(x, w):
        return lax.conv_general_dilated(upsample_blur_2x(x), w, (1, 1),
                                        "SAME", dimension_numbers=CONV_DIMS)

    modes = {
        "two_op": two_op,
        "dilated": lambda x, w: up2_conv2d(x, w, polyphase=False),
        "poly": lambda x, w: up2_conv2d(x, w, polyphase=True),
    }

    for res, ci, co in shapes:
        x0 = jnp.asarray(np.random.RandomState(0)
                         .randn(batch, res, res, ci), dt)
        w0 = jnp.asarray(np.random.RandomState(1).randn(3, 3, ci, co) * .05,
                         dt)
        for name, fn in modes.items():
            @jax.jit
            def fb(x, w, fn=fn):
                y, vjp = jax.vjp(lambda a, b: fn(a, b), x, w)
                gx, gw = vjp(y)
                return jnp.sum(gx.astype(jnp.float32)) + \
                    jnp.sum(gw.astype(jnp.float32))

            r = fb(x0, w0)
            float(np.asarray(r))
            n = 50
            t0 = time.perf_counter()
            acc = x0
            for _ in range(n):
                # thread a dependency so the chain must execute
                acc = acc + 0.0 * fb(acc, w0).astype(dt)
            float(np.asarray(acc[0, 0, 0, 0]))
            dt_ms = (time.perf_counter() - t0) / n * 1000
            print(json.dumps({"res": res, "ci": ci, "co": co, "mode": name,
                              "ms": round(dt_ms, 3)}), flush=True)


if __name__ == "__main__":
    main()
